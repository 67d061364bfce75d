"""End-to-end Ray Data pipelines: index build, records, dedup, ANN, relational."""
