"""PartitionLog (parquet-backed phase-1 partition table) edge cases."""

import pyarrow as pa

from nmr_fair_dos_ray.state.manifest import PartitionLog


def _rows(ids, tag):
    return pa.table(
        {"work_item_id": pa.array(ids, pa.int64()),
         "run_path": pa.array([f"{tag}/{i}" for i in ids], pa.string())}
    )


def test_partition_log_sessions_and_keep_last(tmp_path):
    log = PartitionLog(str(tmp_path), "invert")
    assert log.read() is None
    s = log.open_session()
    s.write(_rows([0, 1, 2], "a"))
    s.write(_rows([3], "a"))
    s.close()
    t = log.read()
    assert t["work_item_id"].to_pylist() == [0, 1, 2, 3]
    # second session redoes item 2 → latest wins
    s2 = log.open_session()
    s2.write(_rows([2, 4], "b"))
    s2.close()
    t = log.read()
    got = dict(zip(t["work_item_id"].to_pylist(), t["run_path"].to_pylist()))
    assert got == {0: "a/0", 1: "a/1", 2: "b/2", 3: "a/3", 4: "b/4"}
    # column-pruned read keeps the key
    t2 = log.read(columns=["run_path"])
    assert set(t2.column_names) == {"work_item_id", "run_path"}


def test_partition_log_replace_and_clear(tmp_path):
    log = PartitionLog(str(tmp_path), "invert")
    s = log.open_session(); s.write(_rows([0, 1], "a")); s.close()
    keep = log.read().filter(pa.compute.equal(pa.array([0, 1]), 1))
    log.replace(log.read().slice(1, 1))
    assert log.read()["work_item_id"].to_pylist() == [1]
    log.clear()
    assert log.read() is None


def test_partition_log_empty_session_leaves_no_file(tmp_path):
    log = PartitionLog(str(tmp_path), "invert")
    s = log.open_session()
    s.close()  # no rows written → no file, no crash
    assert log.read() is None


def test_partition_log_numeric_session_order(tmp_path):
    """Latest-wins must hold past the zero-pad width: a session numbered
    10000 outranks 9999 even though it sorts lexicographically FIRST, and
    numbering resumes from max+1 (not file count) so crash gaps can't
    collide."""
    import os

    import pyarrow.parquet as pq

    log = PartitionLog(str(tmp_path), "invert")
    os.makedirs(log.dir, exist_ok=True)
    # fabricate legacy 4-digit sessions bracketing the old pad limit
    pq.write_table(_rows([7], "old"), f"{log.dir}/session_9999_1.parquet")
    pq.write_table(_rows([7], "new"), f"{log.dir}/session_10000_1.parquet")
    got = dict(zip(log.read()["work_item_id"].to_pylist(),
                   log.read()["run_path"].to_pylist()))
    assert got == {7: "new/7"}  # lexicographic order would say old/7
    # a fresh session must outrank BOTH (10001+), even though only 2 files exist
    s = log.open_session(); s.write(_rows([7], "newest")); s.close()
    assert log._session_no(s.final) == 10001
    got = dict(zip(log.read()["work_item_id"].to_pylist(),
                   log.read()["run_path"].to_pylist()))
    assert got == {7: "newest/7"}
