"""Session-scoped Ray for all tests (init ONCE, per driver contract)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    # keep Ray worker heaps warm on this slow-page-fault VM (see bench.py)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_unit():
    from nmr_fair_dos_ray.fixtures import fixture_dir

    return fixture_dir("sf-unit")


@pytest.fixture(scope="session")
def sf_test():
    from nmr_fair_dos_ray.fixtures import fixture_dir

    return fixture_dir("sf-test")
