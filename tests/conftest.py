from __future__ import annotations

import duckdb
import pytest
import ray
from hypothesis import settings

# deterministic property tests: the driver treats any pytest failure as a
# build failure, so no per-run random seeds
settings.register_profile("ci", derandomize=True, deadline=None)
settings.load_profile("ci")

SF_DIRS = {
    "smoke": "/root/testdata/sf0.001",
    "correct": "/root/testdata/sf0.01",
}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata views registered (driver-style)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIRS['correct']}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIRS["correct"]
