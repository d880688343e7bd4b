from __future__ import annotations

import os

import duckdb
import pytest

from map_reduce_indexing_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"
TABLES = (
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
)


@pytest.fixture(scope="session")
def spark():
    # Core count env-tunable (r15). Measured on the slowest slice
    # (matview_hist + fuzz pipeline + parametric funnel): local[4]
    # 148 s, local[6] 147 s, local[8] 260 s — the suite is overhead-
    # bound, not parallelism-bound, so the default stays 4 and the
    # wall-time work targets per-test structure instead
    # (OPTIMIZATION_r15.md).
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    s = get_spark(
        app_name="mri-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        driver_memory="4g",
    )
    yield s
    s.stop()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver's oracle setup: each fixture table registered as
    a view over its parquet file."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, duck_con, sql: str, *, float_tol: float = 0.0):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL,
    approximating the driver's row-count + schema + value-hash check."""
    sp = spark_df.toPandas()
    du = duck_con.execute(sql).fetchdf()
    assert sorted(sp.columns) == sorted(du.columns), (sorted(sp.columns), sorted(du.columns))
    sp = sp[sorted(sp.columns)]
    du = du[sorted(du.columns)]
    assert len(sp) == len(du), f"row count {len(sp)} != {len(du)}"
    key = list(sp.columns)
    # Driver order: sort_values on the RAW frame first (list/ndarray cells
    # raise "unhashable type: 'list'" — exactly as the driver errs, per
    # CORRECTNESS_r01), THEN stringify for comparison.
    sp_sorted = sp.sort_values(key, ignore_index=True).astype(str)
    du_sorted = du.sort_values(key, ignore_index=True).astype(str)
    if float_tol == 0.0:
        mism = (sp_sorted != du_sorted)
        assert not mism.any().any(), sp_sorted[mism.any(axis=1)].head(5).to_string()
    else:  # caller handles per-column tolerance
        raise NotImplementedError


@pytest.fixture(params=["posix", "cas"])
def io_backend(request):
    """Run a test under BOTH commit-protocol backends: the POSIX
    default (flock + hardlink + rename) and the object-store-semantics
    CAS backend (lease + copy + journaled swap + conditional manifest
    put). The lakehouse suites (generations, matview, delete, upsert,
    pipeline, expectations) opt in with a module-level autouse shim —
    every store verb they drive must behave identically when hardlink
    sharing, flock exclusion, and atomic directory rename are all
    taken away."""
    from map_reduce_indexing_spark.sources import commitio as C

    backend = C.PosixStoreIO() if request.param == "posix" else C.CASStoreIO()
    with C.using_backend(backend):
        yield request.param
