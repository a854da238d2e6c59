from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
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


@pytest.fixture(scope="session")
def spark():
    from ppack_spark.session import get_spark

    spark = get_spark("ppack_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from ppack_spark.sources import register_views

    return register_views(spark, SF_DIR)


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the same fixtures registered as views."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def assert_same(
    spark_df,
    oracle_pdf: pd.DataFrame,
    round_floats: int | None = 9,
    check_dtype: bool = False,
    check_kind: bool = True,
) -> None:
    """Order-insensitive frame comparison: sort columns by name, sort
    rows by every column, optionally round doubles (FIXTURES.md
    determinism rules).

    check_kind asserts pandas dtype *kind* parity per column (int vs
    float vs object) — the driver's value hash is dtype-sensitive, so
    a DuckDB HUGEINT surfacing as float64 where Spark returns bigint
    is a driver-red even when every value is equal (round-5 verdict:
    profile_columns / sequence_packing / trainer_export_e2e)."""
    left = spark_df.toPandas()
    right = oracle_pdf.copy()
    assert sorted(left.columns) == sorted(right.columns), (
        f"columns differ: {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    cols = sorted(left.columns)
    left = left[cols]
    right = right[cols]
    if check_kind:
        for c in cols:
            lk, rk = left[c].dtype.kind, right[c].dtype.kind
            # int-with-nulls becomes float64 on BOTH conversion paths,
            # so a genuine kind split is an oracle-SQL dtype bug.
            assert lk == rk, (
                f"dtype kind mismatch on {c!r}: spark={left[c].dtype} "
                f"oracle={right[c].dtype} — cast the oracle SQL column"
            )
    if round_floats is not None:
        for c in cols:
            if left[c].dtype.kind == "f":
                left[c] = left[c].round(round_floats)
            if right[c].dtype.kind == "f":
                right[c] = right[c].round(round_floats)
    left = left.sort_values(cols, ignore_index=True)
    right = right.sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(left, right, check_dtype=check_dtype, check_exact=False, rtol=1e-9, atol=1e-12)
