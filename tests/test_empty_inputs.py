"""Empty-input sweep: at 100 TB, empty inputs are routine (an empty
delta batch, a filter that matches nothing, a new partition), so every
registered query must either produce a well-formed (usually empty)
result or refuse with a clear ValueError — never die in a kernel with
an AxisError/Py4J traceback."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# operators whose contract legitimately requires data: index/model
# builds (k-means, PQ codebooks) and EM estimation. They must raise a
# loud, actionable ValueError — not a numpy/JVM internal error.
REQUIRES_DATA = {
    # NOTE: ann_pq_topk (cosine_topk_pq_fixed) is deliberately absent:
    # since round 8 it collects queries BEFORE training and returns an
    # explicitly-constructed empty frame when there are none — an
    # empty query set should not pay for (or crash on) codebook
    # training. Its corpus-empty/queries-nonempty path still raises.
    "ann_ivf_topk": "empty",
    "ann_ivf_append": "empty",
    "cluster_balanced_sample": "empty",
    "ann_ivfpq_topk": "empty",
    "ann_pq_topk_scan": "empty",
    "ann_ivfpq_topk_scan": "empty",
    "linkage_em_end_to_end": "no candidate pairs",
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"copy (select * from read_parquet('{src}/{t}.parquet') limit 0)"
            f" to '{dst}/{t}.parquet' (format parquet)"
        )
    return dst


def test_every_query_handles_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        expect = REQUIRES_DATA.get(name)
        try:
            n = fn(spark, empty_sf_dir).count()
        except ValueError as exc:
            if expect is None:
                failures.append(f"{name}: unexpected ValueError: {exc}")
            elif expect not in str(exc):
                failures.append(
                    f"{name}: ValueError lacks {expect!r}: {exc}"
                )
        except Exception as exc:
            failures.append(f"{name}: unclear failure {type(exc).__name__}: {exc!r:.120}")
        else:
            if expect is not None:
                failures.append(
                    f"{name}: expected a loud ValueError on empty input, got "
                    f"{n} rows"
                )
    assert not failures, "\n".join(failures)
