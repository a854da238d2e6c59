"""Round-12 adjudication runs (r11 verdict items 2-3): same-JVM A/B
timings that separate plan cost from JVM co-residency / host noise.

Usage: python tools/adjudicate_r12.py [sf_dir ...]

For each scale dir given (default sf0.2 + sf0.5 replicas):

* ``near_dedup_keep_best`` vs ``near_dedup_corpus`` at the SAME 8/2
  LSH config vs the bare ``near_dup_components`` closure — all three
  in ONE JVM, interleaved min-of-3. If keep-best tracks the other two,
  the r11 sf0.5 tail (exp_hi 1.44) was a measurement window; if it
  alone inflates, the per-cluster argmax join is implicated.
* solo re-measure of ``ngram_jaccard_pairs`` (repointed plan) and
  ``cluster_size_histogram`` (r11 read 4.2x in-group vs 2.78 s solo).

Prints one JSON line per (scale, name) with min/samples/calib.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _calib() -> float:
    t0 = time.monotonic()
    acc = 0
    for i in range(20_000_000):
        acc += i * i
    assert acc >= 0
    return round(time.monotonic() - t0, 2)


def main() -> None:
    dirs = sys.argv[1:] or [
        os.path.join(REPO, "testdata_sf0.2"),
        os.path.join(REPO, "testdata_sf0.5"),
    ]
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from ppack_spark.operators.dedup import (
        near_dedup_corpus,
        near_dedup_keep_best,
        near_dup_components,
    )
    from ppack_spark.session import get_spark

    spark = get_spark("adjudicate_r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def docs(sf_dir):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    subjects = {
        "components_8_2": lambda d, s: near_dup_components(
            docs(d), num_hashes=8, band_size=2, k=3, verify_threshold=0.5
        ),
        "near_dedup_corpus_8_2": lambda d, s: near_dedup_corpus(
            docs(d), num_hashes=8, band_size=2, k=3, verify_threshold=0.5
        ).select("doc_id", "source"),
        "near_dedup_keep_best": lambda d, s: qs["near_dedup_keep_best"](s, d),
        "ngram_jaccard_pairs": lambda d, s: qs["ngram_jaccard_pairs"](s, d),
        "cluster_size_histogram": lambda d, s: qs["cluster_size_histogram"](s, d),
    }
    out: dict[str, dict[str, list[float]]] = {}
    calibs = [_calib()]
    for _ in range(3):
        for sf_dir in dirs:
            for name, fn in subjects.items():
                t0 = time.monotonic()
                fn(sf_dir, spark).write.format("noop").mode("overwrite").save()
                out.setdefault(sf_dir, {}).setdefault(name, []).append(
                    round(time.monotonic() - t0, 2)
                )
    calibs.append(_calib())
    spark.stop()
    for sf_dir, d in out.items():
        for name, v in d.items():
            print(json.dumps({
                "sf_dir": os.path.basename(sf_dir), "name": name,
                "min": min(v), "samples": v, "calib": calibs,
            }))


if __name__ == "__main__":
    main()
