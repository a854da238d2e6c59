"""SparkSession factory tuned for this engine.

Local-mode testing happens on ``local[$SPARK_GRAFT_CPUS]``; the conf
choices below are the ones that matter at cluster scale too: AQE for
runtime re-planning (skew joins from hot blocking keys are the known
risk in record linkage), Arrow for the pattern-counts collect that
feeds the driver-side EM, and a shuffle-partition count sized to the
local core count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE can only COALESCE down from the initial reducer count, never
    # split up — so the initial count must be sized for the LARGEST
    # shuffle in the workload, not the average one. At 32 reducers the
    # linkage chain's pair-distinct (hundreds of millions of rows at
    # mid scale) sort-spills every task: the round-7 scale proof
    # measured it 3x worse than its quadratic pair budget predicts,
    # and 256 initial reducers bought 2.2x back (133 s -> 60 s at
    # sf0.5) while AQE coalesces small shuffles to the same effective
    # partitioning as before (bench delta at sf0.1: nil). On a real
    # cluster this would be sized ~2-3x total cores; the principle —
    # initial reducers follow the biggest shuffle — is the same.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.crossJoin.enabled": "true",
    "spark.ui.enabled": "false",
    # long-lived sessions (the 90-query bench, the full test suite)
    # accumulate shuffle files and broadcast blocks that the
    # ContextCleaner only reclaims after a driver GC — which a large
    # mostly-idle heap may not trigger for the whole run (measured:
    # late bench queries inflate 3-4x in-session vs isolated). Force
    # a periodic GC and keep the status-store footprint small.
    "spark.cleaner.periodicGC.interval": "3min",
    "spark.sql.ui.retainedExecutions": "10",
    "spark.ui.retainedJobs": "100",
    "spark.ui.retainedStages": "100",
    # ANSI off: the engine compiles R/dplyr-flavoured comparator
    # expressions where silent-null (not error) semantics on bad
    # casts/arithmetic match the reference's DuckDB-via-dbplyr
    # behaviour more closely than Spark 4's ANSI default.
    "spark.sql.ansi.enabled": "false",
    # The events fixture stores TIMESTAMP(NANOS); Spark has no ns
    # timestamp type, so read as long and convert (sources/etl.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _default_driver_memory() -> str:
    """Local-mode heap default: min(48g, ~70% of MemAvailable), floor
    2g. The driver IS the executor in local mode, so the 1g Spark
    default GC-thrashes on O(pairs) work (26M-pair blocking at sf0.1
    stalls at 1g, runs in ~40s at 48g) — but a fixed 48g -Xmx fails
    JVM startup or invites OOM-kills on smaller hosts, hence the
    MemAvailable probe. ``SPARK_DRIVER_MEMORY`` overrides."""
    avail_kb = None
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_kb = int(line.split()[1])
                    break
    except OSError:
        pass
    if avail_kb is None:
        return "4g"  # no probe (non-Linux): a conservative default
    gb = max(min(int(avail_kb * 0.7 / 1024 / 1024), 48), 2)
    return f"{gb}g"


def get_spark(app_name: str = "ppack_spark", extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the session. ``SPARK_GRAFT_CPUS`` sets local parallelism."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(DEFAULT_CONF)
    conf["spark.driver.memory"] = os.environ.get(
        "SPARK_DRIVER_MEMORY", _default_driver_memory()
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
