"""Deterministic, engine-replayable mergeable sketches.

At 100 TB the questions "how many distinct tokens / urls / users",
"how often does this term occur", and "what is the p99 of this
metric" cannot be answered by exact re-aggregation every time a new
ingest batch lands: exact distinct re-shuffles the union of all
batches, exact frequency keeps the full vocabulary live, exact
quantiles need a global sort. The standard answer is a MERGEABLE
SKETCH per batch — kilobytes per shard regardless of data size,
combined with a tiny key-wise merge — and that is what this module
provides, in a deliberately DETERMINISTIC form:

* :func:`hll_registers` / :func:`merge_hll_registers` /
  :func:`hll_cardinality_estimate` — HyperLogLog over md5-derived
  hashes (Flajolet et al. 2007, with the small-range linear-counting
  correction). Standard error ≈ 1.04/√m (~3.3 % at the default
  p=10 → m=1024 registers).
* :func:`cms_sketch` / :func:`merge_cms_sketches` /
  :func:`cms_estimate` — Count-Min frequency sketch (Cormode &
  Muthukrishnan 2005): d independent md5-salted hash rows × w
  buckets; point estimates overcount by at most ~N·e/w with
  probability 1-e^-d, never undercount.
* :func:`histogram_sketch` / :func:`merge_histogram_sketches` /
  :func:`histogram_quantiles` — fixed-edge equi-width histograms
  (shards must agree on [lo, hi] — that agreement IS the merge
  contract) with linear-interpolated quantile estimates.

Unlike the Apache DataSketches binaries behind
``distinct_count_sketches`` (operators/pipeline.py — kept as the
adaptive, library-grade alternative), every step here is a
closed-form expression over md5, so a DuckDB oracle replays sketch
construction, merge, AND estimate bit-for-bit: the whole family is
hash-checked on the driver board instead of only tolerance-gated.

Scale shape: sketch construction is one map pass + one partial-
aggregated groupBy whose key space is the SKETCH (≤ m registers /
d×w cells / k bins), not the data; merges shuffle only sketch rows.
Nothing here collects to the driver.

Reference parity: the reference engine (nerskin/ppack) has no sketch
surface — this extends the data-pipeline families of SURVEY.md §2e
(E97 mergeable cardinality sketches; E145 bounded-memory heavy
hitters) with the oracle-checkable variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _h32(key: Column, salt: str) -> Column:
    """First 32 bits of md5(key ∥ ':salt') as a non-negative long —
    the module's one hash primitive. DuckDB replay:
    ``cast(('0x' || substr(md5(k || ':salt'), 1, 8)) as bigint)``."""
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


# --------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------

def _hll_rho(key: Column, salt: str) -> Column:
    """HLL rank: 1 + number of leading zero BITS in the 32-bit word at
    md5 hex chars 9-16 (33 when the word is all zeros). Computed from
    the hex string with a 4-bit CASE — no floating log2, whose
    round-to-nearest at exact powers of two would diverge between
    engines. DuckDB replay: the same regexp_replace / substr / CASE."""
    hex2 = F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 9, 8)
    rest = F.regexp_replace(hex2, "^0*", "")
    lz_hex = F.lit(8) - F.length(rest)
    nib = F.substring(rest, 1, 1)
    nib_zeros = (
        F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(rest == "", F.lit(33)).otherwise(
        lz_hex * 4 + nib_zeros + F.lit(1)
    ).cast("int")


def hll_registers(
    df: DataFrame,
    col: Column | str,
    p: int = 10,
    salt: str = "hll",
    by: str | None = None,
) -> DataFrame:
    """Per-shard HyperLogLog register table: ``(by?, register,
    rho)`` with ``register ∈ [0, 2^p)`` and ``rho`` the max rank seen
    in that register. This IS the sketch — ≤ 2^p rows per shard no
    matter how many values went in, mergeable by register-wise max
    (:func:`merge_hll_registers`). NULL values are skipped (a NULL is
    not a distinct member). One map pass + one partial-aggregated
    groupBy on (shard, register).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"hll_registers: p must be in [4, 16], got {p}")
    c = _col(col)
    m = 1 << p
    keys = [F.col(by)] if by else []
    return (
        df.filter(c.isNotNull())
        .select(
            *keys,
            (_h32(c, salt + "i") % m).alias("register"),
            _hll_rho(c, salt + "r").alias("rho"),
        )
        .groupBy(*keys, "register")
        .agg(F.max("rho").alias("rho"))
    )


def merge_hll_registers(*tables: DataFrame) -> DataFrame:
    """Union register tables (dropping any shard column) into one
    ``(register, rho)`` sketch by register-wise max — the lossless HLL
    merge: merging per-batch sketches yields the IDENTICAL register
    table (hence identical estimate) as sketching the concatenated
    data in one pass. Shuffles only register rows."""
    if not tables:
        raise ValueError("merge_hll_registers: need at least one table")
    u = tables[0].select("register", "rho")
    for t in tables[1:]:
        u = u.unionByName(t.select("register", "rho"))
    return u.groupBy("register").agg(F.max("rho").alias("rho"))


def hll_cardinality_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """One-row distinct-count estimate from an HLL register table:
    the raw harmonic-mean estimator α_m·m²/Σ2^-M_j with the
    small-range linear-counting correction (m·ln(m/V) when the raw
    estimate ≤ 2.5m and V>0 registers are empty). Empty registers
    contribute 2^0 = 1 to the denominator. Returns ``(estimate)``
    rounded to 4.

    Cross-engine determinism: every 2^-rho is a dyadic rational and
    the register sum stays far below 53 mantissa bits, so Σ is EXACT
    in any summation order; the remaining α/ln arithmetic is a fixed
    single-expression evaluation both engines round identically at 4
    decimals. An empty sketch estimates 0.0.
    """
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("__nreg"),
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)).alias(
            "__spow"
        ),
    )
    z = (F.lit(float(m)) - F.col("__nreg")) + F.col("__spow")
    raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - F.col("__nreg")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("estimate"))


# --------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------

def _cms_rows(term: Column, depth: int, width: int, salt: str) -> Column:
    """Array of (row, bucket) structs for one term — row j's bucket is
    an independent md5-salted 32-bit hash mod width."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (_h32(term, f"{salt}{j}") % width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    term_col: Column | str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    by: str | None = None,
) -> DataFrame:
    """Count-Min sketch of a term stream: ``(by?, row, bucket, cnt)``
    — ≤ depth×width cells per shard. NULL terms are skipped. One
    explode (×depth) + one partial-aggregated groupBy on the cell
    key; the term string itself never shuffles."""
    if depth < 1 or width < 1:
        raise ValueError(f"cms_sketch: need depth, width >= 1: {depth}, {width}")
    c = _col(term_col)
    keys = [F.col(by)] if by else []
    return (
        df.filter(c.isNotNull())
        .select(*keys, F.explode(_cms_rows(c, depth, width, salt)).alias("__rb"))
        .groupBy(*keys, F.col("__rb.row").alias("row"), F.col("__rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms_sketches(*sketches: DataFrame) -> DataFrame:
    """Union per-shard CMS cell tables (dropping any shard column)
    into one sketch by cell-wise SUM — the lossless CMS merge; like
    the HLL merge, the merged sketch is identical to sketching the
    concatenated stream."""
    if not sketches:
        raise ValueError("merge_cms_sketches: need at least one sketch")
    u = sketches[0].select("row", "bucket", "cnt")
    for s in sketches[1:]:
        u = u.unionByName(s.select("row", "bucket", "cnt"))
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query a CMS sketch: per query term, min over the d rows
    of that term's cell counts (unseen cells count 0). Guarantees
    estimate ≥ true count, estimate ≤ true + εN w.h.p. Returns
    ``(term, estimate)``. The terms frame is expected small (a watch
    list, the heavy-hitter output); the join broadcasts it."""
    q = (
        terms.filter(F.col(term_col).isNotNull())
        .select(F.col(term_col).alias("term"))
        .distinct()
        .select(
            "term",
            F.explode(_cms_rows(F.col("term"), depth, width, salt)).alias("__rb"),
        )
        .select("term", F.col("__rb.row").alias("row"), F.col("__rb.bucket").alias("bucket"))
    )
    joined = F.broadcast(q).join(sketch, ["row", "bucket"], "left").select(
        "term", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("term").agg(F.min("cnt").cast("long").alias("estimate"))


# --------------------------------------------------------------------
# Fixed-edge histogram quantiles
# --------------------------------------------------------------------

def value_range(df: DataFrame, value_col: Column | str) -> tuple[float, float] | None:
    """Global (min, max) of a numeric column — the one-pass edge
    agreement every shard's histogram must share. Returns None when
    the column has no non-NULL values. Bounded driver transfer: one
    2-value row."""
    c = _col(value_col).cast("double")
    row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
    if row["lo"] is None:
        return None
    return float(row["lo"]), float(row["hi"])


def _hist_bin(c: Column, lo: float, hi: float, k: int) -> Column:
    """Equi-width bin id over the FIXED range [lo, hi]: the PSI/KS
    bucket rule (plans/registry_data.py) — floor over the shared
    width, clamped to [0, k-1]; a degenerate range puts everything in
    bin 0."""
    if hi == lo:
        return F.lit(0)
    w = (hi - lo) / k
    b = F.floor((c.cast("double") - F.lit(lo)) / F.lit(w)).cast("int")
    return F.least(F.greatest(b, F.lit(0)), F.lit(k - 1))


def histogram_sketch(
    df: DataFrame,
    value_col: Column | str,
    lo: float,
    hi: float,
    k: int = 64,
    by: str | None = None,
) -> DataFrame:
    """Fixed-edge equi-width histogram: ``(by?, bin, cnt)`` — ≤ k
    rows per shard, mergeable by bin-wise sum as long as every shard
    used the SAME (lo, hi, k). NULL values are dropped (count them
    separately if the null rate matters — see profile_columns). One
    map pass + one partial-aggregated groupBy on (shard, bin)."""
    if k < 1:
        raise ValueError(f"histogram_sketch: need k >= 1, got {k}")
    c = _col(value_col)
    keys = [F.col(by)] if by else []
    return (
        df.filter(c.isNotNull())
        .select(*keys, _hist_bin(c, lo, hi, k).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histogram_sketches(*sketches: DataFrame) -> DataFrame:
    """Union per-shard histograms (dropping any shard column) by
    bin-wise sum — lossless given the shared-edge contract."""
    if not sketches:
        raise ValueError("merge_histogram_sketches: need at least one sketch")
    u = sketches[0].select("bin", "cnt")
    for s in sketches[1:]:
        u = u.unionByName(s.select("bin", "cnt"))
    return u.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    k: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Quantile estimates from a merged histogram: for each q, walk
    the cumulative counts to the bin where q·N lands and interpolate
    linearly inside it — the classic equi-width quantile read, error
    bounded by one bin width. Returns ``(quantile, estimate)``; an
    empty histogram returns no rows. The cumulative window runs over
    ≤ k rows (single partition by construction — the frame is
    sketch-sized, not data-sized)."""
    from pyspark.sql import Window

    if not qs:
        raise ValueError("histogram_quantiles: need at least one quantile")
    if any(not 0.0 < q < 1.0 for q in qs):
        raise ValueError(f"histogram_quantiles: quantiles must be in (0, 1): {qs}")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        F.col("cnt").cast("double").alias("cnt"),
        F.sum("cnt").over(w).cast("double").alias("cum"),
    ).crossJoin(
        F.broadcast(hist.agg(F.sum("cnt").cast("double").alias("total")))
    )
    qf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("quantile")
    binw = (hi - lo) / k if hi > lo else 0.0
    target = F.col("quantile") * F.col("total")
    inside = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    est = F.lit(float(lo)) + (F.col("bin") + inside) * F.lit(binw)
    return (
        cum.select("bin", "cnt", "cum", "total", qf)
        .filter((F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target))
        .select("quantile", F.round(est, round_digits).alias("estimate"))
    )
