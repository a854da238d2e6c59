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
* :func:`kll_sketch` / :func:`merge_kll_sketches` /
  :func:`kll_quantiles` — a quantile sketch with NO range contract:
  shards need not agree on anything up front, so it covers the
  month-spanning ingest the fixed-edge histogram can't. KLL-style
  (Karnin, Lang & Liberty 2016) in its level/weight architecture,
  but the sequential compactor's coin flips are replaced by each
  item's md5-derived tier (the same determinization as the A-ES
  weighted sampler, operators/pipeline.py:weighted_hash_sample),
  which buys exact mergeability — merge == direct build,
  bit-for-bit, the property the sketch-of-sketches tests pin — and
  full SQL replayability, at the cost of the sampler's O(1/√k) rank
  error instead of KLL's O(1/k).

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

    Input contract: ``registers`` must be ONE sketch — register values
    unique, so ≤ m rows. Passing an UNMERGED per-shard table (e.g.
    ``hll_registers(..., by=...)`` output) would make the row count
    exceed m, drive the denominator (m - nreg) + Σ2^-rho negative,
    and silently return a wild/negative estimate — so the estimator
    raises instead (``raise_error`` fires inside the 1-row aggregate)
    when nreg > m: merge with :func:`merge_hll_registers` first.
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
        F.col("__nreg") > F.lit(m),
        F.raise_error(
            F.concat(
                F.lit("hll_cardinality_estimate: "),
                F.col("__nreg").cast("string"),
                F.lit(
                    f" register rows > m={m} — the input is not one merged"
                    " sketch (per-shard tables must go through"
                    " merge_hll_registers first)"
                ),
            )
        ).cast("double"),
    ).when(
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


# --------------------------------------------------------------------
# KLL-style quantile sketch (no range contract)
# --------------------------------------------------------------------

def _lz32(key: Column, salt: str) -> Column:
    """Number of leading zero BITS in the 32-bit word at md5 hex chars
    1-8 (32 when the word is all zeros) — each item's compaction-tier
    coin-flip sequence, fixed by its hash. Same 4-bit CASE trick as
    :func:`_hll_rho` (no floating log2); DuckDB replays it verbatim."""
    hex1 = F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8)
    rest = F.regexp_replace(hex1, "^0*", "")
    lz_hex = F.lit(8) - F.length(rest)
    nib = F.substring(rest, 1, 1)
    nib_zeros = (
        F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (
        F.when(rest == "", F.lit(32)).otherwise(lz_hex * 4 + nib_zeros).cast("int")
    )


def kll_sketch(
    df: DataFrame,
    value_col: Column | str,
    id_col: Column | str,
    k: int = 256,
    salt: str = "kll",
    by: str | None = None,
) -> DataFrame:
    """KLL-style quantile sketch with NO shard range contract:
    ``(by?, tier, value, level)`` — at most k rows per shard no matter
    how many values went in, mergeable without any up-front [lo, hi]
    agreement (the fixed-edge histogram's one requirement a
    month-spanning ingest can't always make).

    Mechanics: every row's compaction ``tier`` is the number of md5
    coin flips it survives (leading zero bits of a 32-bit hash of its
    ``id_col`` — tier t with probability 2^-t), the md5-ranked
    determinization of KLL's sequential compactor picks. The shard's
    ``level`` L is the smallest tier at which ≤ k rows survive
    (|{tier ≥ L}| ≤ k); the sketch retains exactly those rows, a
    uniform 2^-L-rate sample. Because L is a pure function of the
    tier multiset and every retained row's tier rides along, merging
    per-shard sketches reproduces the direct one-pass sketch
    BIT-FOR-BIT (:func:`merge_kll_sketches`) — the losslessness the
    sequential compaction schedule cannot give. Rank error is the
    uniform sampler's O(1/√k) (vs KLL's O(1/k)) — the price of exact
    mergeability + engine replayability.

    ``id_col`` must be unique per row (it IS the coin-flip source;
    duplicated ids collapse tiers and can starve every level below
    k). NULL values and NULL ids are skipped.

    Scale shape: one zero-shuffle map pass for tiers, one
    partial-aggregated groupBy on (shard, tier) whose key space is ≤
    33 tiers, a broadcast of the 1-row-per-shard level pick back onto
    the stream, and the tier ≥ L filter on the scan — the data never
    shuffles; only ≤ k sketch rows per shard survive.
    """
    if k < 2:
        raise ValueError(f"kll_sketch: need k >= 2, got {k}")
    from pyspark.sql import Window

    c = _col(value_col)
    i = _col(id_col)
    keys = [F.col(by)] if by else []
    rows = df.filter(c.isNotNull() & i.isNotNull()).select(
        *keys,
        _lz32(i, salt).alias("tier"),
        c.cast("double").alias("value"),
    )
    th = rows.groupBy(*keys, "tier").agg(F.count(F.lit(1)).alias("__c"))
    # cumulative "rows at tier >= t" runs over <= 33 tier rows per
    # shard — sketch-sized, never data-sized
    w = (
        Window.partitionBy(*([by] if by else []))
        .orderBy(F.desc("tier"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lvl = (
        th.select(*keys, "tier", F.sum("__c").over(w).alias("__cum"))
        .filter(F.col("__cum") <= k)
        .groupBy(*([by] if by else []))
        .agg(F.min("tier").alias("level"))
    )
    if by:
        sel = rows.join(F.broadcast(lvl), by)
    else:
        sel = rows.crossJoin(F.broadcast(lvl))
    return sel.filter(F.col("tier") >= F.col("level")).select(
        *keys, "tier", "value", "level"
    )


def merge_kll_sketches(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union per-shard KLL sketches (dropping any shard column) into
    one ``(tier, value, level)`` sketch — bit-identical to the direct
    one-pass sketch of the concatenated data.

    Every input's minimal level L_s certifies its tiers below L_s had
    > k survivors, so the merged level starts at base = max(L_s)
    (tiers ≥ base are COMPLETE in the union; anything lower was
    compacted away by some shard and must not be resurrected — the
    theta-sketch merge rule). Above that base the union's tier counts
    equal the full data's, so re-running the level pick lands on
    exactly the direct build's level. ``k`` must match the build's.
    Shuffles only sketch rows (≤ k per input)."""
    if not sketches:
        raise ValueError("merge_kll_sketches: need at least one sketch")
    from pyspark.sql import Window

    u = sketches[0].select("tier", "value", "level")
    for s in sketches[1:]:
        u = u.unionByName(s.select("tier", "value", "level"))
    # The union is sketch-sized (≤ k rows per input) but its lineage
    # is each shard's FULL build — two md5 passes over the data per
    # shard — and four consumers read it (base, cand→tier counts,
    # cand→final filter). A lazy local checkpoint makes the shard
    # builds run exactly once (the threshold_sweep_metrics pattern —
    # eval.py — applied to the sketch merge).
    u = u.localCheckpoint(eager=False)
    base = u.agg(F.max("level").alias("__base"))
    cand = (
        u.crossJoin(F.broadcast(base))
        .filter(F.col("tier") >= F.col("__base"))
        .select("tier", "value")
    )
    th = cand.groupBy("tier").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy(F.desc("tier")).rowsBetween(Window.unboundedPreceding, 0)
    lvl = (
        th.select("tier", F.sum("__c").over(w).alias("__cum"))
        .filter(F.col("__cum") <= k)
        .agg(F.min("tier").alias("level"))
    )
    return (
        cand.crossJoin(F.broadcast(lvl))
        .filter(F.col("tier") >= F.col("level"))
        .select("tier", "value", "level")
    )


def kll_quantiles(
    sketch: DataFrame, qs: list[float], round_digits: int = 6
) -> DataFrame:
    """Quantile estimates from a (merged) KLL sketch: the retained
    rows are a uniform equal-weight sample, so each q reads the
    empirical quantile with linear interpolation at position
    q·(n-1)+1 of the value-sorted sample (the standard continuous
    rule — matches percentile/quantile_cont indexing). Returns
    ``(quantile, estimate)``; an empty sketch returns no rows.

    The rank window runs over the ≤ k-row sketch (single partition by
    construction — sketch-sized, not data-sized; same contract as
    :func:`histogram_quantiles`). Ties in ``value`` make the
    row_number assignment arbitrary but the interpolated estimate
    identical, so the read stays engine-deterministic."""
    from pyspark.sql import Window

    if not qs:
        raise ValueError("kll_quantiles: need at least one quantile")
    if any(not 0.0 < q < 1.0 for q in qs):
        raise ValueError(f"kll_quantiles: quantiles must be in (0, 1): {qs}")
    # three consumers (the count, the lo-side join, the hi-side join)
    # each re-execute the sketch lineage without a cut; the ranked
    # frame is ≤ k rows
    ranked = sketch.select(
        "value", F.row_number().over(Window.orderBy("value")).alias("__rn")
    ).localCheckpoint(eager=False)
    n1 = ranked.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    qf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("quantile")
    targets = (
        n1.filter(F.col("__n") > 0)
        .select("__n", qf)
        .select(
            "quantile",
            (F.col("quantile") * (F.col("__n") - 1) + 1).alias("__t"),
        )
        .select(
            "quantile",
            "__t",
            F.floor("__t").cast("long").alias("__lo"),
            F.ceil("__t").cast("long").alias("__hi"),
        )
    )
    vlo = ranked.select(
        F.col("__rn").alias("__lo"), F.col("value").alias("__vlo")
    )
    vhi = ranked.select(
        F.col("__rn").alias("__hi"), F.col("value").alias("__vhi")
    )
    est = F.col("__vlo") + (F.col("__t") - F.col("__lo")) * (
        F.col("__vhi") - F.col("__vlo")
    )
    return (
        F.broadcast(targets)
        .join(vlo, "__lo")
        .join(vhi, "__hi")
        .select("quantile", F.round(est, round_digits).alias("estimate"))
    )
