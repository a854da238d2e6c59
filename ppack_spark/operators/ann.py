"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force cosine top-k: correctness
  baseline, O(|queries| × |corpus|). The dot product is a JVM
  higher-order ``aggregate(zip_with(...))`` — no Python, codegen'd.
  Queries are broadcast (they are the small side by construction).
* :func:`hyperplane_lsh_buckets` / :func:`cosine_topk_lsh` — the scale
  path: random-hyperplane LSH (sign sketch). Vectors that share a
  bucket are cosine-close with high probability; top-k search then
  only scans the query's bucket (and optionally its Hamming-1
  neighbors). Hyperplanes are derived deterministically from md5 of
  (plane, dim) so the whole operator stays seedless-reproducible and
  oracle-friendly.
* :func:`embedding_near_dup_pairs` — near-duplicate detection by
  cosine threshold within blocks (the embedding analogue of
  dedup.ngram_jaccard_pairs).

At 100 TB the corpus side streams through executors partition-by-
partition while the query side is broadcast; for corpus×corpus
problems use the LSH bucketing so the join is on bucket ids, never a
cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import spread

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "hyperplane_lsh_buckets",
    "cosine_topk_lsh",
    "ivf_index",
    "cosine_topk_ivf",
]


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (query_id, neighbor_id, cos_sim, rank). Self-matches are
    excluded. Ranking uses the rounded similarity with id tie-break so
    results are deterministic and oracle-comparable across engines.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    cos = cosine(F.col("__qv"), F.col("__cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
    round_digits: int = 6,
) -> DataFrame:
    """Pairs with cosine similarity above ``threshold`` (embedding
    near-dup dedup). Block on ``block_col`` at scale."""
    df = spread(df)
    left = df.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_left"), F.col(vec_col).alias("__vl"),
    )
    right = df.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_right"), F.col(vec_col).alias("__vr"),
    )
    joined = (
        left.join(right, on=[block_col]) if block_col else left.crossJoin(right)
    ).filter(F.col("id_left") < F.col("id_right"))
    cos = F.round(cosine(F.col("__vl"), F.col("__vr")), round_digits)
    return (
        joined.select("id_left", "id_right", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") > threshold)
    )


def _hyperplane(plane: int, dims: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d is
    md5(plane:d) mapped to [-1, 1). Stateless, reproducible, and
    expressible in oracle SQL with the same md5/hex arithmetic."""
    comps = []
    for d in range(dims):
        h = F.conv(F.substring(F.md5(F.lit(f"{plane}:{d}")), 1, 8), 16, 10).cast("double")
        comps.append(h / F.lit(float(2**31)) - F.lit(1.0))
    return F.array(*comps)


def hyperplane_lsh_buckets(
    df: DataFrame,
    dims: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-sketch bucket id per vector: bit b = 1 iff v·plane_b > 0."""
    bucket = F.lit(0).cast("long")
    for b in range(n_planes):
        s = dot(F.col(vec_col), _hyperplane(b, dims))
        bucket = bucket + F.when(s > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: k-means centroids over the corpus, each
    vector assigned to its nearest centroid's inverted list.

    Returns ``(assigned, centroids)``: the corpus with a ``centroid``
    bucket column, and the centroid table ``(centroid, centroid_vec)``.
    Training samples/aggregates are Spark ML's distributed k-means;
    at 100 TB one trains on a sample and assigns the full corpus with
    the broadcast centroid set (exactly what the model transform does).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="__features", predictionCol="centroid"
    ).fit(feat)
    assigned = model.transform(feat).drop("__features")
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        centroids, f"centroid int, centroid_vec array<double>"
    )
    return assigned, cent_df


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via an IVF index: each query scans only
    the inverted lists of its ``n_probe`` nearest centroids — an
    equi-join on the centroid id instead of the full cross product.
    Recall@k vs the exact baseline is asserted in tests/test_ann.py.
    The LSH variant (:func:`cosine_topk_lsh`) needs no training;
    IVF adapts to the data distribution, which wins when the corpus is
    clustered."""
    from pyspark.sql import Window

    assigned, cent_df = ivf_index(corpus, n_centroids, id_col, vec_col, seed)
    cb = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "centroid"
    )
    # query → its n_probe nearest centroids (tiny broadcast cross join)
    qc = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("__cd", cosine(F.col("__qv"), F.col("centroid_vec")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__cd"), F.asc("centroid"))
    probes = (
        qc.withColumn("__cr", F.row_number().over(wq))
        .filter(F.col("__cr") <= n_probe)
        .select("query_id", "__qv", "centroid")
    )
    scored = (
        probes.join(cb, on="centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dims: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: equi-join on LSH bucket, then exact
    cosine rank within the bucket. Trades recall for turning the cross
    product into a hash join on bucket ids — the 100 TB shape.

    ``multi_probe`` ≥ 1 additionally probes every bucket within that
    Hamming distance of the query's sketch (query side only: the
    corpus is stored once, queries fan out to 1 + C(n_planes,1) + …
    probe buckets). Multi-probe recovers the recall lost to sign-flip
    boundary noise at a small candidate-set cost — the standard
    alternative to multiplying hash tables (Lv et al., VLDB 2007).
    Recall@k vs the exact baseline is asserted in tests/test_ann.py.
    """
    from itertools import combinations

    from pyspark.sql import Window

    qb = hyperplane_lsh_buckets(queries, dims, n_planes, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "bucket"
    )
    if multi_probe > 0:
        masks = [0]
        for d in range(1, multi_probe + 1):
            for bits in combinations(range(n_planes), d):
                masks.append(sum(1 << b for b in bits))
        probes = F.array_distinct(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)).cast("long") for m in masks])
        )
        qb = qb.select(
            "query_id", "__qv", F.explode(probes).alias("bucket")
        )
    cb = hyperplane_lsh_buckets(corpus, dims, n_planes, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "bucket"
    )
    scored = (
        qb.join(cb, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
        # a neighbor can collide in several probe buckets — dedup
        # before ranking so row_number sees each candidate once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
