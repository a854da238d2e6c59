"""BM25 ranked keyword retrieval over a document corpus.

The classic bag-of-words relevance function (Robertson & Walker 1994;
Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
BM25 and Beyond") — the standard first-stage retriever next to the
embedding ANN family in ``operators/ann.py``: ANN answers "nearest by
vector", BM25 answers "best by query terms", and a production corpus
service needs both.

Scale shape (100 TB): the corpus-side scan is pruned to query-term
occurrences BEFORE anything shuffles — tokens stream through a
broadcast semi-join against the (tiny) query-term set, so the only
(doc, term) groups that aggregate are hits; document length is a pure
per-row expression; N, avgdl, and per-term document frequencies are
one-row / query-term-sized frames joined broadcast; and the final
top-k per query is a rank-pruned window (WindowGroupLimit — per-
partition top-k then a k-row merge, never a global sort). Nothing in
the plan is keyed on anything wider than (query_id, doc_id) for hit
rows only. No UDFs anywhere — every expression is JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens
from .util import spread

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    ``queries`` is a (query_id, term) DataFrame — one row per query
    term, terms already normalized the way :func:`tokens` normalizes
    the corpus (lowercase, whitespace-delimited). Duplicate (query_id,
    term) rows are collapsed (a term listed twice is one term, not a
    double weight).

    Scoring, the standard formulation::

        idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
        score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
                                 / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))

    with N = searchable corpus size (non-NULL-text documents — the
    same population avgdl averages), df = documents containing the
    term, |d| = document length in tokens, avgdl the corpus mean
    length over non-NULL docs. The
    +0.5/+1 smoothing is the Lucene/standard variant whose idf stays
    positive for any df. Documents matching no query term score 0 and
    are not returned; NULL text never matches.

    Returns (query_id, doc_id, score, rank) with rank 1..k per query,
    deterministically tie-broken (rounded score desc, doc id asc) —
    ranking uses the 6-decimal-rounded score so near-ULP summation
    differences can't flip ranks between engines; the DuckDB oracle
    replays the tokenization, the statistics, and the arithmetic term
    for term.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("term").cast("string").alias("term"),
    ).distinct()
    qterms = q.select("term").distinct()

    tok = (
        spread(docs)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select(
        F.col(id_col), token_count(text_col).cast("double").alias("dl")
    )
    # N counts non-NULL-text documents only, so it describes the same
    # population avgdl averages over (token_count is NULL for NULL
    # text, and F.avg skips NULLs): a corpus with many NULL-text rows
    # must not inflate idf relative to the searchable corpus
    stats = docs.agg(
        F.count(F.col(text_col)).cast("double").alias("n_docs"),
        F.avg(token_count(text_col)).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(float(k1) + 1.0) / norm

    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(q), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col), "score", "rank")
    )
