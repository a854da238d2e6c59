"""BM25 ranked-retrieval invariants (operators/search.py) — exact
score parity with a pure-python reference implementation, tie-break
determinism, and the null/empty/duplicate edge semantics the
SQL-oracle gate's fixture doesn't contain."""

from __future__ import annotations

import math

import pytest

from ppack_spark.operators.search import bm25_topk

DOCS = [
    (1, "apple banana apple"),
    (2, "apple cherry"),
    (3, "banana banana banana banana"),
    (4, "date"),
]
QUERY = [(1, "apple"), (1, "banana"), (2, "date"), (2, "missing")]


def _ref_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Pure-python Okapi BM25 over whitespace tokens."""
    toks = {i: t.lower().split() for i, t in docs if t is not None}
    n = len(docs)
    dls = {i: len(v) for i, v in toks.items()}
    avgdl = sum(
        len(t.lower().split()) for _, t in docs if t is not None
    ) / sum(1 for _, t in docs if t is not None)
    scores: dict[tuple[int, int], float] = {}
    for qid, terms in query_terms.items():
        for term in terms:
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                norm = tf + k1 * (1 - b + b * dls[i] / avgdl)
                scores[(qid, i)] = scores.get((qid, i), 0.0) + idf * tf * (
                    k1 + 1
                ) / norm
    return {key: round(s, 6) for key, s in scores.items()}


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERY, "query_id long, term string")
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(docs, q, k=10).collect()
    }
    want = _ref_bm25(DOCS, {1: ["apple", "banana"], 2: ["date", "missing"]})
    assert got == pytest.approx(want, abs=1e-6)


def test_bm25_rank_and_k_bound(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame([(7, "banana")], "query_id long, term string")
    rows = bm25_topk(docs, q, k=1).collect()
    # doc 3 has the highest banana tf and should win at k=1
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in rows] == [
        (7, 3, 1)
    ]


def test_bm25_tiebreak_is_doc_id_asc(spark):
    # two identical docs score identically -> lower id ranks first
    docs = spark.createDataFrame(
        [(10, "x y"), (2, "x y"), (5, "z")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "x")], "query_id long, term string")
    rows = sorted(bm25_topk(docs, q, k=10).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [2, 10]


def test_bm25_null_and_nonmatching_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, None), (3, "unrelated words")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "apple")], "query_id long, term string")
    rows = bm25_topk(docs, q, k=10).collect()
    assert {r["doc_id"] for r in rows} == {1}


def test_bm25_duplicate_query_rows_collapse(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q1 = spark.createDataFrame([(1, "apple")], "query_id long, term string")
    q2 = spark.createDataFrame(
        [(1, "apple"), (1, "apple")], "query_id long, term string"
    )
    s1 = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(docs, q1).collect()
    }
    s2 = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(docs, q2).collect()
    }
    assert s1 == s2


def test_bm25_k_must_be_positive(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame([(1, "apple")], "query_id long, term string")
    with pytest.raises(ValueError):
        bm25_topk(docs, q, k=0)
