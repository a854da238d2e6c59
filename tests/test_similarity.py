"""Jaro-Winkler parity with the oracle (DuckDB's builtin is what the
reference calls, comparators.R:9-11) + levenshtein similarity sanity."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ppack_spark.similarity import jaro_winkler_py, levenshtein_similarity, jaro_winkler

WORDS = [
    "martha", "marhta", "dwayne", "duane", "dixon", "dicksonx", "jellyfish",
    "smellyfish", "", "a", "ab", "abc", "abcd", "aaaa", "CRATE", "TRACE",
    "Customer#000000001", "Customer#000000010", "DVD", "dvd", "müller",
    "mueller", "jon", "john", "jan", "  spaced ", "x" * 50, "y" * 50,
]


def _duck_jw(a: str, b: str) -> float:
    con = duckdb.connect()
    return con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]


@pytest.mark.parametrize("a", WORDS[:14])
@pytest.mark.parametrize("b", WORDS[:14])
def test_jw_matches_duckdb_pairs(a, b):
    assert jaro_winkler_py(a, b) == pytest.approx(_duck_jw(a, b), abs=1e-12)


def test_jw_full_wordlist_cross():
    con = duckdb.connect()
    for a in WORDS:
        for b in WORDS:
            want = con.execute(
                "select jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert jaro_winkler_py(a, b) == pytest.approx(want, abs=1e-12), (a, b)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdefgh ", max_size=12),
    st.text(alphabet="abcdefgh ", max_size=12),
)
def test_jw_matches_duckdb_property(a, b):
    con = duckdb.connect()
    want = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    assert jaro_winkler_py(a, b) == pytest.approx(want, abs=1e-12)


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="aéß漢б emoji🙂", max_size=10),
    st.text(alphabet="aéß漢б emoji🙂", max_size=10),
)
def test_jw_matches_duckdb_unicode_property(a, b):
    """DuckDB computes JW over UTF-8 BYTES, not codepoints; the Python
    implementation must agree on multi-byte inputs too."""
    con = duckdb.connect()
    want = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    assert jaro_winkler_py(a, b) == pytest.approx(want, abs=1e-12)


def test_jw_nulls_propagate():
    assert jaro_winkler_py(None, "x") is None
    assert jaro_winkler_py("x", None) is None


def test_jw_udf_in_plan(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), (None, "x")], "a string, b string"
    )
    rows = df.select(jaro_winkler("a", "b").alias("jw")).collect()
    assert rows[0]["jw"] == pytest.approx(0.9611111111111111)
    assert rows[1]["jw"] is None


def test_levenshtein_similarity(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("abc", "abc"), ("", ""), ("a", None)],
        "a string, b string",
    )
    rows = df.select(levenshtein_similarity("a", "b").alias("s")).collect()
    assert rows[0]["s"] == pytest.approx(1 - 3 / 7)
    assert rows[1]["s"] == pytest.approx(1.0)
    assert rows[2]["s"] == pytest.approx(1.0)
    assert rows[3]["s"] is None
