"""Text-analysis functions for large-scale training-data pipelines.

All of these are pure Column expressions over ``pyspark.sql.functions``
higher-order array functions — JVM-side, whole-stage-codegen'd, no
Python in the hot path. Each has an exactly-equivalent DuckDB SQL
form used by the correctness oracle (see plans/registry.py).

Design note (100 TB): everything here is embarrassingly parallel
per-row map work — no shuffle at all. The only care needed at scale
is keeping these expressions inside codegen (they are) and letting
the parquet scan prune to the ``text`` column (it does — check
ReadSchema in .explain()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "quality_features",
    "language_scores",
    "rewrap_lines",
    "repetition_signals",
    "c4_quality_flags",
    "doc_fingerprint",
    "tfidf_top_terms",
    "redact_pii",
    "pii_counts",
    "STOPWORDS",
    "PII_PATTERNS",
    "script_fractions",
    "SCRIPT_RANGES",
    "canonical_url",
    "canonical_host",
    "TRACKING_PARAM_RE",
]

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language id. Deliberately small and alphabetical: the oracle SQL
# inlines the same lists.
STOPWORDS: dict[str, list[str]] = {
    "en": ["a", "and", "for", "in", "is", "of", "on", "the", "to", "with"],
    "de": ["das", "der", "die", "ein", "ist", "mit", "nicht", "und", "von", "zu"],
    "fr": ["de", "des", "du", "et", "la", "le", "les", "pour", "que", "un"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed, lowercased text.
    DuckDB equivalent: ``string_split_regex(lower(trim(text)), '\\s+')``."""
    return F.split(F.lower(F.trim(_col(text))), r"\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text, NULL for NULL
    text (explicitly — the naive ``size(split(...))`` form returns -1
    for NULL under Spark's legacy sizeOfNull, which silently CORRUPTS
    any SUM/AVG over a corpus with NULL documents)."""
    t = F.trim(_col(text))
    return (
        F.when(t.isNull(), F.lit(None).cast("int"))
        .when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Subword-ish token count: splits on word/non-word boundaries the
    way a byte-pair tokenizer fragments text — counts runs of letters,
    runs of digits, and individual punctuation as separate tokens.
    DuckDB: ``len(regexp_extract_all(text, pattern))``."""
    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return F.size(F.regexp_extract_all(_col(text), F.lit(pattern), F.lit(0)))


def quality_features(text: Column | str, lang: str = "en") -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punctuation and
    stopword ratios. Returns named Columns; callers select the ones
    they need (each is independent, so column pruning still applies).
    """
    t = _col(text)
    toks = tokens(t)
    n_tok = token_count(t)
    sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    n_chars = F.length(t)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": F.when(n_tok == 0, F.lit(0.0)).otherwise(
            (n_chars - (n_tok - 1)) / n_tok.cast("double")
        ),
        "punct_ratio": F.when(n_chars == 0, F.lit(0.0)).otherwise(
            n_punct / n_chars.cast("double")
        ),
        "stopword_ratio": F.when(n_tok == 0, F.lit(0.0)).otherwise(
            n_stop / n_tok.cast("double")
        ),
    }


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword hit ratio — the classic cheap language-id
    heuristic. Returns one score column per language in STOPWORDS."""
    toks = tokens(text)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    out = {}
    for lang, words in STOPWORDS.items():
        sw = F.array([F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        out[lang] = hits / n_tok.cast("double")
    return out


def rewrap_lines(text: Column | str, words_per_line: int = 8) -> Column:
    """Re-wrap single-space-tokenized text into fixed-width lines of
    ``words_per_line`` words joined by newlines. Pure higher-order
    expression (transform over sequence) — no explode, no shuffle.

    DuckDB equivalent::

        array_to_string(
          list_transform(
            generate_series(0, cast(ceil(len(string_split(t,' '))/8.0)
                                    as int) - 1),
            i -> array_to_string(list_slice(string_split(t,' '),
                                            i*8+1, i*8+8), ' ')),
          chr(10))
    """
    w = F.split(_col(text), " ", -1)
    n_lines = F.ceil(F.size(w) / F.lit(float(words_per_line))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(w, i * words_per_line + 1, words_per_line), " "
        ),
    )
    return F.array_join(lines, "\n")


def repetition_signals(text: Column | str) -> dict[str, Column]:
    """Gopher-style within-document repetition signals (Rae et al.
    2021 §A1.1: repetitious documents are low-quality): fraction of
    duplicate lines and duplicate words inside the document. Pure
    array expressions — per-doc map work, zero shuffle, so the signal
    pass streams over 100 TB at scan speed.

    DuckDB equivalents use ``string_split`` / ``string_split_regex``
    + ``list_distinct`` (the gate SQL in plans/registry_data.py
    replays them exactly)."""
    t = _col(text)
    lines = F.split(t, "\n", -1)
    words = F.split(F.trim(t), r"\s+", -1)
    n_lines = F.size(lines)
    n_words = F.size(words)
    return {
        "n_lines": n_lines,
        "n_words": n_words,
        "dup_line_frac": (n_lines - F.size(F.array_distinct(lines)))
        / n_lines.cast("double"),
        "dup_word_frac": (n_words - F.size(F.array_distinct(words)))
        / n_words.cast("double"),
    }


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text. Identical in DuckDB:
    ``md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))``."""
    norm = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    return F.md5(norm)


# PII patterns, ordered: URLs are redacted first so an email inside a
# URL query-string counts once (as the URL); phones last so digits
# inside URLs/emails are already gone. Every pattern is valid and
# semantically identical in both Java regex (Spark) and RE2 (DuckDB) —
# no backrefs, no lookaround — so the redaction is exactly
# oracle-checkable.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\s.-]{7,}[0-9]", "<PHONE>"),
]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts on the RAW text (counted before any
    redaction, each kind independently). DuckDB:
    ``len(regexp_extract_all(text, pattern))``."""
    t = _col(text)
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column | str) -> Column:
    """Replace URLs, then emails, then phone-like digit runs with typed
    placeholder tags. Chained ``regexp_replace`` — pure codegen map
    work, no shuffle, column-pruned to ``text``. DuckDB equivalent:
    the same chain with ``regexp_replace(..., 'g')``."""
    out = _col(text)
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def tfidf_top_terms(
    docs,
    n_docs: int,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-``k`` terms per document by TF-IDF (tf · ln(N/df)).

    Plan shape: explode tokens → (doc, term) counts (map-side partial
    agg) → document-frequency aggregate on the term → equi-join tf×df
    (AQE broadcasts the df side when it fits) → per-doc ranking window.
    All shuffles key on term or doc id; nothing is quadratic. ``n_docs``
    is passed in so callers batch it with counts they already have.

    Deterministic tie-break (tfidf desc, term asc) and an exact DuckDB
    oracle — both engines evaluate the identical double expression.
    """
    from pyspark.sql import Window

    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, on="term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").alias("tf"),
            F.col("df").alias("df"),
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def c4_quality_flags(
    text: Column | str,
    min_words: int = 5,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
) -> dict[str, Column]:
    """C4/Gopher-style document quality heuristics (Raffel et al. 2020
    §2.2; Rae et al. 2021 §A1.1): word count floor, mean-word-length
    band, symbol (#/…) ratio cap, boilerplate markers ("lorem ipsum",
    curly braces — C4 drops any page containing either). Returns the
    individual signal columns plus ``keep`` (the conjunction), so a
    pipeline can either filter or keep the flags for analysis.

    Pure string/array expressions, engine-portable: the gate SQL
    replays each with string_split_regex / list_transform /
    replace-based character counts."""
    t = _col(text)
    words = F.split(F.trim(t), r"\s+", -1)
    n_words = F.size(words)
    mean_word_len = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x
    ) / F.greatest(n_words, F.lit(1)).cast("double")
    stripped = F.replace(F.replace(t, F.lit("#"), F.lit("")), F.lit("…"), F.lit(""))
    symbol_ratio = (F.length(t) - F.length(stripped)) / F.greatest(
        F.length(t), F.lit(1)
    ).cast("double")
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    has_curly = F.contains(t, F.lit("{"))
    keep = (
        (n_words >= min_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & ~has_lorem
        & ~has_curly
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "has_lorem_ipsum": has_lorem,
        "has_curly_brace": has_curly,
        "keep": keep,
    }


SCRIPT_RANGES = {
    # Java-regex and RE2 both accept [\x{...}-\x{...}] classes, so the
    # same pattern strings replay in the DuckDB oracle verbatim
    "latin": r"[A-Za-z\x{00c0}-\x{024f}]",
    "cjk": r"[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]",
    "cyrillic": r"[\x{0400}-\x{04ff}]",
    "arabic": r"[\x{0600}-\x{06ff}]",
    "devanagari": r"[\x{0900}-\x{097f}]",
}


def script_fractions(text: Column | str) -> dict[str, Column]:
    """Unicode-script composition of a document: per-script fraction
    of non-whitespace characters plus the dominant script — the
    writing-system detector CCNet/mC4-style pipelines run BEFORE
    language id (stopword-based lang-id is meaningless on the wrong
    script, and mixed-script text is its own quality signal: mojibake,
    spam, and wrongly-decoded pages show up as script soup).

    Pure codegen regexp counts — zero shuffle, pipelines into the
    scan. Returns ``{script: fraction}`` plus ``"dominant"`` (the
    argmax script name, ties broken by the fixed SCRIPT_RANGES order,
    ``'other'`` when nothing matches). Fractions use the non-space
    char count as the denominator, so punctuation/digits dilute every
    script equally.
    """
    t = _col(text)
    n = F.greatest(
        F.length(F.regexp_replace(t, r"\s+", "")), F.lit(1)
    ).cast("double")
    fracs = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))) / n
        for name, pat in SCRIPT_RANGES.items()
    }
    dominant = F.lit("other")
    best = F.lit(0.0)
    for name in SCRIPT_RANGES:  # fixed order = deterministic ties
        is_better = fracs[name] > best
        dominant = F.when(is_better, F.lit(name)).otherwise(dominant)
        best = F.when(is_better, fracs[name]).otherwise(best)
    return {**fracs, "dominant": dominant}


# Query parameters that identify a CAMPAIGN, not a document: the
# standard strip list every web-corpus canonicalizer applies before
# using the URL as a dedup key (utm_* per Google Analytics, the
# click-id families, mailchimp ids). Case-sensitive, as the params
# are specified. The oracle SQL inlines the same alternation.
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src)"
    r"(=.*)?$"
)


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL for identity comparison — the key the
    CCNet-style first-stage dedup groups on BEFORE any content
    hashing (the same page is crawled under www/non-www, http/https,
    tracking-parameter, fragment, and trailing-slash variants; URL
    canonicalization collapses those for free, content dedup then
    handles the rest).

    Steps (standard whatwg/rfc3986-flavored normalization, the subset
    that is deterministic without fetching): strip the fragment;
    lowercase scheme and host; drop a leading ``www.``; drop the
    scheme's default port (``:80`` http / ``:443`` https); drop
    trailing slashes on the path; drop tracking query parameters
    (:data:`TRACKING_PARAM_RE`) and SORT the survivors (param order
    is not identity). Path case and remaining param values are
    preserved — they ARE identity. Inputs with no ``scheme://``
    (scheme-relative junk, bare hosts) fall back to
    ``lower(trim(input))`` with the fragment stripped — no structure
    to normalize, but at least case- and fragment-insensitive. NULL
    in, NULL out.

    Pure codegen (regexp extraction + higher-order array ops), zero
    shuffle — pipelines into the scan like every other text function
    here; the oracle replays each step in DuckDB SQL term for term."""
    u = F.regexp_replace(F.trim(_col(url)), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(F.lower(u))


def canonical_host(url: Column | str) -> Column:
    """The canonical authority of a URL — :func:`canonical_url`'s
    host component (already lowercased, ``www.``- and default-port-
    stripped). Scheme-less fallback rows use everything before the
    first ``/``/``?``/``#``. NULL in, NULL out; the empty string (no
    recognizable host) comes back as NULL so host-keyed aggregations
    never build an ``''`` group. Shared by the crawl-mix report and
    the per-host boilerplate removal so "host" can never drift
    between the two."""
    canon = canonical_url(url)
    host = F.when(
        canon.contains("://"),
        F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
    ).otherwise(F.regexp_extract(canon, r"^([^/?#]*)", 1))
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)
