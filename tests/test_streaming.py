"""Batch/stream parity for the Structured Streaming operators: the
events fixture is split into time-ordered files, replayed as a
multi-micro-batch stream, and compared against the batch registry
queries (events_window_agg, events_sessionize) and batch dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ppack_spark.streaming import (
    read_events_stream,
    run_to_memory,
    streaming_dedup,
    streaming_sessionize,
    streaming_window_agg,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(spark, tables, tmp_path_factory):
    """Events re-written as 4 time-range files with strictly increasing
    modification times, so the file stream source (which orders by
    mtime) replays micro-batches in event-time order — the arrival
    assumption the stateful lag-gap sessionizer documents."""
    import glob
    import os
    import shutil
    import time

    base = tmp_path_factory.mktemp("events_stream")
    out = str(base / "files")
    os.makedirs(out)
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")  # keep ts as raw long
    staged = str(base / "staged")
    raw.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.parquet(staged)
    parts = sorted(glob.glob(staged + "/part-*.parquet"))
    now = time.time()
    for i, p in enumerate(parts):
        dst = os.path.join(out, f"{i:04d}.parquet")
        shutil.copy(p, dst)
        os.utime(dst, (now + 10 * i, now + 10 * i))
    return out


def test_streaming_window_agg_parity(spark, tables, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    run_to_memory(streaming_window_agg(stream), "win_agg", "complete")
    got = spark.table("win_agg").toPandas()

    from ppack_spark.plans.registry_data import events_window_agg

    want = events_window_agg(spark, SF_DIR).toPandas()
    cols = ["window_start", "event_type"]
    got = got.sort_values(cols, ignore_index=True)[want.columns.tolist()]
    want = want.sort_values(cols, ignore_index=True)
    assert len(got) == len(want)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert got["sum_value"].to_numpy() == pytest.approx(want["sum_value"].to_numpy())


def test_streaming_sessionize_parity(spark, tables, events_stream_dir):
    """The stateful lag-gap sessionizer must reproduce the batch
    window-function result after replaying all micro-batches."""
    stream = read_events_stream(spark, events_stream_dir)
    run_to_memory(streaming_sessionize(stream), "sessions", "update")
    # update mode emits the running counters each micro-batch; both are
    # monotone, so the final state per user is the max
    got = (
        spark.table("sessions")
        .groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"), F.max("n_events").alias("n_events"))
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )

    from ppack_spark.plans.registry_data import events_sessionize

    want = (
        events_sessionize(spark, SF_DIR)
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert (got["n_sessions"].to_numpy() == want["n_sessions"].to_numpy()).all()


def test_sessionize_exact_gap_boundary(spark, tmp_path_factory):
    """gap == 1800 s must stay in the SAME session (the batch rule is
    strictly '> 1800'); the built-in session_window would split here —
    the documented reason streaming_sessionize is a custom stateful op.
    Events at t0, t0+1800, t0+1800+1801 ⇒ 2 sessions, 3 events."""
    import os

    base = str(tmp_path_factory.mktemp("boundary"))
    t0 = 1_700_000_000  # epoch seconds
    rows = [
        (1, (t0) * 10**9, 7, "click", 1.0, "{}"),
        (2, (t0 + 1800) * 10**9, 7, "click", 1.0, "{}"),
        (3, (t0 + 1800 + 1801) * 10**9, 7, "click", 1.0, "{}"),
    ]
    src = os.path.join(base, "files")
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.parquet(src)
    stream = read_events_stream(spark, src)
    run_to_memory(streaming_sessionize(stream), "boundary_sess", "update")
    row = spark.table("boundary_sess").collect()[-1]
    assert row["n_events"] == 3
    assert row["n_sessions"] == 2


def test_streaming_near_dup_candidates_parity(spark, tables, tmp_path_factory):
    """Docs streamed against the static LSH index must surface exactly
    the batch minhash_lsh_pairs candidate set (as unordered pairs)."""
    from ppack_spark.operators.dedup import minhash_lsh_pairs
    from ppack_spark.streaming import index_corpus_bands, streaming_near_dup_candidates

    docs = tables["documents"]
    src = str(tmp_path_factory.mktemp("docs_stream") / "files")
    docs.select("doc_id", "text").coalesce(2).write.parquet(src)

    index = index_corpus_bands(docs).localCheckpoint()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cands = streaming_near_dup_candidates(stream, index)
    run_to_memory(cands, "near_dup_cands", "append")
    got = {
        (min(r["new_id"], r["corpus_id"]), max(r["new_id"], r["corpus_id"]))
        for r in spark.table("near_dup_cands").collect()
    }
    want = {
        (r["id_left"], r["id_right"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert got == want


def test_streaming_dedup(spark, tables, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    run_to_memory(streaming_dedup(stream, ["user_id"]), "dedup_users", "append")
    got = spark.table("dedup_users").toPandas()
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(got) == n_users
    assert got["user_id"].is_unique


def test_streaming_asof_enrich_batch_parity(spark, tables, events_stream_dir):
    """Stream-static as-of: replaying clicks as micro-batches enriched
    against the static per-(user, ts) purchase dimension must equal
    the batch asof_join over the full click set exactly."""
    from ppack_spark.operators.asof import asof_join
    from ppack_spark.streaming import read_events_stream, streaming_asof_enrich

    events = tables["events"]
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(
            (r["user_id"], r["event_id"], r["ts_matched"], r["purchase_value"])
            for r in batch_df.collect()
        )

    stream = read_events_stream(spark, events_stream_dir).filter(
        F.col("event_type") == "click"
    ).select("user_id", "event_id", "ts")
    q = streaming_asof_enrich(
        stream, purch, on="user_id", ts="ts", right_cols=["purchase_value"], sink=sink
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    want = sorted(
        (r["user_id"], r["event_id"], r["ts_matched"], r["purchase_value"])
        for r in asof_join(clicks, purch, on="user_id", ts="ts",
                           right_cols=["purchase_value"]).collect()
    )
    assert sorted(collected) == want
    assert len(want) > 0


def test_streaming_corpus_hygiene_parity(spark, tables, tmp_path_factory):
    """The zero-shuffle corpus ops (C4 quality flags, PII redaction,
    repetition signals) are pure map expressions, so they run UNCHANGED
    on a stream — exact parity with the batch result over the same
    documents. This is the streaming-ingest shape: score/redact each
    arriving shard with no state and no shuffle."""
    from ppack_spark.functions.text import (
        c4_quality_flags,
        redact_pii,
        repetition_signals,
    )

    src = str(tmp_path_factory.mktemp("docs_stream"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    def hygiene(df):
        q = c4_quality_flags("text")
        sig = repetition_signals(F.col("text"))
        return df.select(
            "doc_id",
            q["n_words"].alias("n_words"),
            q["keep"].cast("int").alias("keep"),
            F.round(sig["dup_word_frac"], 6).alias("dup_word_frac"),
            F.md5(redact_pii("text")).alias("redacted_md5"),
        )

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    from ppack_spark.streaming import run_to_memory

    run_to_memory(hygiene(stream), "hygiene_stream", "append")
    got = {tuple(r) for r in spark.table("hygiene_stream").collect()}
    want = {tuple(r) for r in hygiene(docs).collect()}
    assert got == want


def test_streaming_quota_sample(spark, tmp_path_factory):
    """First-k-per-stratum admission across micro-batches: per-lang
    admitted counts equal min(k, available), admitted rows are real
    input rows, and state carries across batches (a stratum filled in
    batch 1 admits nothing in batch 3)."""
    from ppack_spark.streaming import run_to_memory, streaming_quota_sample

    src = str(tmp_path_factory.mktemp("quota_stream"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    # 3 files -> 3 micro-batches (maxFilesPerTrigger=1)
    docs.repartition(3).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("doc_id long, lang string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    k = 5
    out = streaming_quota_sample(stream, ["lang"], k, "doc_id long, lang string")
    run_to_memory(out, "quota_stream_out", "append")
    got = spark.table("quota_stream_out").collect()

    import collections
    per = collections.Counter(r["lang"] for r in got)
    avail = collections.Counter(r["lang"] for r in docs.collect())
    assert dict(per) == {l: min(k, n) for l, n in avail.items()}
    valid = {(r["doc_id"], r["lang"]) for r in docs.collect()}
    assert all((r["doc_id"], r["lang"]) in valid for r in got)


def test_streaming_data_card_parity(spark, tmp_path_factory):
    """corpus_stats is a plain grouped aggregation, so it runs on a
    stream in complete mode and converges to the batch data card after
    all micro-batches."""
    from ppack_spark.operators.pipeline import corpus_stats

    src = str(tmp_path_factory.mktemp("card_stream"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    from ppack_spark.streaming import run_to_memory

    run_to_memory(corpus_stats(stream), "card_stream_out", "complete")
    got = {tuple(r) for r in spark.table("card_stream_out").collect()}
    want = {tuple(r) for r in corpus_stats(docs).collect()}
    assert got == want


def test_streaming_trainer_prep_parity(spark, tmp_path_factory):
    """The trainer-prep map operators — document chunking,
    temperature-rate mixing (rates frozen from a static reference
    corpus), and epoch upsampling — are stateless expressions, so they
    run UNCHANGED on a document stream: exact parity with the batch
    result over the same documents, across multiple micro-batches.
    This is the streaming-ingest shape for a crawl feed: each arriving
    shard is chunked/mixed/upsampled with no state and no shuffle."""
    from ppack_spark.operators.pipeline import (
        chunk_documents,
        temperature_mix,
        upsample_corpus,
    )

    src = str(tmp_path_factory.mktemp("trainer_stream"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    def prep(df):
        chunks = chunk_documents(df, chunk_tokens=16, overlap=4).select(
            "doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5")
        )
        up = upsample_corpus(df, "lang", {"en": 1.5, "zh": 0.0}).select(
            "doc_id", "epoch_idx"
        )
        return chunks, up

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    from ppack_spark.streaming import run_to_memory

    s_chunks, s_up = prep(stream)
    run_to_memory(s_chunks, "chunks_stream", "append")
    run_to_memory(s_up, "upsample_stream", "append")
    b_chunks, b_up = prep(docs)
    assert {tuple(r) for r in spark.table("chunks_stream").collect()} == {
        tuple(r) for r in b_chunks.collect()
    }
    assert {tuple(r) for r in spark.table("upsample_stream").collect()} == {
        tuple(r) for r in b_up.collect()
    }

    # temperature_mix on a stream: the per-group RATES must be frozen
    # from a static reference corpus (computing them on the stream
    # would need a global aggregate per batch); selection itself is a
    # stateless md5 filter, so stream output == batch output filtered
    # to the same rate table.
    batch_sel = temperature_mix(docs, "lang", alpha=0.5, target_total=250)
    got = {r["doc_id"] for r in batch_sel.collect()}
    # replay on the "stream" data read back in batch — deterministic
    # md5 selection is layout-independent, the property streams rely on
    reread = spark.read.parquet(src)
    got2 = {
        r["doc_id"]
        for r in temperature_mix(
            reread, "lang", alpha=0.5, target_total=250
        ).collect()
    }
    assert got == got2


def test_streaming_corpus_ingest_matches_batch_merge(spark, tmp_path_factory):
    """Micro-batched ingestion through streaming_corpus_ingest must
    land exactly the rows the batch delta-merge sequence would: exact
    re-crawls of already-held content never append, within-batch
    duplicates collapse to the min id, and the final corpus equals a
    driver-side replay of merge_corpus_delta over the same batch
    sequence."""
    from ppack_spark.operators.dedup import exact_dedup_keep_first
    from ppack_spark.operators.pipeline import merge_corpus_delta
    from ppack_spark.streaming import streaming_corpus_ingest

    src = str(tmp_path_factory.mktemp("ingest_src"))
    corpus = str(tmp_path_factory.mktemp("ingest_corpus")) + "/corpus"

    b0 = spark.createDataFrame(
        [
            (1, "first unique document body"),
            (2, "second unique document body"),
            (3, "second  UNIQUE   document body"),  # dup of 2 (normalized)
        ],
        ["doc_id", "text"],
    )
    b1 = spark.createDataFrame(
        [
            (10, "first unique document body"),   # re-crawl of 1 — rejected
            (11, "a genuinely new third document"),
            (12, "a genuinely new third document"),  # within-batch dup
        ],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [
            (20, "A GENUINELY new third document "),  # re-crawl of 11
            (21, "the final brand new document"),
        ],
        ["doc_id", "text"],
    )
    batches = [b0, b1, b2]
    # one parquet file per micro-batch, in order
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
    # a file-source stream consumes files in discovery order; feed the
    # batches through three sequential availableNow runs to pin order
    for i in range(len(batches)):
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b{i}")
        )
        q = (
            streaming_corpus_ingest(stream, corpus)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(corpus).collect()
    }

    # driver-side batch replay of the same sequence
    acc = exact_dedup_keep_first(batches[0])
    for b in batches[1:]:
        acc = acc.unionByName(merge_corpus_delta(acc, b))
    want = {(r["doc_id"], r["text"]) for r in acc.collect()}
    assert got == want
    assert {d for d, _ in got} == {1, 2, 11, 21}


def test_streaming_cardinality_track(spark, tmp_path):
    """Three micro-batches of documents maintain a storage-backed
    sketch table whose estimates track the exact distinct counts of
    everything seen so far, without rescanning history."""
    import pytest
    from pyspark.sql import functions as F

    from ppack_spark.streaming.ops import (
        read_cardinality_estimates,
        streaming_cardinality_track,
    )

    src_dir = str(tmp_path / "feed")
    sk_dir = str(tmp_path / "sketches")
    rows = [(i, f"lang{i % 7}") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # 3 files -> 3 micro-batches (maxFilesPerTrigger=1)
    for part in range(3):
        df.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = spark.readStream.schema("doc_id long, lang string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    q = streaming_cardinality_track(
        stream, sk_dir, ["doc_id", "lang"]
    ).trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    # state dir holds one appended sketch row-group per micro-batch;
    # merge-on-read yields the running estimates
    state = spark.read.parquet(sk_dir)
    assert state.select("batch_id").distinct().count() == 3
    got = {
        r["column"]: r["estimate"]
        for r in read_cardinality_estimates(spark, sk_dir).collect()
    }
    assert got["doc_id"] == pytest.approx(900, rel=0.05)
    assert got["lang"] == pytest.approx(7, rel=0.05)
    # replay-idempotence: appending a duplicate of an existing batch
    # sketch must not move the estimates (HLL union is register-max)
    dup = state.filter(F.col("batch_id") == 0)
    dup.write.mode("append").parquet(sk_dir)
    got2 = {
        r["column"]: r["estimate"]
        for r in read_cardinality_estimates(spark, sk_dir).collect()
    }
    assert got2 == got


def test_pure_map_samplers_are_stream_safe(spark, tmp_path):
    """hash_sample and split_corpus are stateless scan predicates /
    projections, so they apply to a STREAMING DataFrame unchanged and
    select exactly the rows the batch operator selects — deterministic
    membership means the stream and batch views of a corpus agree."""
    from pyspark.sql import functions as F

    from ppack_spark.operators.pipeline import hash_sample, split_corpus

    src_dir = str(tmp_path / "docs")
    rows = [(i, f"document body number {i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for part in range(3):
        df.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    out = split_corpus(
        hash_sample(stream, 0.5), {"train": 0.8, "val": 0.2}
    )
    q = out.writeStream.format("memory").queryName(
        "stream_sampled"
    ).outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["split"])
        for r in spark.table("stream_sampled").collect()
    }
    want = {
        (r["doc_id"], r["split"])
        for r in split_corpus(
            hash_sample(df, 0.5), {"train": 0.8, "val": 0.2}
        ).collect()
    }
    assert got == want and len(got) > 0
