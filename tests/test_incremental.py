"""Incremental dedup: appended near-dup conversations must link to their
existing originals without re-sketching the corpus; streaming wrapper runs
the same path via foreachBatch."""

import pyspark.sql.functions as F
import pytest

from dedup.generate import make_corpus, misspell
from dedup.incremental import incremental_dedup
from dedup.operators.assemble import assemble_conversations
from dedup.operators.candidates import prepare_docs


def test_incremental_links_new_to_existing(spark, config):
    corpus = make_corpus(n_conversations=40, dup_fraction=0.0, seed=55)
    src = spark.createDataFrame(corpus.transcripts)
    existing = prepare_docs(
        assemble_conversations(src, config), "conv_id", "doc_text", config
    ).cache()
    existing.count()

    # new batch: near-dup copies of two existing conversations + one novel
    import random

    rng = random.Random(9)
    base = corpus.transcripts[corpus.transcripts.conv_id.isin(["c0000003", "c0000007"])]
    newbie = base.copy()
    newbie["conv_id"] = "x" + newbie["conv_id"]
    newbie["text"] = [misspell(rng, t) for t in newbie["text"]]
    novel = corpus.transcripts[corpus.transcripts.conv_id == "c0000001"].copy()
    novel["conv_id"] = "znovel"
    novel["text"] = ["completely different content about nothing shared"] * len(novel)
    batch = spark.createDataFrame(
        __import__("pandas").concat([newbie, novel], ignore_index=True)
    )

    res = incremental_dedup(batch, existing, config, broadcast_new=True)
    edges = {(r["id_a"], r["id_b"]) for r in res.verified_pairs.collect()}
    flat = {x for e in edges for x in e}
    assert {"xc0000003", "c0000003"} <= flat
    assert {"xc0000007", "c0000007"} <= flat
    assert ("c0000003", "xc0000003") in edges or ("xc0000003", "c0000003") in edges
    assert "znovel" not in flat
    assert res.new_prepared.count() == 3


def test_streaming_dedup_available_now(spark, config, tmp_path):
    from dedup.streaming import read_transcript_stream, start_streaming_dedup

    corpus = make_corpus(n_conversations=25, dup_fraction=0.4, seed=77)
    # input_hint schema: turn_idx is int32
    src = spark.createDataFrame(corpus.transcripts).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    in_dir = str(tmp_path / "in")
    src.repartition(3).write.mode("overwrite").parquet(in_dir)

    wh = str(tmp_path / "wh")
    stream = read_transcript_stream(spark, in_dir, max_files_per_trigger=1)
    q = start_streaming_dedup(
        spark, stream, wh, config, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    corpus_prepared = spark.read.parquet(f"{wh}/corpus_prepared")
    assert corpus_prepared.count() > 0
    edges = spark.read.parquet(f"{wh}/stream_edges")
    # at least the exact duplicates planted in the corpus must surface
    assert edges.count() > 0


def test_incremental_reuses_postings_no_corpus_resketch(spark, config, monkeypatch):
    """O(batch) contract: with ``existing_bands`` provided, the band UDF
    never re-runs over the historical corpus -- _bands is invoked exactly
    once (new side only) -- and edges match the legacy recompute path."""
    import dedup.incremental as inc

    corpus = make_corpus(n_conversations=30, dup_fraction=0.0, seed=21)
    src = spark.createDataFrame(corpus.transcripts)
    existing = prepare_docs(
        assemble_conversations(src, config), "conv_id", "doc_text", config
    ).localCheckpoint()
    bands = inc._bands(existing, config).localCheckpoint()

    batch_pd = corpus.transcripts[corpus.transcripts.conv_id == "c0000005"].copy()
    batch_pd["conv_id"] = "xc0000005"  # exact dup of an existing conversation
    batch = spark.createDataFrame(batch_pd)

    legacy = inc.incremental_dedup(batch, existing, config)
    legacy_edges = {(r["id_a"], r["id_b"]) for r in legacy.verified_pairs.collect()}

    calls = []
    orig = inc._bands

    def spy(prepared, cfg):
        calls.append(prepared)
        return orig(prepared, cfg)

    monkeypatch.setattr(inc, "_bands", spy)
    res = inc.incremental_dedup(batch, existing, config, existing_bands=bands)
    edges = {(r["id_a"], r["id_b"]) for r in res.verified_pairs.collect()}
    assert len(calls) == 1, "historical corpus must not be re-banded"
    assert edges == legacy_edges
    assert ("c0000005", "xc0000005") in edges
    # new_bands covers exactly the new docs, one posting per LSH band
    assert res.new_bands.count() == config.lsh_bands * res.new_prepared.count()


def test_streaming_maintains_bands_table(spark, config, tmp_path):
    """The warehouse keeps an append-only corpus_bands postings table in
    lockstep with corpus_prepared (lsh_bands postings per doc)."""
    from dedup.streaming import read_transcript_stream, start_streaming_dedup

    corpus = make_corpus(n_conversations=12, dup_fraction=0.3, seed=99)
    src = spark.createDataFrame(corpus.transcripts).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    in_dir = str(tmp_path / "in")
    # repartition BY conv_id: a conversation split across micro-batches
    # assembles per-batch partial docs (the availableNow file source has no
    # conversation boundary awareness) -- keep each conv in one batch here
    src.repartition(2, "conv_id").write.mode("overwrite").parquet(in_dir)

    wh = str(tmp_path / "wh")
    stream = read_transcript_stream(spark, in_dir, max_files_per_trigger=1)
    q = start_streaming_dedup(
        spark, stream, wh, config, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    n_docs = spark.read.parquet(f"{wh}/corpus_prepared").count()
    n_bands = spark.read.parquet(f"{wh}/corpus_bands").count()
    # make_corpus plants near-dup variant conversations beyond the base 12
    assert n_docs == corpus.transcripts.conv_id.nunique()
    assert n_bands == config.lsh_bands * n_docs


def test_streaming_cross_batch_conversation_assembly(spark, config, tmp_path):
    """A conversation whose turns ARRIVE SPLIT across two micro-batches must
    end up identical to the single-batch run: the re-seen batch re-assembles
    the full turn set, supersedes the partial doc (latest-batch-wins view),
    and re-verifies its edges (r2 verdict item 3 -- this replaces the old
    'partition input by conv_id' dodge)."""
    import os
    import shutil
    import time

    from dedup.streaming import (
        corpus_prepared_view,
        read_transcript_stream,
        start_streaming_dedup,
        stream_edges_view,
    )

    corpus = make_corpus(n_conversations=12, dup_fraction=0.4, seed=101)
    src = spark.createDataFrame(corpus.transcripts).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    # choose a conversation with >= 4 turns and split its turns in half
    counts = corpus.transcripts.groupby("conv_id").size()
    split_conv = sorted(counts[counts >= 4].index)[0]
    half = int(counts[split_conv]) // 2
    part1 = src.filter(
        (F.col("conv_id") != split_conv) | (F.col("turn_idx") < half)
    )
    part2 = src.filter(
        (F.col("conv_id") == split_conv) & (F.col("turn_idx") >= half)
    )

    def _write_single_file(df, in_dir, name, mtime):
        staging = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        os.makedirs(in_dir, exist_ok=True)
        part = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
        dst = os.path.join(in_dir, name)
        shutil.move(os.path.join(staging, part), dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    in_split = str(tmp_path / "in_split")
    _write_single_file(part1, in_split, "a.parquet", now - 120)
    _write_single_file(part2, in_split, "b.parquet", now)
    in_ref = str(tmp_path / "in_ref")
    _write_single_file(src, in_ref, "all.parquet", now)

    wh_split, wh_ref = str(tmp_path / "wh_split"), str(tmp_path / "wh_ref")
    for in_dir, wh, per_trigger in ((in_split, wh_split, 1), (in_ref, wh_ref, 2)):
        q = start_streaming_dedup(
            spark,
            read_transcript_stream(spark, in_dir, max_files_per_trigger=per_trigger),
            wh,
            config,
            checkpoint_dir=str(tmp_path / f"ckpt_{os.path.basename(wh)}"),
        )
        q.awaitTermination(300)

    # the scenario really happened: the split conv has a superseded row
    raw = spark.read.parquet(f"{wh_split}/corpus_prepared")
    assert raw.filter(F.col("doc_id") == split_conv).count() == 2

    # latest-wins corpus view matches the single-batch run exactly
    v_split = {
        (r["doc_id"], r["norm_text"])
        for r in corpus_prepared_view(spark, wh_split).collect()
    }
    v_ref = {
        (r["doc_id"], r["norm_text"])
        for r in corpus_prepared_view(spark, wh_ref).collect()
    }
    assert v_split == v_ref

    # current-edge view matches the single-batch edge set
    e_split = {
        (r["id_a"], r["id_b"]) for r in stream_edges_view(spark, wh_split).collect()
    }
    e_ref = {
        (r["id_a"], r["id_b"]) for r in stream_edges_view(spark, wh_ref).collect()
    }
    assert e_split == e_ref
