"""Structured Streaming wrapper: continuous dedup of arriving transcripts.

The reference is strictly batch (CSV in -> CSV out, SURVEY.md par.2.11);
this module is the engine's streaming extension: ``readStream`` over a
directory (or any streaming source) of transcript rows, and per micro-batch
``foreachBatch`` runs the *incremental* dedup (dedup/incremental.py) against
the corpus state accumulated so far, appending verified edges, the new
sketches, AND the new band postings to the warehouse.

Why foreachBatch and not a stateful streaming agg: LSH dedup needs joins
against the full historical corpus (unbounded state, keyed by band hash);
``applyInPandasWithState`` state must fit per-key in memory and cannot be
re-joined -- the checkpointed corpus table IS the right state store, and
foreachBatch gives exactly-once appends against it (sink-side idempotence
via batch-id subdirectories).

Per-batch cost is O(batch), not O(corpus): the historical corpus is only
ever touched through (a) the append-only ``corpus_bands`` postings table
(narrow 3-column scan, equi-joined on the micro-batch's band keys -- on a
real deployment an Iceberg table bucket-partitioned by band_hash, so the
join is storage-pruned) and (b) a broadcast semi-join fetching heavy
columns for the handful of docs that land in a candidate pair. No sketch
UDF ever re-runs over historical rows (dedup/incremental.py contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException

from dedup.config import DedupConfig, DEFAULT_CONFIG
from dedup.incremental import incremental_dedup

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

PREPARED_COLS = ["doc_id", "norm_text", "gram_hashes", "minhash", "simhash"]
BAND_COLS = ["doc_id", "band_idx", "band_hash"]


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _read_state(spark: SparkSession, path: str, cols: list[str]) -> DataFrame | None:
    """Read an append-only batch-directory state table; None only when the
    table genuinely does not exist yet (first batch). Any OTHER failure
    (corrupt file from a crashed write, permission error) propagates so the
    stream fails loudly instead of silently deduping against nothing."""
    if not os.path.isdir(path):
        return None
    try:
        # select the canonical columns: the batch=<id> directory level is
        # inferred as a partition column on read and must not ride along
        df = spark.read.parquet(path).select(*cols)
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None  # directory exists but holds no committed batch yet
        raise
    return df


def start_streaming_dedup(
    spark: SparkSession,
    stream: DataFrame,
    warehouse: str,
    config: DedupConfig = DEFAULT_CONFIG,
    checkpoint_dir: str | None = None,
):
    """Start the continuous dedup query. Warehouse layout:
      <warehouse>/corpus_prepared/batch=<id>/   (append-only sketches)
      <warehouse>/corpus_bands/batch=<id>/      (append-only band postings)
      <warehouse>/stream_edges/batch=<id>/      (verified dup edges)
      <warehouse>/stream_skew/batch=<id>/       (capped-band accounting)
    Batch-id directories make retried micro-batches idempotent (a retry
    overwrites its own directory, never duplicates)."""
    corpus_dir = os.path.join(warehouse, "corpus_prepared")
    bands_dir = os.path.join(warehouse, "corpus_bands")
    edges_dir = os.path.join(warehouse, "stream_edges")
    skew_dir = os.path.join(warehouse, "stream_skew")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        existing = _read_state(spark, corpus_dir, PREPARED_COLS)
        existing_bands = _read_state(spark, bands_dir, BAND_COLS)
        tracker: list[DataFrame] = []
        if existing is None:
            from dedup.incremental import _bands
            from dedup.operators.assemble import assemble_conversations
            from dedup.operators.candidates import candidate_pairs, prepare_docs
            from dedup.operators.verify import verify_pairs

            prepared = prepare_docs(
                assemble_conversations(batch_df, config), "conv_id", "doc_text", config
            ).localCheckpoint()
            tracker.append(prepared)
            res = candidate_pairs(prepared, config, tracker=tracker)
            verified = verify_pairs(res.pairs, prepared, config, tracker=tracker)
            new_prepared, new_bands, band_skew = prepared, _bands(prepared, config), res.band_skew
        else:
            res = incremental_dedup(
                batch_df,
                existing,
                config,
                existing_bands=existing_bands,
                tracker=tracker,
            )
            new_prepared, new_bands = res.new_prepared, res.new_bands
            verified, band_skew = res.verified_pairs, res.band_skew
        new_prepared.select(*PREPARED_COLS).write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
        new_bands.select(*BAND_COLS).write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch={batch_id}")
        )
        verified.write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"batch={batch_id}")
        )
        band_skew.write.mode("overwrite").parquet(
            os.path.join(skew_dir, f"batch={batch_id}")
        )
        for df in tracker:
            df.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
