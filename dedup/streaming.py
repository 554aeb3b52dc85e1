"""Structured Streaming wrapper: continuous dedup of arriving transcripts.

The reference is strictly batch (CSV in -> CSV out, SURVEY.md par.2.11);
this module is the engine's streaming extension: ``readStream`` over a
directory (or any streaming source) of transcript rows, and per micro-batch
``foreachBatch`` runs the *incremental* dedup (dedup/incremental.py) against
the corpus state accumulated so far, appending verified edges and the new
sketches to the warehouse.

Why foreachBatch and not a stateful streaming agg: LSH dedup needs joins
against the full historical corpus (unbounded state, keyed by band hash);
``applyInPandasWithState`` state must fit per-key in memory and cannot be
re-joined -- the checkpointed corpus table IS the right state store, and
foreachBatch gives exactly-once appends against it (sink-side idempotence
via batch-id subdirectories).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from dedup.config import DedupConfig, DEFAULT_CONFIG
from dedup.incremental import incremental_dedup

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_streaming_dedup(
    spark: SparkSession,
    stream: DataFrame,
    warehouse: str,
    config: DedupConfig = DEFAULT_CONFIG,
    checkpoint_dir: str | None = None,
):
    """Start the continuous dedup query. Warehouse layout:
      <warehouse>/corpus_prepared/batch=<id>/   (append-only sketches)
      <warehouse>/stream_edges/batch=<id>/      (verified dup edges)
    Batch-id directories make retried micro-batches idempotent (a retry
    overwrites its own directory, never duplicates)."""
    corpus_dir = os.path.join(warehouse, "corpus_prepared")
    edges_dir = os.path.join(warehouse, "stream_edges")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prepared_cols = ["doc_id", "norm_text", "gram_hashes", "minhash", "simhash"]
        try:
            # select the canonical columns: the batch=<id> directory level is
            # inferred as a partition column on read and must not ride along
            existing = spark.read.parquet(corpus_dir).select(*prepared_cols)
        except Exception:  # first batch: empty corpus
            existing = None
        if existing is not None and existing.rdd.isEmpty():
            existing = None
        if existing is None:
            from dedup.operators.assemble import assemble_conversations
            from dedup.operators.candidates import candidate_pairs, prepare_docs
            from dedup.operators.verify import verify_pairs

            prepared = prepare_docs(
                assemble_conversations(batch_df, config), "conv_id", "doc_text", config
            )
            verified = verify_pairs(candidate_pairs(prepared, config).pairs, prepared, config)
            new_prepared = prepared
        else:
            res = incremental_dedup(batch_df, existing, config)
            new_prepared, verified = res.new_prepared, res.verified_pairs
        new_prepared.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
        verified.write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"batch={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(process_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
