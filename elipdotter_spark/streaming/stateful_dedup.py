"""Stateful streaming deduplication — a custom stateful operator on
``applyInPandasWithState``.

A training-data ingest stream must drop re-crawled duplicates *across*
micro-batches, which no stateless transformation can do: the "have I seen
this content before" bit is per-key state that outlives any batch.  The
operator keys the stream by content hash and keeps one boolean per hash in
the state store; the first document carrying a hash is emitted, every later
one (same batch or any later batch) is dropped.  State lives in the
checkpoint, so a restarted stream keeps its memory of what it already let
through.

At scale the state store is partitioned by the group key (content hash) —
the same hash-partitioning as the shuffle that feeds it, so lookups are
local; RocksDB state backend handles stores larger than executor memory."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "h string, doc_id long"
STATE_SCHEMA = "seen boolean"


def _emit_first(key, pdfs, state: GroupState):
    """Group function: emit the lowest-doc_id row the first time this
    content hash is seen; nothing afterwards."""
    if state.exists:
        for _ in pdfs:  # drain (required by the contract)
            pass
        return
    best = None
    for pdf in pdfs:
        if len(pdf):
            cand = int(pdf["doc_id"].min())
            best = cand if best is None else min(best, cand)
    state.update((True,))
    if best is not None:
        yield pd.DataFrame({"h": [key[0]], "doc_id": [best]})


def first_occurrences(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """(h, doc_id) — one row per distinct content hash, emitted on first
    sight; duplicates in the same or any later micro-batch are dropped."""
    hashed = stream.select(
        F.md5(F.col(text_col).cast("binary")).alias("h"), F.col("doc_id")
    )
    return hashed.groupBy("h").applyInPandasWithState(
        _emit_first,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_streaming_dedup(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "doc_id long, text string",
    available_now: bool = True,
):
    """File-source stream -> stateful first-occurrence dedup -> parquet via
    foreachBatch (checkpoint-recoverable, unlike the memory sink; in
    production the batch function is the index-ingest write_segment)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    dedup = first_occurrences(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a replayed micro-batch must not
        # append twice, so each batch overwrites ITS OWN partition directory
        # (idempotent; readers see output_dir as batch-partitioned parquet)
        if not batch_df.isEmpty():
            batch_df.write.mode("overwrite").parquet(
                f"{output_dir}/batch={batch_id}"
            )

    writer = (
        dedup.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
