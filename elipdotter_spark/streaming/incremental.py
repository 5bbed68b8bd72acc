"""Incremental index ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10 — synchronous ``insert`` /
``ingest`` calls); this module is the Spark-native *extension*: a file-source
stream of new documents is folded into the index as posting segments, one per
micro-batch, through the same :class:`~elipdotter_spark.sources.catalog.IndexStore`
ledger used by batch builds (so a streaming ingest is resumable and metered
exactly like a batch one — the streaming checkpoint handles source progress,
the ledger handles segment lineage).

Semantics match ``Lossless::ingest`` (src/index.rs:1049-1064): new docs'
postings are unioned in; re-ingested docs would be merged by S8
(``index_build.merge_postings``) at publish time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import IndexStore


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    store: IndexStore,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    available_now: bool = True,
):
    """Stream parquet files from ``input_dir`` into index segments.

    Each micro-batch becomes one ledger-tracked segment
    (``stream-<batch_id>``); ``availableNow`` drains the backlog and stops
    (the batch-incremental mode); pass False for a continuous ingest."""
    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.write_segment(f"stream-{batch_id:06d}", batch_df)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
