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

from ..sources.catalog import IndexStore, content_digest


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    store: IndexStore,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    available_now: bool = True,
    auto_compact_superseded: float = None,
    segment_prefix: str = "stream",
):
    """Stream parquet files from ``input_dir`` into index segments.

    ``segment_prefix`` names the ingest EPOCH: batch ids restart at 0 for
    every fresh checkpoint lineage, so a second epoch against the same
    store (new source dir + new checkpoint) must use a distinct prefix or
    its batch 0 collides with the first epoch's committed segment and the
    content-digest guard (correctly) refuses.

    Each micro-batch becomes one ledger-tracked segment
    (``stream-<batch_id>``); ``availableNow`` drains the backlog and stops
    (the batch-incremental mode); pass False for a continuous ingest.

    ``auto_compact_superseded``: when set, each batch ends with
    ``store.maybe_compact(threshold)`` so continuous re-ingest keeps the
    store physically bounded.  A batch REPLAYED after a compaction (its
    stream segment id no longer in the ledger) re-ingests its docs as
    updates — latest-wins keeps query results identical, at the cost of
    one extra superseded version until the next compaction."""
    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg_id = f"{segment_prefix}-{batch_id:06d}"
        _commit_segment(store, seg_id, batch_df, auto_compact_superseded)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _commit_segment(
    store: IndexStore,
    seg_id: str,
    batch_df: DataFrame,
    auto_compact_superseded: float = None,
) -> None:
    """Idempotently commit one micro-batch as a ledger segment (the shared
    foreachBatch tail of every streaming ingest variant): true replays are
    skipped by content digest, cross-checkpoint batch-id collisions fail
    loudly, then write-ahead segment commit + optional auto-compaction."""
    if _segment_disposition(store, seg_id, batch_df) == "skip":
        return
    store.write_segment(seg_id, batch_df)
    if auto_compact_superseded is not None:
        store.maybe_compact(auto_compact_superseded)


def _segment_disposition(store: IndexStore, seg_id: str, batch_df: DataFrame) -> str:
    """"skip" for a true checkpoint replay (identical content already
    committed), "write" for a new segment; raises on a cross-checkpoint
    batch-id collision.  Split from :func:`_commit_segment` so sinks with
    side-writes (dead letter, docmap) can run the collision check FIRST —
    otherwise a collision raises only after the batch dirs were already
    overwritten with the rejected batch's content (ADVICE r6)."""
    committed_row = next(
        (r for r in store.ledger() if r["segment_id"] == seg_id), None
    )
    if committed_row is not None:
        # foreachBatch may REPLAY a batch after a restart (the
        # checkpoint advances after the sink returns) — the same id
        # carries the same rows WITHIN one checkpoint lineage, so the
        # committed segment is already correct and we skip.  But a
        # batch id can also COLLIDE across checkpoints (wiped/fresh
        # checkpoint dir against the same store): silently skipping
        # would drop whatever the new batch 0 carries beyond the old
        # one — including the SAME doc ids with UPDATED text.
        # Distinguish by CONTENT, compared as one scalar row per side
        # (never a driver-side collect of row sets): the ledger records
        # the committed batch's (count, order-insensitive xxhash64-xor)
        # over all input columns; recompute the same over the incoming
        # batch.  Equal -> true replay, skip; different -> fail loudly.
        if committed_row.get("doc_digest") is not None:
            n, h = content_digest(batch_df)
            if (
                n == committed_row["n_docs"]
                and h == committed_row["doc_digest"]
            ):
                return "skip"  # idempotent replay (identical content)
        else:
            # legacy segment committed before digests were recorded:
            # the raw text is gone, so compare the strongest thing both
            # sides still share — the distinct doc-id digest (still
            # in-plan, one row per side; misses same-id text edits,
            # which post-legacy segments catch above)
            committed_ids = (
                store.spark.read.parquet(store.segment_path(seg_id))
                .select("doc_id")
                .distinct()
            )
            if content_digest(committed_ids) == content_digest(
                batch_df.select("doc_id").distinct()
            ):
                return "skip"  # idempotent replay (same doc-id set)
        raise ValueError(
            f"segment {seg_id!r} already committed with DIFFERENT "
            "content — batch-id collision across checkpoints "
            "(fresh/wiped checkpoint dir against an existing store?). "
            "Use a new store, a distinct segment_prefix per ingest "
            "epoch, or compact() and re-ingest."
        )
    return "write"


# the BASELINE input_hint pages shape (url, warc_ts, html[, text, lang]);
# doc_id here is the CRAWL RECORD id, not the index identity
PAGES_SCHEMA = "doc_id long, url string, warc_ts timestamp, html string"


def start_crawl_ingest(
    spark: SparkSession,
    input_dir: str,
    store: IndexStore,
    checkpoint_dir: str,
    schema: str = PAGES_SCHEMA,
    available_now: bool = True,
    auto_compact_superseded: float = None,
    segment_prefix: str = "crawl",
    dead_letter_dir: str = None,
    docmap_dir: str = None,
):
    """Streaming WEB-CRAWL front door: a file-source stream of raw pages
    (``PAGES_SCHEMA``) is extracted and folded into the index, one segment
    per micro-batch — the streaming twin of ``cli build --format pages``.

    Per batch: recrawl latest-wins collapse + HTML->text extraction
    (``html.crawl_ingest`` — the gated battery), markup-leftover rows
    routed to ``dead_letter_dir/batch-<id>`` (overwrite: replay-idempotent),
    then the index identity switch: **doc_id = xxhash64(norm_url)**
    (``index_build.docmap_hashed`` convention).  A page re-crawled in a
    LATER batch hashes to the same doc_id, so the new segment's higher seq
    makes it an UPDATE under the store's latest-wins resolution — exactly
    the reference's delete + re-digest semantics (S7/S8), no special
    recrawl machinery.

    Ordering contract: within a batch the newest ``warc_ts`` wins; across
    batches INGEST order (segment seq) wins — feed files in crawl order
    (an out-of-order feed would resurrect an older snapshot, the same
    contract as the reference's synchronous ingest).  The replay digest is
    computed on the TRANSFORMED docs, a deterministic function of the
    batch, so checkpoint replays stay idempotent."""
    from pyspark.sql import functions as F

    from ..operators import html as html_ops

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark import StorageLevel

        # ONE extraction per batch: every consumer below (collision
        # digest, dead-letter write, docmap write, emptiness check,
        # segment write) used to re-execute the full recrawl-collapse +
        # HTML-extraction lineage — up to 5x per micro-batch (ADVICE r6)
        ing = html_ops.crawl_ingest(batch_df).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            docs = ing.filter(~F.col("has_markup")).select(
                F.xxhash64(F.col("norm_url")).alias("doc_id"),
                F.col("text_clean").alias("text"),
            )
            seg_id = f"{segment_prefix}-{batch_id:06d}"
            # collision check BEFORE the side-writes: a cross-checkpoint
            # batch-id collision must raise with the committed batch's
            # dead-letter/docmap dirs intact, not after overwriting them
            # with the rejected batch's content
            disposition = (
                "skip"
                if docs.isEmpty()
                else _segment_disposition(store, seg_id, docs)
            )
            if dead_letter_dir is not None:
                (
                    ing.filter(F.col("has_markup"))
                    .select("doc_id", "url", "norm_url")
                    .write.mode("overwrite")
                    .parquet(f"{dead_letter_dir}/batch-{batch_id:06d}")
                )
            if docmap_dir is not None:
                # id <-> url map for the query side (site: filter, URL
                # resolution); per-batch overwrite = replay-idempotent.
                # Readers take the LATEST row per doc_id (recrawled pages
                # re-emit the same hashed id, possibly with a new raw url).
                from ..operators import urls as url_ops

                (
                    url_ops.parse_urls(
                        ing.filter(~F.col("has_markup")).select("url"),
                        url_col="url",
                    )
                    .select(
                        F.xxhash64(F.col("norm_url")).alias("doc_id"),
                        "url", "norm_url", "host", "registered_domain",
                    )
                    .write.mode("overwrite")
                    .parquet(f"{docmap_dir}/batch-{batch_id:06d}")
                )
            if disposition == "write":
                store.write_segment(seg_id, docs)
                if auto_compact_superseded is not None:
                    store.maybe_compact(auto_compact_superseded)
        finally:
            ing.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
