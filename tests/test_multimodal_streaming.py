"""Multimodal plumbing + streaming incremental ingest."""

import os

import pytest

from elipdotter_spark.operators import index_build, multimodal
from elipdotter_spark.sources.catalog import IndexStore
from elipdotter_spark.streaming import incremental


@pytest.mark.spark
def test_multimodal_metadata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    payloads = multimodal.synth_payloads(docs, "image")
    meta = multimodal.extract_metadata(payloads)
    rows = meta.collect()
    assert len(rows) == 50
    by_id = {r.doc_id: r for r in rows}
    src = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, r in by_id.items():
        n = len(src[doc_id].encode("utf-8"))
        assert r.n_bytes == n
        assert r.width == n % 640 + 1
        assert r.modality == "image"
        assert len(r.feature) == 8


@pytest.mark.spark
def test_multimodal_real_decode_stubbed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    payloads = multimodal.synth_payloads(docs, "video")
    if multimodal.decode_available("video"):
        pytest.skip("real decoder present")
    with pytest.raises(Exception, match="NotImplementedError|PyAV|real video"):
        multimodal.extract_metadata(payloads, use_real_decoder=True).collect()


@pytest.mark.spark
def test_frame_sampling(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    payloads = multimodal.synth_payloads(docs, "video")
    frames = multimodal.frame_sample(payloads, every_nth=2).collect()
    assert all(r.frame_idx % 2 == 0 for r in frames)
    assert len(frames) > 0


@pytest.mark.spark
def test_streaming_incremental_ingest(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).cache()
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")
    store = IndexStore(spark, str(tmp_path / "idx"))

    # batch 1 arrives
    docs.filter("doc_id < 50").write.parquet(os.path.join(in_dir, "b1"))
    q = incremental.start_ingest(spark, in_dir + "/*", store, ckpt)
    q.awaitTermination(120)
    n1 = len(store.completed_segments())
    assert n1 >= 1

    # batch 2 arrives later; stream resumes from its checkpoint
    docs.filter("doc_id >= 50").write.parquet(os.path.join(in_dir, "b2"))
    q = incremental.start_ingest(spark, in_dir + "/*", store, ckpt)
    q.awaitTermination(120)
    assert len(store.completed_segments()) > n1

    got = {
        (r.term, r.doc_id): list(r.positions) for r in store.postings().collect()
    }
    want = {
        (r.term, r.doc_id): list(r.positions)
        for r in index_build.build_postings(docs).collect()
    }
    assert got == want


@pytest.mark.spark
def test_streaming_update_replaces_stale_terms(spark, tmp_path):
    """Doc update path (VERDICT r1 #9): re-ingesting a changed doc through
    the stream supersedes its old postings — stale terms disappear from
    query results; compact() physically rewrites to the same state."""
    from pyspark.sql import functions as F

    from elipdotter_spark.plans.compiler import QueryEngine
    from elipdotter_spark.core.parser import parse

    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")
    store = IndexStore(spark, str(tmp_path / "idx"))

    v1 = spark.createDataFrame(
        [(0, "alpha obsolete words here"), (1, "beta stays put")],
        "doc_id long, text string",
    )
    v1.write.parquet(os.path.join(in_dir, "b1"))
    incremental.start_ingest(spark, in_dir + "/*", store, ckpt).awaitTermination(120)

    # doc 0 is edited: 'obsolete' removed, 'fresh' added; re-ingested
    v2 = spark.createDataFrame(
        [(0, "alpha fresh words here")], "doc_id long, text string"
    )
    v2.write.parquet(os.path.join(in_dir, "b2"))
    incremental.start_ingest(spark, in_dir + "/*", store, ckpt).awaitTermination(120)

    def doc_set(postings, word):
        terms = index_build.build_terms(postings)
        eng = QueryEngine(spark, postings, terms, proximity_threshold=1.0, algo="exact")
        return {r.doc_id for r in eng.doc_ids(parse(word)).collect()}

    merged = store.merged_postings().cache()
    assert doc_set(merged, "obsolete") == set()          # stale term gone
    assert doc_set(merged, "fresh") == {0}               # new term present
    assert doc_set(merged, "alpha") == {0}               # kept term: one version
    assert doc_set(merged, "beta") == {1}                # untouched doc intact
    # exactly one surviving version of doc 0's 'words' posting
    assert merged.filter((F.col("term") == "words") & (F.col("doc_id") == 0)).count() == 1

    # physical compaction: same query results, single segment
    store.compact()
    compacted = store.merged_postings()
    assert doc_set(compacted, "obsolete") == set()
    assert doc_set(compacted, "fresh") == {0}
    assert len(store.completed_segments()) == 1


@pytest.mark.spark
def test_stateful_streaming_dedup(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): duplicates are
    dropped across micro-batches AND across stream restarts (state lives in
    the checkpoint)."""
    from elipdotter_spark.streaming import stateful_dedup

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(10, "alpha text"), (11, "alpha text"), (12, "beta text")],
        "doc_id long, text string",
    )
    out_dir = str(tmp_path / "out")
    b1.write.parquet(os.path.join(in_dir, "b1"))
    q = stateful_dedup.start_streaming_dedup(spark, in_dir + "/*", ckpt, out_dir)
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {10, 12}, got1  # in-batch dup 11 dropped, lowest id wins

    # batch 2: doc 13 duplicates batch-1 content (cross-restart state),
    # doc 14 is new
    b2 = spark.createDataFrame(
        [(13, "alpha text"), (14, "gamma text")], "doc_id long, text string"
    )
    b2.write.parquet(os.path.join(in_dir, "b2"))
    q = stateful_dedup.start_streaming_dedup(spark, in_dir + "/*", ckpt, out_dir)
    q.awaitTermination(120)
    got2 = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {10, 12, 14}, got2  # 13 suppressed by checkpointed state


def test_bmp_wav_roundtrip_property():
    """Property: header decode inverts encode for arbitrary dimensions."""
    from hypothesis import given, settings, strategies as st

    from elipdotter_spark.operators.multimodal import (
        _real_decode, encode_bmp, encode_wav,
    )

    @given(st.integers(1, 300), st.integers(1, 200))
    @settings(max_examples=60, deadline=None)
    def check_bmp(w, h):
        m = _real_decode("image", encode_bmp(w, h))
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, 1)

    @given(st.integers(4000, 96000), st.integers(0, 2000))
    @settings(max_examples=60, deadline=None)
    def check_wav(sr, n):
        m = _real_decode("audio", encode_wav(sr, n))
        assert (m["sample_rate"], m["n_frames"]) == (sr, n)

    check_bmp()
    check_wav()


def test_real_decode_tier_boundary():
    """PNG/JPEG/MP3/MP4 now decode natively (full or metadata tier — see
    test_multimodal_compressed.py), so bare magic bytes are TRUNCATED
    payloads (ValueError -> dead-letter), while genuinely unknown formats
    still name the missing dependency (NotImplementedError)."""
    import pytest as _pytest

    from elipdotter_spark.operators.multimodal import _real_decode

    with _pytest.raises(ValueError):
        _real_decode("image", b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(ValueError):
        _real_decode("audio", b"ID3\x04")
    with _pytest.raises(NotImplementedError, match="Pillow"):
        _real_decode("image", b"GIF89a" + b"\x00" * 32)
    with _pytest.raises(NotImplementedError, match="soundfile"):
        _real_decode("audio", b"fLaC" + b"\x00" * 32)
    with _pytest.raises(NotImplementedError, match="PyAV"):
        _real_decode("video", b"\x1a\x45\xdf\xa3" + b"\x00" * 32)  # Matroska


@pytest.mark.spark
def test_real_decode_distributed(spark):
    """extract_metadata(use_real_decoder=True) over real BMP/WAV payloads:
    every row's metadata equals the synthesis arithmetic."""
    from elipdotter_spark.operators import multimodal

    media = multimodal.synth_real_media(spark, 200)
    meta = multimodal.extract_metadata(media, use_real_decoder=True)
    for r in meta.collect():
        i = r.doc_id
        if i % 2 == 0:
            assert (r.modality, r.width, r.height) == ("image", i % 63 + 1, (i // 63) % 47 + 1)
        else:
            assert (r.modality, r.sample_rate, r.n_frames) == ("audio", 8000 + (i % 8) * 1000, i % 500 + 1)


@pytest.mark.spark
def test_dead_letter_decode_channel(spark):
    """on_error='dead_letter': corrupt payloads become per-row errors with
    NULL metadata; good rows are untouched; default on_error='raise' still
    fails the task (a silent default change would hide corruption)."""
    from pyspark.sql import functions as F

    from elipdotter_spark.operators import multimodal

    media = multimodal.synth_real_media(spark, 60)
    corrupted = media.withColumn(
        "payload",
        F.when(F.col("doc_id") % 7 == 3, F.expr("substring(payload, 1, 16)"))
        .otherwise(F.col("payload")),
    )
    meta = multimodal.extract_metadata(
        corrupted, use_real_decoder=True, on_error="dead_letter"
    ).collect()
    assert len(meta) == 60  # every row survives
    bad = [r for r in meta if r.err is not None]
    good = [r for r in meta if r.err is None]
    assert {r.doc_id % 7 for r in bad} == {3}
    assert all(r.doc_id % 7 != 3 for r in good)
    for r in bad:
        assert r.n_bytes == 16
        assert r.width is None and r.n_frames is None and r.sample_rate is None
        assert "ValueError" in r.err
    # good rows decode exactly as the uncorrupted pipeline
    clean = {
        r.doc_id: (r.width, r.height, r.n_frames, r.sample_rate)
        for r in multimodal.extract_metadata(media, use_real_decoder=True).collect()
    }
    for r in good:
        assert clean[r.doc_id] == (r.width, r.height, r.n_frames, r.sample_rate)

    # the default stays loud
    with pytest.raises(Exception, match="corrupt|truncated"):
        multimodal.extract_metadata(corrupted, use_real_decoder=True).collect()
    with pytest.raises(ValueError, match="on_error"):
        multimodal.extract_metadata(corrupted, on_error="ignore")


@pytest.mark.spark
def test_streaming_sink_idempotent_on_replay(spark, tmp_path):
    """foreachBatch may REDELIVER a batch after a restart; with the
    committed-segment clobber guard in place the sink must SKIP an
    already-committed batch id, not raise and kill the stream."""
    from elipdotter_spark.sources.catalog import IndexStore
    from elipdotter_spark.streaming import incremental

    store = IndexStore(spark, str(tmp_path / "idx"))
    batch = spark.createDataFrame(
        [(1, "replayed words survive")], "doc_id long, text string"
    )
    # reach into the module the same way foreachBatch does: call start_ingest's
    # sink twice via a real (availableNow) stream + a manual replay
    src = tmp_path / "src"
    batch.write.parquet(str(src))
    q = incremental.start_ingest(
        spark, str(src), store, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    segs = store.completed_segments()
    assert len(segs) == 1 and segs[0].startswith("stream-")

    # simulate the replay: the sink closure isn't exported, so replay
    # through a fresh stream with a WIPED checkpoint — batch 0 redelivers
    # the SAME file set, the exact crash-replay shape (same doc set ->
    # idempotent skip; a different doc set would raise, tested below)
    from pyspark.sql import functions as F
    import shutil
    shutil.rmtree(str(tmp_path / "ckpt"))
    q2 = incremental.start_ingest(
        spark, str(src), store, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert store.completed_segments() == segs  # skipped, not duplicated/raised
    m = store.merged_postings()
    assert m.filter(F.col("term") == "replayed").count() == 1

    # batch-id COLLISION (not replay): new files land, checkpoint wiped ->
    # batch 0 now carries a DIFFERENT doc set; silently skipping would lose
    # docs, so the sink must fail loudly instead
    spark.createDataFrame(
        [(2, "new arrival after wipe")], "doc_id long, text string"
    ).write.mode("append").parquet(str(src))
    q3 = incremental.start_ingest(
        spark, str(src), store, str(tmp_path / "ckpt3")
    )
    try:
        q3.awaitTermination(120)
        raised = False
    except Exception as e:
        raised = "collision" in str(e) or "DIFFERENT doc set" in str(e)
    assert raised, "collision must fail loudly, not drop docs"
    assert store.completed_segments() == segs  # store untouched
