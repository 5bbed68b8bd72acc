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
