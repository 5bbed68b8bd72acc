"""WARC source/sink (sources/warc.py): framing fixtures, dead-letter
resync, Spark file roundtrip, pages minting, CLI pack/unpack/build.

The pure-Python fixture tests pin the READER independently of the writer
(hand-built byte streams, including Common-Crawl-shaped quirks: gzip
members, warcinfo/request records, chunked bodies, truncation); the
roundtrip tests then pin writer+reader together.  The cross-engine gate
``web_warc_roundtrip`` (test_entry_contract) covers the synthesis battery.
"""

import gzip
import json

import pytest

from elipdotter_spark.sources import warc as W

URL = "https://a.example/x"
EPOCH = 1700000000


def _resp(url=URL, epoch=EPOCH, html=b"<html>hi</html>", **kw):
    return W.encode_response_record(url, epoch, html, **kw)


# ---------------------------------------------------------------------------
# pure-Python framing (no Spark)
# ---------------------------------------------------------------------------

def test_parse_single_response():
    rows = list(W.parse_warc_stream(_resp(), src="s"))
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_type"] == "response"
    assert r["url"] == URL
    assert int(r["warc_ts"].timestamp()) == EPOCH
    assert r["http_status"] == 200
    assert r["mime"] == "text/html"
    assert r["html"] == b"<html>hi</html>"
    assert r["error"] is None


def test_parse_multi_record_with_warcinfo():
    stream = (
        W.encode_warcinfo("f.warc.gz")
        + _resp()
        + _resp(url="https://b.example/y", epoch=EPOCH + 60, html=b"two")
    )
    rows = list(W.parse_warc_stream(stream))
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response", "response"]
    assert [r["rec_index"] for r in rows] == [0, 1, 2]
    assert rows[2]["html"] == b"two"


def test_parse_gzip_members_equals_plain():
    recs = [W.encode_warcinfo("f"), _resp(), _resp(url="https://b.example/")]
    plain = list(W.parse_warc_stream(b"".join(recs)))
    gz = list(W.parse_warc_stream(b"".join(W.gzip_member(r) for r in recs)))
    assert [(r["url"], r["html"], r["error"]) for r in gz] == [
        (r["url"], r["html"], r["error"]) for r in plain
    ]


def test_parse_single_gzip_stream():
    # whole-stream gzip (non-member layout) also decompresses
    rows = list(W.parse_warc_stream(gzip.compress(_resp() + _resp())))
    assert len(rows) == 2 and all(r["error"] is None for r in rows)


def test_non_ascii_and_empty_body():
    body = "Tést — page ✓".encode("utf-8")
    rows = list(W.parse_warc_stream(_resp(html=body) + _resp(html=b"")))
    assert rows[0]["html"] == body
    assert rows[1]["html"] == b""


def test_request_record_skipped_payload():
    http = b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n"
    head = (
        "WARC/1.0\r\nWARC-Type: request\r\n"
        f"WARC-Target-URI: {URL}\r\n"
        "WARC-Date: 2023-11-14T22:13:20Z\r\n"
        "Content-Type: application/http; msgtype=request\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode() + http + b"\r\n\r\n"
    rows = list(W.parse_warc_stream(head + _resp()))
    assert rows[0]["warc_type"] == "request"
    assert rows[0]["html"] is None and rows[0]["error"] is None
    assert rows[1]["warc_type"] == "response"


def test_chunked_body_dechunked():
    body = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + body
    )
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {URL}\r\nWARC-Date: 2023-11-14T22:13:20Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode() + http + b"\r\n\r\n"
    rows = list(W.parse_warc_stream(head))
    assert rows[0]["html"] == b"hello world" and rows[0]["error"] is None


def test_bad_chunked_dead_letters():
    http = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nx"
    )
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {URL}\r\nWARC-Date: 2023-11-14T22:13:20Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode() + http + b"\r\n\r\n"
    rows = list(W.parse_warc_stream(head + _resp()))
    assert rows[0]["error"] == "http_chunked: bad chunk size"
    assert rows[1]["error"] is None  # parser kept going


def test_truncated_payload_dead_letter():
    rows = list(W.parse_warc_stream(_resp()[:-20]))
    assert [r["error"] for r in rows] == ["truncated_payload"]


def test_truncated_header_dead_letter():
    rows = list(W.parse_warc_stream(b"WARC/1.0\r\nWARC-Type: resp"))
    assert [r["error"] for r in rows] == ["truncated_header"]


def test_missing_content_length_resyncs_to_next_record():
    bad = _resp().replace(b"Content-Length: ", b"X-Length: ", 1)
    rows = list(W.parse_warc_stream(bad + _resp(url="https://b.example/")))
    assert rows[0]["error"] == "missing_content_length"
    assert rows[1]["url"] == "https://b.example/" and rows[1]["error"] is None


def test_garbage_prefix_resyncs():
    rows = list(W.parse_warc_stream(b"not a warc\r\n" + _resp()))
    assert rows[0]["error"] == "bad_magic"
    assert rows[1]["error"] is None and rows[1]["url"] == URL


def test_http_without_header_end_dead_letters():
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"  # no \r\n\r\n
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {URL}\r\nWARC-Date: 2023-11-14T22:13:20Z\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode() + http + b"\r\n\r\n"
    rows = list(W.parse_warc_stream(head))
    assert rows[0]["error"] == "http_missing_header_end"


def test_encode_deterministic():
    assert _resp() == _resp()
    assert W.gzip_member(_resp()) == W.gzip_member(_resp())
    # distinct content -> distinct record ids
    a = _resp()
    b = _resp(epoch=EPOCH + 1)
    ida = [l for l in a.split(b"\r\n") if l.startswith(b"WARC-Record-ID")]
    idb = [l for l in b.split(b"\r\n") if l.startswith(b"WARC-Record-ID")]
    assert ida != idb


def test_warc_date_roundtrip():
    s = W.format_warc_date(EPOCH)
    assert s == "2023-11-14T22:13:20Z"
    dt = W.parse_warc_date(s)
    assert int(dt.timestamp()) == EPOCH
    assert W.parse_warc_date("2023-11-14T22:13:20.123456Z") is not None
    assert W.parse_warc_date("yesterday") is None


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

@pytest.fixture()
def cli(spark, monkeypatch):
    import elipdotter_spark.cli as cli_mod

    monkeypatch.setattr(cli_mod, "get_spark", lambda: spark)
    return cli_mod


@pytest.fixture()
def synth_pages(spark, sf_dir):
    from elipdotter_spark.operators import html as H

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(60)
    )
    return H.synth_crawl_pages(docs)


@pytest.mark.spark
def test_write_read_roundtrip_files(spark, synth_pages, tmp_path):
    from pyspark.sql import functions as F

    d = str(tmp_path / "shards")
    n = W.write_warc(synth_pages.repartition(3), d)
    assert n == 3
    recs = W.read_warc(spark, d)
    pages, dead = W.warc_pages(recs)
    assert dead.count() == 0
    key = lambda df: sorted(
        df.select(
            "url", F.unix_timestamp("warc_ts").alias("e"),
            F.md5("html").alias("h"),
        ).collect()
    )
    assert key(pages) == key(synth_pages)
    # provenance: every page row names its shard + record index
    src = pages.select("src").distinct().count()
    assert src == 3
    # hashed web-scale ids, no collisions at this size
    assert pages.select("doc_id").distinct().count() == pages.count()


@pytest.mark.spark
def test_read_warc_routes_corrupt_shard_rows(spark, synth_pages, tmp_path):
    import os

    d = str(tmp_path / "shards")
    W.write_warc(synth_pages.repartition(1), d, compress=False)
    shard = os.path.join(d, "part-00000.warc")
    with open(shard, "rb") as f:
        data = f.read()
    # truncate mid-record: all complete records survive, one error row
    with open(shard, "wb") as f:
        f.write(data[: len(data) - 40])
    recs = W.read_warc(spark, d)
    pages, dead = W.warc_pages(recs)
    assert dead.count() == 1
    assert dead.first()["error"] == "truncated_payload"
    assert pages.count() == 59


@pytest.mark.spark
def test_uncompressed_shards(spark, synth_pages, tmp_path):
    d = str(tmp_path / "plain")
    W.write_warc(synth_pages.repartition(2), d, compress=False, warcinfo=False)
    recs = W.read_warc(spark, d)
    assert recs.filter("warc_type = 'warcinfo'").count() == 0
    assert recs.filter("error is null").count() == 60


@pytest.mark.spark
def test_cli_warc_pack_unpack_build(cli, spark, synth_pages, tmp_path, capsys):
    pages_in = str(tmp_path / "pages")
    shards = str(tmp_path / "shards")
    pages_out = str(tmp_path / "pages_out")
    dead = str(tmp_path / "dead")
    idx = str(tmp_path / "idx")
    synth_pages.write.parquet(pages_in)

    assert cli.main([
        "warc", "pack", "--input", pages_in, "--output", shards,
        "--shards", "2",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_shards"] == 2

    assert cli.main([
        "warc", "unpack", "--input", shards, "--output", pages_out,
        "--dead-letter", dead,
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_pages"] == 60 and out["n_dead"] == 0
    assert out["by_type"] == {"response": 60, "warcinfo": 2}
    assert spark.read.parquet(pages_out).count() == 60

    # build an index straight from the shards (front door composition)
    assert cli.main([
        "build", "--input", shards, "--output", idx, "--segments", "2",
        "--format", "warc",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_warc_dead"] == 0
    assert cli.main([
        "query", "--index", idx, "--query", "table value", "--k", "3",
        "--algo", "exact",
    ]) == 0
