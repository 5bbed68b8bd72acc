"""WARC (ISO 28500) file source + sink — the Common-Crawl on-disk format.

The BASELINE input_hint names an Iceberg table of ``(url, warc_ts,
html binary, text, lang)`` Common-Crawl-style pages; the raw material for
that table is WARC archives (Common Crawl publishes ~1 GB ``.warc.gz``
shards, one gzip MEMBER per record so readers can stream).  This module
closes the gap between "files on disk" and the pages table:

- :func:`read_warc`: ``binaryFile`` scan -> Arrow-batched ``mapInPandas``
  parser -> one row per WARC record with DEAD-LETTER routing (an
  ``error`` column; malformed records resync to the next record header
  and never kill the task — the JSONL / multimodal posture).
- :func:`warc_pages`: response records -> the input_hint pages shape,
  minting the web-scale hashed doc id (``index_build.docmap_hashed``
  semantics: ``xxhash64(url)`` — shuffle-free).
- :func:`write_warc`: pages -> ``.warc.gz`` shards, one file per
  partition, one gzip member per record (Common-Crawl layout), bytes
  deterministic (fixed gzip mtime, record ids derived from content).

Scale posture: WARC-gzip is NOT splittable without an external index, and
``binaryFile`` does not split files — parallelism is the shard count,
which is exactly how Common Crawl ships (tens of thousands of ~1 GB
shards per crawl).  Small shards group multiple-per-task via
``spark.sql.files.maxPartitionBytes``; the parser streams record-by-
record and holds one decompressed shard per task, so executor memory
sizes to the largest shard, not the dataset.

Framing spec implemented (public ISO 28500 + RFC 7230 subset):
  record  = "WARC/1.0" CRLF *(name ":" value CRLF) CRLF payload CRLF CRLF
  payload length = the mandatory ``Content-Length`` header (bytes);
  response records carry an HTTP/1.1 message (status line + headers +
  CRLF CRLF + body); ``Transfer-Encoding: chunked`` bodies are
  de-chunked; bodies are returned verbatim otherwise.  A record that
  violates the framing yields ONE error row and the parser resyncs at
  the next ``\\r\\nWARC/`` boundary.

The writer and parser share no framing code (the writer concatenates
literals, the parser state-machines over bytes), so the cross-engine
roundtrip gate ``web_warc_roundtrip`` (entry.py) — synth pages -> encode
-> multi-record stream -> parse -> fields, hash-compared against the
DuckDB synthesis — genuinely exercises both directions.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone
from typing import Iterable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

WARC_RECORD_SCHEMA = (
    "src string, rec_index long, warc_type string, url string, "
    "warc_ts timestamp, http_status int, mime string, html binary, "
    "error string"
)

# pages shape minted by warc_pages (input_hint + provenance columns)
WARC_PAGES_COLUMNS = ["doc_id", "url", "warc_ts", "html", "src", "rec_index"]


# ---------------------------------------------------------------------------
# record encoding (writer side)
# ---------------------------------------------------------------------------

def format_warc_date(epoch: int) -> str:
    """ISO 8601 Zulu, second precision — the WARC-Date grammar."""
    return datetime.fromtimestamp(int(epoch), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def parse_warc_date(value: str) -> Optional[datetime]:
    v = value.strip()
    # WARC-Date is ISO 8601 UTC; tolerate fractional seconds
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(v, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def encode_response_record(
    url: str, ts_epoch: int, html: bytes, status: int = 200,
    mime: str = "text/html",
) -> bytes:
    """One uncompressed WARC response record wrapping an HTTP/1.1 message.

    Deterministic: the record id is a UUID shaped from
    ``md5(url || ts)`` — no RNG, no clock — so re-exports are
    byte-identical (the export_snapshot discipline)."""
    if isinstance(html, str):  # pragma: no cover - convenience
        html = html.encode("utf-8")
    digest = hashlib.md5(
        url.encode("utf-8") + b"\x00" + str(int(ts_epoch)).encode()
    ).hexdigest()
    rec_id = (
        f"<urn:uuid:{digest[0:8]}-{digest[8:12]}-{digest[12:16]}"
        f"-{digest[16:20]}-{digest[20:32]}>"
    )
    http_head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {mime}; charset=UTF-8\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii")
    block = http_head + html
    warc_head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"WARC-Date: {format_warc_date(ts_epoch)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("utf-8")
    return warc_head + block + CRLF + CRLF


def encode_warcinfo(filename: str) -> bytes:
    """The leading warcinfo record Common-Crawl shards carry."""
    body = b"software: elipdotter-spark\r\nformat: WARC File Format 1.0\r\n"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Filename: {filename}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8")
    return head + body + CRLF + CRLF


def gzip_member(record: bytes, level: int = 6) -> bytes:
    """One record -> one deterministic gzip member (mtime pinned to 0 so
    identical inputs give identical shard bytes)."""
    buf = io.BytesIO()
    with gzip.GzipFile(
        filename="", mode="wb", fileobj=buf, mtime=0, compresslevel=level
    ) as gz:
        gz.write(record)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# record parsing (reader side)
# ---------------------------------------------------------------------------

def _decompress_if_gzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # gzip.decompress walks ALL members (Common Crawl: one per record)
        return gzip.decompress(data)
    return data


def _dechunk(body: bytes) -> bytes:
    """RFC 7230 chunked transfer decoding; raises ValueError on bad
    framing (the caller dead-letters)."""
    out = []
    pos = 0
    while True:
        nl = body.find(CRLF, pos)
        if nl < 0:
            raise ValueError("chunked: missing size line")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError("chunked: bad chunk size")
        pos = nl + 2
        if size == 0:
            return b"".join(out)
        if pos + size > len(body):
            raise ValueError("chunked: truncated chunk")
        out.append(body[pos : pos + size])
        pos += size
        if body[pos : pos + 2] != CRLF:
            raise ValueError("chunked: missing chunk CRLF")
        pos += 2


def _parse_http_response(block: bytes):
    """-> (status:int|None, mime:str, body:bytes, error:str|None)."""
    sep = block.find(_HDR_END)
    if sep < 0:
        return None, "", b"", "http_missing_header_end"
    head = block[:sep]
    body = block[sep + 4 :]
    lines = head.split(CRLF)
    status_line = lines[0].decode("latin-1", "replace")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        return None, "", b"", "http_bad_status_line"
    try:
        status = int(parts[1])
    except ValueError:
        return None, "", b"", "http_bad_status_line"
    mime = ""
    chunked = False
    for ln in lines[1:]:
        c = ln.find(b":")
        if c < 0:
            continue
        name = ln[:c].strip().lower()
        value = ln[c + 1 :].strip().decode("latin-1", "replace")
        if name == b"content-type":
            mime = value.split(";", 1)[0].strip().lower()
        elif name == b"transfer-encoding" and "chunked" in value.lower():
            chunked = True
    if chunked:
        try:
            body = _dechunk(body)
        except ValueError as exc:
            return status, mime, b"", f"http_{exc}"
    return status, mime, body, None


def _resync(data: bytes, pos: int) -> int:
    """Next plausible record start at/after pos (-1 = none)."""
    nxt = data.find(b"\r\nWARC/", pos)
    return -1 if nxt < 0 else nxt + 2


def parse_warc_stream(data: bytes, src: str = "") -> Iterator[dict]:
    """Yield one dict per WARC record (keys = WARC_RECORD_SCHEMA fields).

    Malformed records yield an ``error`` row and the parser RESYNCS at
    the next ``\\r\\nWARC/`` boundary — one bad record costs one row, not
    the shard (at 100 TB a truncated record per shard is routine)."""
    data = _decompress_if_gzip(data)
    pos = 0
    rec_index = 0

    def row(**kw) -> dict:
        base = {
            "src": src, "rec_index": rec_index, "warc_type": "",
            "url": "", "warc_ts": None, "http_status": None,
            "mime": "", "html": None, "error": None,
        }
        base.update(kw)
        return base

    n = len(data)
    while pos < n:
        # skip inter-record padding (trailing CRLFs)
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            yield row(error="bad_magic")
            rec_index += 1
            pos2 = _resync(data, pos)
            if pos2 < 0:
                return
            pos = pos2
            continue
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            yield row(error="truncated_header")
            return
        version_end = data.find(CRLF, pos)
        headers = {}
        for ln in data[version_end + 2 : hdr_end].split(CRLF):
            c = ln.find(b":")
            if c < 0:
                continue
            headers[ln[:c].strip().lower().decode("latin-1")] = (
                ln[c + 1 :].strip().decode("utf-8", "replace")
            )
        wtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        ts = parse_warc_date(headers.get("warc-date", ""))
        body_start = hdr_end + 4
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            yield row(warc_type=wtype, url=url, warc_ts=ts,
                      error="missing_content_length")
            rec_index += 1
            pos2 = _resync(data, body_start)
            if pos2 < 0:
                return
            pos = pos2
            continue
        if body_start + length > n:
            yield row(warc_type=wtype, url=url, warc_ts=ts,
                      error="truncated_payload")
            return
        payload = data[body_start : body_start + length]
        pos = body_start + length
        if wtype == "response":
            status, mime, body, err = _parse_http_response(payload)
            yield row(warc_type=wtype, url=url, warc_ts=ts,
                      http_status=status, mime=mime,
                      html=bytes(body) if err is None else None, error=err)
        else:
            # warcinfo / request / metadata / revisit: provenance rows,
            # payload intentionally not materialized into the pages path
            yield row(warc_type=wtype, url=url, warc_ts=ts)
        rec_index += 1


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC shard(s) -> one row per record (schema
    ``WARC_RECORD_SCHEMA``), errors routed to the ``error`` column.

    ``binaryFile`` scan (whole-shard tasks — WARC-gzip is unsplittable by
    design; Common Crawl ships many ~1 GB shards, so parallelism = shard
    count) into an Arrow-batched ``mapInPandas`` parser.  No collect, no
    Python per-row round trips: one pandas batch per shard group."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = list(parse_warc_stream(bytes(content), src=str(path_)))
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, schema=WARC_RECORD_SCHEMA)


def warc_pages(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Response records -> the input_hint pages table + the dead letter.

    Returns ``(pages, dead)``: pages carry ``(doc_id, url, warc_ts, html,
    src, rec_index)`` with the web-scale hashed id
    (``xxhash64(url, warc_ts)`` — a recrawl of the same url at a new
    timestamp is a NEW page row; ``html.recrawl_latest`` collapses to the
    canonical latest downstream, exactly as for any pages input).  ``dead``
    is every record with a parse error (replayable provenance)."""
    dead = records.filter(F.col("error").isNotNull())
    pages = (
        records.filter(
            F.col("error").isNull() & (F.col("warc_type") == "response")
            & F.col("html").isNotNull() & (F.col("url") != "")
        )
        .select(
            F.xxhash64("url", "warc_ts").alias("doc_id"),
            "url", "warc_ts", "html", "src", "rec_index",
        )
    )
    return pages, dead


def write_warc(
    pages: DataFrame, out_dir: str, url_col: str = "url",
    ts_col: str = "warc_ts", html_col: str = "html",
    compress: bool = True, warcinfo: bool = True,
) -> int:
    """Pages -> WARC shards: one ``part-<pid>.warc[.gz]`` per partition,
    one gzip member per record (Common-Crawl layout), deterministic bytes
    (gzip mtime 0, content-derived record ids).  Returns the shard count.

    Executor-side file writes (no collect): each task streams its own
    partition to its own shard — the shard set is exactly the partitioning
    you chose upstream (repartition before calling to size shards)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    # epoch computed ENGINE-side (unix_timestamp) — a collect-side
    # datetime would be naive in the session timezone, a portability trap
    sdf = pages.select(
        F.col(url_col),
        F.unix_timestamp(F.col(ts_col)).cast("long"),
        F.col(html_col),
    )
    ext = ".warc.gz" if compress else ".warc"

    def _write_partition(pid: int, rows) -> Iterator[tuple]:
        tmp = None
        out = None
        count = 0
        fname = f"part-{pid:05d}{ext}"
        final = os.path.join(out_dir, fname)
        for r in rows:
            if out is None:
                tmp = final + ".tmp"
                out = open(tmp, "wb")
                info = encode_warcinfo(fname)
                if warcinfo:
                    out.write(gzip_member(info) if compress else info)
            url, epoch, html = r[0], r[1], r[2]
            rec = encode_response_record(
                url or "", int(epoch or 0), bytes(html or b"")
            )
            out.write(gzip_member(rec) if compress else rec)
            count += 1
        if out is not None:
            out.close()
            os.replace(tmp, final)  # crash mid-write leaves only .tmp
            yield (fname, count)

    written = (
        sdf.rdd.mapPartitionsWithIndex(_write_partition)
        .collect()  # shard-count sized (one tuple per non-empty partition)
    )
    return len(written)
