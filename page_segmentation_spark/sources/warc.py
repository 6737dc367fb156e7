"""WARC (Web ARChive, ISO 28500) ingestion source and sink.

Common Crawl — the corpus the north-star Iceberg table is built from —
publishes page captures as ``.warc.gz`` files: a concatenation of
records, each ``WARC/1.0\\r\\n`` + header lines + blank line +
``Content-Length`` payload octets + ``\\r\\n\\r\\n``.  Crawl WARCs gzip
each record as its *own gzip member*, so a file is a concatenation of
gzip members and any member boundary is a valid resume point.

This module turns WARC files into the engine's pages shape
(``url, warc_ts, html, ...`` — see :mod:`..sources.pages_schema`):

  * :func:`read_warc` — ``spark.read.format("binaryFile")`` over a path
    glob, then Arrow-batched ``mapInArrow`` calling the pure-Python
    record parser.  One task per WARC file: that is the standard
    Common-Crawl processing grain (a crawl is ~90k files of ~1 GB, so
    file-level parallelism saturates any cluster; gzip members are not
    splittable without an external index, and ``binaryFile`` cannot
    split mid-file anyway).
  * :func:`parse_warc_bytes` — the shared pure parser (also used by
    tests and usable from a plain Python oracle).
  * :func:`build_warc` — deterministic WARC writer (per-record gzip
    members like Common Crawl, or plain) used for fixtures and as the
    export sink's serializer.

Scale notes: payload bytes never leave the JVM<->Arrow columnar path as
Python objects row-by-row; headers are parsed per record in the worker.
``spark.sql.files.maxPartitionBytes`` does not split binaryFile rows, so
per-file memory is bounded by the largest WARC member — crawl files are
capped at ~1 GB which fits executor memory; for larger archives point
``read_warc`` at a manifest of byte-range shards instead.

Analog of the reference's dataset loading (lib/dataset.py:131-198): the
reference reads page images from disk into arrays; here the "image" is
the raw HTTP response body captured in the WARC record.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

#: WARC record types we materialize as rows (warcinfo/request/metadata
#: records are crawl bookkeeping, not page content).
_CONTENT_TYPES = ("response", "resource", "conversion")

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, rec_type string, "
    "http_status int, warc_file string"
)
_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("rec_type", pa.string()),
        ("http_status", pa.int32()),
        ("warc_file", pa.string()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common-Crawl WARC
    layout).  Plain (non-gzip) input is returned unchanged."""
    if data[:2] != b"\x1f\x8b":
        return data
    # member-by-member zlib.decompressobj (NOT GzipFile.read: a chunked
    # GzipFile read that hits a truncated trailing member raises and
    # discards every byte already decoded in that call) — a truncated or
    # corrupt member (interrupted crawl upload) keeps all complete
    # members; the record parser then stops at the first incomplete
    # record.  Never raise on crawl dirt.
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error:
            break
        if not d.eof:  # truncated member: no complete trailer
            break
        out += chunk
        pos = len(data) - len(d.unused_data)
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().decode("ascii", "replace").lower()] = (
            v.strip().decode("utf-8", "replace")
        )
    return headers


def _http_split(payload: bytes) -> tuple[int | None, bytes]:
    """Split an HTTP response payload into (status, body).  Non-HTTP
    payloads (resource/conversion records) come back as (None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, payload
    status_line = head.split(b"\r\n", 1)[0].split()
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    return status, body


def parse_warc_bytes(data: bytes, warc_file: str = "") -> Iterator[dict]:
    """Yield one dict per content record of a WARC byte string (gzip'd
    per-member or plain).  Malformed trailing bytes degrade gracefully:
    parsing stops at the first record without a well-formed header block
    (same contract as the HTML/PDF parsers — never raise on crawl dirt).
    """
    raw = _gunzip_members(data)
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record padding
        while pos < n and raw[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not raw.startswith(b"WARC/", pos):
            return  # trailing dirt — stop, keep what we have
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers = _parse_headers(raw[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        payload = raw[body_start : body_start + length]
        pos = body_start + length
        rec_type = headers.get("warc-type", "")
        if rec_type in _CONTENT_TYPES:
            status, body = _http_split(payload)
            yield {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "html": body,
                "rec_type": rec_type,
                "http_status": status,
                "warc_file": warc_file,
            }


def _warc_ts_to_us(ts: str) -> int | None:
    """'2024-01-01T00:00:00Z' -> epoch microseconds (UTC), None if
    unparseable.  Pure arithmetic so workers need no tz database."""
    import calendar
    import time

    try:
        st = time.strptime(ts.rstrip("Z"), "%Y-%m-%dT%H:%M:%S")
        return calendar.timegm(st) * 1_000_000
    except ValueError:
        return None


#: binaryFile source schema (needed explicitly by the streaming reader)
BINARY_FILE_DDL = (
    "path string, modificationTime timestamp, length long, content binary"
)


def warc_records(files: DataFrame) -> DataFrame:
    """Apply the WARC record parser to a binaryFile-shaped DataFrame
    (``path``, ``content`` columns; batch or streaming) -> content
    records ``(url, warc_ts, html, rec_type, http_status, warc_file)``.

    Plan shape: scan -> ArrowEvalPython (the parse kernel) —
    embarrassingly parallel, no shuffle.
    """

    def _kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _ARROW_SCHEMA}
            d = batch.to_pydict()
            for fpath, content in zip(d["path"], d["content"]):
                for rec in parse_warc_bytes(content, warc_file=fpath):
                    cols["url"].append(rec["url"])
                    cols["warc_ts"].append(_warc_ts_to_us(rec["warc_ts"]))
                    cols["html"].append(rec["html"])
                    cols["rec_type"].append(rec["rec_type"])
                    cols["http_status"].append(rec["http_status"])
                    cols["warc_file"].append(rec["warc_file"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[f.name], type=f.type)
                    for f in _ARROW_SCHEMA
                ],
                schema=_ARROW_SCHEMA,
            )

    return files.select("path", "content").mapInArrow(_kernel, WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files at ``path`` (glob ok) -> DataFrame of content records.
    Chain with the parse stage for extraction straight off a crawl; see
    :func:`warc_records` for the plan shape."""
    return warc_records(spark.read.format("binaryFile").load(path))


# ------------------------------------------------------------------ writer


def _record(rec_type: str, url: str, ts: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload + b"\r\n\r\n"


def build_warc(
    records: list[dict],
    per_record_gzip: bool = True,
) -> bytes:
    """Serialize ``[{url, ts, body(bytes), status?, rec_type?}]`` into
    WARC bytes.  ``per_record_gzip=True`` reproduces the Common-Crawl
    member-per-record layout; deterministic (gzip mtime pinned to 0)."""
    out = bytearray()
    for r in records:
        rec_type = r.get("rec_type", "response")
        if rec_type == "response":
            status = r.get("status", 200)
            payload = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: text/html; charset=UTF-8\r\n\r\n"
            ).encode("ascii") + r["body"]
        else:
            payload = r["body"]
        rec = _record(rec_type, r["url"], r["ts"], payload)
        if per_record_gzip:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)
