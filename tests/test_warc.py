"""WARC ingestion source (sources/warc.py): pure parser round-trips,
Spark read path, and crawl-to-extraction end-to-end byte identity."""

import gzip
import os

from pyspark.sql import functions as F

from page_segmentation_spark.datagen import make_page
from page_segmentation_spark.oracle import extract_document
from page_segmentation_spark.plans.extract import extract
from page_segmentation_spark.sources.warc import (
    build_warc,
    parse_warc_bytes,
    read_warc,
)

TS = "2024-01-01T00:00:00Z"


def _recs(n, start=0):
    return [
        {"url": f"https://w.test/{i}", "ts": TS, "body": make_page(i)["html"]}
        for i in range(start, start + n)
    ]


def test_roundtrip_per_record_gzip():
    recs = _recs(5)
    out = list(parse_warc_bytes(build_warc(recs, per_record_gzip=True)))
    assert [r["url"] for r in out] == [r["url"] for r in recs]
    assert [r["html"] for r in out] == [r["body"] for r in recs]
    assert all(r["http_status"] == 200 for r in out)
    assert all(r["rec_type"] == "response" for r in out)


def test_roundtrip_plain():
    recs = _recs(3)
    out = list(parse_warc_bytes(build_warc(recs, per_record_gzip=False)))
    assert [r["html"] for r in out] == [r["body"] for r in recs]


def test_gzip_layout_is_member_per_record():
    """Common-Crawl layout: every record is its own gzip member, so any
    member boundary is a resume point."""
    recs = _recs(3)
    data = build_warc(recs, per_record_gzip=True)
    # each member starts with the gzip magic; count them
    assert data.count(b"\x1f\x8b\x08") >= 3
    # dropping the first member still parses the remaining records
    one = len(
        gzip.decompress(data[: data.index(b"\x1f\x8b\x08", 3)])
    )  # noqa: F841 — member boundary sanity
    second = data.index(b"\x1f\x8b\x08", 3)
    rest = list(parse_warc_bytes(data[second:]))
    assert [r["url"] for r in rest] == [r["url"] for r in recs[1:]]


def test_non_content_records_skipped():
    info = {
        "url": "", "ts": TS, "rec_type": "warcinfo",
        "body": b"software: test\r\n",
    }
    recs = [info] + _recs(2)
    out = list(parse_warc_bytes(build_warc(recs)))
    assert [r["url"] for r in out] == ["https://w.test/0", "https://w.test/1"]


def test_trailing_dirt_degrades_gracefully():
    data = build_warc(_recs(2), per_record_gzip=False) + b"GARBAGE NOT WARC"
    out = list(parse_warc_bytes(data))
    assert len(out) == 2


def test_malformed_content_length_stops_cleanly():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/\r\nWARC-Date: " + TS.encode()
        + b"\r\nContent-Length: NaN\r\n\r\nhttp"
    )
    assert list(parse_warc_bytes(raw)) == []


def test_read_warc_spark(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(build_warc(_recs(4)))
    with open(os.path.join(d, "b.warc"), "wb") as f:
        f.write(build_warc(_recs(3, start=4), per_record_gzip=False))
    df = read_warc(spark, d)
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 7
    r = rows["https://w.test/2"]
    assert bytes(r["html"]) == make_page(2)["html"]
    assert str(r["warc_ts"]).startswith("2024-01-01")
    assert r["http_status"] == 200
    assert r["warc_file"].endswith(("a.warc.gz", "b.warc"))
    # plan shape: binaryFile scan -> Arrow kernel, no shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_crawl_to_extraction_byte_identity(spark, tmp_path):
    """read_warc -> extract must equal the single-node oracle on the same
    HTML bytes — the full crawl-in path."""
    n = 12
    p = str(tmp_path / "cc.warc.gz")
    with open(p, "wb") as f:
        f.write(
            build_warc(
                [
                    {
                        "url": make_page(i)["url"],
                        "ts": TS,
                        "body": make_page(i)["html"],
                    }
                    for i in range(n)
                ]
            )
        )
    pages = read_warc(spark, p).select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    got = {r["url"]: r for r in extract(pages).collect()}
    assert len(got) == n
    for i in range(n):
        page = make_page(i)
        o = extract_document(page["html"])
        assert got[page["url"]]["extracted_text"] == o["extracted_text"], i


def test_truncated_gzip_member_keeps_complete_records():
    """An interrupted upload truncates the last gzip member mid-stream;
    every record from complete members must still come back."""
    data = build_warc(_recs(3), per_record_gzip=True)
    third = data.index(b"\x1f\x8b\x08", data.index(b"\x1f\x8b\x08", 3) + 3)
    truncated = data[: third + 20]  # cut inside member 3
    out = list(parse_warc_bytes(truncated))
    assert [r["url"] for r in out] == ["https://w.test/0", "https://w.test/1"]


def test_resync_after_corrupt_mid_file_record():
    """One corrupt record mid-file must not discard the rest: the parser
    resyncs at the next record header (gzip members make later records
    independently recoverable)."""
    good = build_warc(_recs(3), per_record_gzip=False)
    # corrupt record 2's framing by slicing its header mid-way
    starts = [i for i in range(len(good)) if good.startswith(b"WARC/", i)]
    assert len(starts) == 3
    broken = good[: starts[1] + 3] + b"\x00GARBAGE\x00" + good[starts[1] + 40:]
    out = list(parse_warc_bytes(broken))
    urls = [r["url"] for r in out]
    assert "https://w.test/0" in urls and "https://w.test/2" in urls


def test_resync_after_malformed_content_length():
    """A record with an unparseable Content-Length is skipped, not
    terminal — the following well-formed record still parses."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad/\r\nWARC-Date: " + TS.encode()
        + b"\r\nContent-Length: NaN\r\n\r\nhttp\r\n\r\n"
    )
    good = build_warc(_recs(1), per_record_gzip=False)
    out = list(parse_warc_bytes(bad + good))
    assert [r["url"] for r in out] == ["https://w.test/0"]


def test_fractional_second_warc_dates():
    """WARC/1.1 fractional-second dates must not null the timestamp."""
    from page_segmentation_spark.sources.warc import _warc_ts_to_us

    base = _warc_ts_to_us("2024-01-01T00:00:00Z")
    assert base is not None
    assert _warc_ts_to_us("2024-01-01T00:00:00.123Z") == base + 123_000
    assert _warc_ts_to_us("2024-01-01T00:00:00.123456Z") == base + 123_456
    assert _warc_ts_to_us("not-a-date") is None


def test_bounded_batch_flush_preserves_rows(monkeypatch):
    """The Arrow kernel must flush bounded RecordBatches (a ~1 GB crawl
    file inflates past the 2 GiB 32-bit binary-array cap if emitted as
    one batch) without changing the row stream."""
    import pyarrow as pa

    from page_segmentation_spark.sources import warc as W

    recs = list(parse_warc_bytes(build_warc(_recs(10)), warc_file="f"))
    monkeypatch.setattr(W, "FLUSH_RECORDS", 3)
    batches = list(W._bounded_batches(iter(recs)))
    assert len(batches) == 4  # 3+3+3+1
    urls = [u for b in batches for u in b.column("url").to_pylist()]
    assert urls == [r["url"] for r in recs]
    monkeypatch.setattr(W, "FLUSH_RECORDS", 65536)
    monkeypatch.setattr(W, "FLUSH_BYTES", 1)  # every record flushes
    batches = list(W._bounded_batches(iter(recs)))
    assert len(batches) == 10
    # empty input still yields one schema-bearing batch
    empty = list(W._bounded_batches(iter([])))
    assert len(empty) == 1 and empty[0].num_rows == 0
    assert empty[0].schema == W._ARROW_SCHEMA


def test_warc_range_shards_byte_identical(spark, tmp_path):
    """A manifest of byte-range shards (each starting on a gzip-member
    boundary) must reproduce the whole-file read exactly — the scale
    path for archives past executor memory."""
    from page_segmentation_spark.sources.warc import (
        read_warc_ranges,
        shard_ranges,
        warc_member_offsets,
    )

    p = str(tmp_path / "big.warc.gz")
    data = build_warc(_recs(9), per_record_gzip=True)
    with open(p, "wb") as f:
        f.write(data)
    offs = warc_member_offsets(data)
    assert len(offs) == 9 and offs[0] == 0
    shards = shard_ranges(p, target_bytes=len(data) // 3)
    assert len(shards) >= 2
    assert sum(ln for _, _, ln in shards) == len(data)  # full coverage
    assert all(off in offs for _, off, _ in shards)  # member-aligned
    whole = sorted(
        (r["url"], bytes(r["html"])) for r in read_warc(spark, p).collect()
    )
    sharded = sorted(
        (r["url"], bytes(r["html"]))
        for r in read_warc_ranges(spark, shards).collect()
    )
    assert sharded == whole and len(whole) == 9
    # plan shape: manifest scan -> Arrow kernel, no shuffle
    plan = (
        read_warc_ranges(spark, shards)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_wet_roundtrip_and_read(spark, tmp_path):
    """WET (Common-Crawl extracted-text) shape: build_wet serializes
    conversion records with text/plain payloads; read_wet returns only
    conversion records with the text decoded — mixed files keep
    response records out of the WET view."""
    from page_segmentation_spark.sources.warc import (
        build_warc,
        build_wet,
        parse_warc_bytes,
        read_wet,
    )

    recs = [
        {"url": "https://a", "ts": "2024-01-01T00:00:00Z",
         "text": "First extracted document.\n\nWith two paragraphs."},
        {"url": "https://b", "ts": "2024-01-02T00:00:00Z",
         "text": "Zweiter Text mit Umlauten: äöü."},
    ]
    data = build_wet(recs)
    parsed = list(parse_warc_bytes(data))
    assert [r["rec_type"] for r in parsed] == ["conversion"] * 2
    assert parsed[0]["html"].decode() == recs[0]["text"]
    assert b"text/plain" in data or True  # gz members: check plain form
    plain = build_wet(recs, per_record_gzip=False)
    assert b"Content-Type: text/plain" in plain

    # mixed WET + response records in one dir: read_wet filters
    mixed = data + build_warc(
        [{"url": "https://c", "ts": "2024-01-03T00:00:00Z",
          "body": b"<html><body><p>raw page</p></body></html>"}]
    )
    p = str(tmp_path / "chunk.warc.wet.gz")
    with open(p, "wb") as f:
        f.write(mixed)
    out = {r["url"]: r["text"] for r in read_wet(spark, p).collect()}
    assert out == {r["url"]: r["text"] for r in recs}


def test_wet_feeds_text_funnel_identically(spark, tmp_path):
    """A corpus built from WET text equals the corpus built from the
    HTML pages whose extraction produced that text — same filter/dedup
    code objects, extraction skipped."""
    from page_segmentation_spark.oracle import extract_document
    from page_segmentation_spark.packaging import ship_package
    from page_segmentation_spark.plans.training_corpus import (
        build_training_corpus,
    )
    from page_segmentation_spark.sources.warc import build_wet, read_wet

    ship_package(spark)
    body = (
        "the quick brown fox jumps over the lazy dog and then rests "
        "with a calm heart near the river bank every single day."
    )
    pages = []
    for i in range(4):
        html = (
            "<!DOCTYPE html><html><body><article><h1>Doc %d</h1>"
            "<p>%s number %d.</p><p>%s again number %d.</p></article>"
            '<nav><a href="/">Home</a><a href="/a">About</a>'
            '<a href="/b">More</a></nav></body></html>'
            % (i, body, i, body, i)
        ).encode()
        pages.append((f"https://s/{i}", html))
    pages_df = spark.createDataFrame(
        [(u, None, h, None, None) for u, h in pages],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    opts = dict(
        c4_opts=dict(min_kept_lines=1),
        gopher_opts=dict(min_words=10),
    )
    want = sorted(
        tuple(r) for r in build_training_corpus(pages_df, **opts).collect()
    )
    # WET twin: the oracle-extracted text of the same pages
    wet = build_wet(
        [
            {"url": u, "ts": "2024-01-01T00:00:00Z",
             "text": extract_document(h)["extracted_text"]}
            for u, h in pages
        ]
    )
    p = str(tmp_path / "c.warc.wet.gz")
    with open(p, "wb") as f:
        f.write(wet)
    got = sorted(
        tuple(r)
        for r in build_training_corpus(
            read_wet(spark, p).select("url", "text"),
            from_text=True,
            **opts,
        ).collect()
    )
    assert got == want and len(got) == 4


def test_cdx_index_driven_fetch(spark, tmp_path):
    """The production Common-Crawl access pattern end-to-end: filter the
    CDXJ index, fetch ONLY matching records by byte range — the union
    of machinery already pinned (member offsets, ranged reads) driven
    by a real index file."""
    import os

    from pyspark.sql import functions as F

    from page_segmentation_spark.sources.cdx import (
        build_cdxj,
        fetch_cdx_records,
        read_cdxj,
    )
    from page_segmentation_spark.sources.warc import (
        build_warc,
        warc_member_offsets,
    )

    recs = [
        {"url": f"https://h{i % 3}.example/p{i}",
         "ts": "2024-01-01T00:00:00Z",
         "body": f"<html><body><p>payload {i}</p></body></html>".encode(),
         "status": 200 if i % 4 else 404}
        for i in range(9)
    ]
    warc = build_warc(recs)
    wpath = str(tmp_path / "f.warc.gz")
    with open(wpath, "wb") as f:
        f.write(warc)
    offs = warc_member_offsets(warc) + [len(warc)]
    cpath = str(tmp_path / "idx.cdxj")
    with open(cpath, "wb") as f:
        f.write(build_cdxj([
            {"urlkey": f"example,h{i % 3})/p{i}", "ts": "20240101000000",
             "url": recs[i]["url"], "filename": "f.warc.gz",
             "offset": offs[i], "length": offs[i + 1] - offs[i],
             "status": 200 if i % 4 else 404}
            for i in range(9)
        ]))
    idx = read_cdxj(spark, cpath)
    assert idx.count() == 9
    ok = idx.where(F.col("status") == 200)
    got = fetch_cdx_records(spark, ok, path_prefix=str(tmp_path) + "/")
    want = sorted(r["url"] for i, r in enumerate(recs) if i % 4)
    assert sorted(r["url"] for r in got.collect()) == want
    # index-driven fetch is embarrassingly parallel: no shuffle anywhere
    assert "Exchange" not in (
        got._jdf.queryExecution().executedPlan().toString()
    )
    # malformed JSON tail: urlkey/ts survive, JSON fields NULL
    from page_segmentation_spark.sources.cdx import parse_cdxj_lines

    bad = spark.createDataFrame(
        [("key 20240101000000 {broken",), ("nospace",)], "value string"
    )
    rows = parse_cdxj_lines(bad).collect()
    assert rows[0]["urlkey"] == "key" and rows[0]["url"] is None


def test_write_wet_roundtrip(spark, tmp_path):
    """Corpus -> sharded WET export -> read_wet recovers exactly the
    rows (the ecosystem-format export sink); empty partitions write no
    shard and _SUCCESS lands."""
    import os

    from page_segmentation_spark.sources.warc import read_wet, write_wet

    rows = [(f"https://s/{i}", f"document body number {i}.") for i in range(7)]
    df = spark.createDataFrame(
        rows, "url string, clean_text string"
    ).repartition(4)
    out = str(tmp_path / "wet_out")
    n = write_wet(df, out)
    assert 1 <= n <= 4
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    shards = [f for f in os.listdir(out) if f.endswith(".warc.wet.gz")]
    assert len(shards) == n
    back = {(r["url"], r["text"]) for r in
            read_wet(spark, out + "/*.warc.wet.gz").collect()}
    assert back == set(rows)
