"""CDXJ (Common-Crawl URL index) ingestion — index-driven record fetch.

Common Crawl publishes a per-crawl URL index (the "cc-index"): sorted
text shards of CDXJ lines,

    <urlkey> <timestamp14> {"url": ..., "filename": "....warc.gz",
                            "offset": "12345", "length": "678",
                            "status": "200", "mime": "text/html", ...}

The production access pattern for any targeted corpus job ("all PDFs",
"every capture of host X", "only 200/text-html") is: filter the INDEX,
then fetch ONLY the matching records by byte range — never scan the
archives.  This module supplies that path end-to-end with existing
machinery:

    read_cdxj(spark, path)          # typed index rows (all JVM-side)
      .where(...)                   # pushdown-able predicates
    cdx_ranges(idx)                 # -> (path, offset, length) manifest
    read_warc_ranges(spark, ...)    # ranged fetch (sources/warc.py)

Parsing is pure Catalyst (substring split + ``from_json``) — no Python
in the plan; a malformed JSON tail yields NULL fields, never a failure.
The index rows themselves are also the cheap surface for crawl
analytics (status/mime/host histograms) without touching payload bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: JSON fields of a CDXJ record (offset/length are STRINGS in the wild).
CDXJ_JSON_SCHEMA = (
    "url string, filename string, offset string, length string, "
    "status string, mime string, digest string"
)

CDX_SCHEMA = (
    "urlkey string, ts string, url string, filename string, "
    "offset long, length long, status int, mime string, digest string"
)


def parse_cdxj_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Typed index rows from raw CDXJ text lines — pure Catalyst: the
    first two space-delimited tokens are urlkey and timestamp14, the
    remainder (from the first ``{``) parses with ``from_json``.
    Malformed lines keep their urlkey/ts and NULL JSON fields (the
    whatever-is-visible contract of every parser in this engine)."""
    line = F.col(line_col)
    sp1 = F.instr(line, " ")
    rest1 = F.expr(f"substring({line_col}, instr({line_col}, ' ') + 1)")
    j = F.expr(
        f"substring({line_col}, instr({line_col}, '{{'))"
    )
    parsed = F.from_json(j, CDXJ_JSON_SCHEMA)
    return df.select(
        F.substring(line, F.lit(1), sp1 - 1).alias("urlkey"),
        F.split(rest1, " ", 2).getItem(0).alias("ts"),
        parsed.getField("url").alias("url"),
        parsed.getField("filename").alias("filename"),
        parsed.getField("offset").cast("long").alias("offset"),
        parsed.getField("length").cast("long").alias("length"),
        parsed.getField("status").cast("int").alias("status"),
        parsed.getField("mime").alias("mime"),
        parsed.getField("digest").alias("digest"),
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ index shards at ``path`` (glob ok; ``spark.read.text``
    handles .gz transparently) -> typed index rows (CDX_SCHEMA)."""
    return parse_cdxj_lines(spark.read.text(path), "value")


def cdx_ranges(idx: DataFrame, path_prefix: str = "") -> DataFrame:
    """Filtered index rows -> the (path, offset, length) byte-range
    manifest :func:`sources.warc.read_warc_ranges` consumes — each CDXJ
    record points at one gzip member, which is exactly the range
    reader's shard contract.  ``path_prefix`` maps the index's relative
    ``filename`` onto the local mount / bucket root."""
    return idx.where(
        F.col("filename").isNotNull()
        & F.col("offset").isNotNull()
        & F.col("length").isNotNull()
    ).select(
        F.concat(F.lit(path_prefix), F.col("filename")).alias("path"),
        F.col("offset"),
        F.col("length"),
    )


def fetch_cdx_records(
    spark: SparkSession, idx: DataFrame, path_prefix: str = ""
) -> DataFrame:
    """The composed index-driven fetch: filtered index rows -> ranged
    WARC record read.  Per-task memory is bounded by the largest single
    record, whatever the archive size — the 100-TB access pattern."""
    from page_segmentation_spark.sources.warc import read_warc_ranges

    return read_warc_ranges(spark, cdx_ranges(idx, path_prefix))


def build_cdxj(records: list[dict]) -> bytes:
    """Deterministic CDXJ writer for fixtures/exports:
    ``[{urlkey, ts, url, filename, offset, length, status?, mime?,
    digest?}]`` -> text lines (independent of the reader's parse
    expressions, same twin discipline as build_warc/build_wet)."""
    import json

    out = []
    for r in records:
        j = {
            "url": r["url"],
            "filename": r["filename"],
            "offset": str(r["offset"]),
            "length": str(r["length"]),
            "status": str(r.get("status", 200)),
            "mime": r.get("mime", "text/html"),
            "digest": r.get("digest", ""),
        }
        out.append(
            f"{r['urlkey']} {r['ts']} "
            + json.dumps(j, separators=(", ", ": "))
        )
    return ("\n".join(out) + "\n").encode("utf-8")
