"""Dataset manifest ingestion (S2/S1 analogs).

The reference loads dataset-JSON manifests ``{train:[...], test:[...],
eval:[...]}`` with per-entry ``{binary_path, image_path, mask_path,
line_height_px}`` (reference README.md:46-70, lib/dataset.py:200-208) and
aligns three directory listings by basename (S1, lib/dataset.py:44-111).

Graft: a manifest JSON lists page sources per split; entries carry the
url plus per-document hints.  ``load_manifest`` reads it with
``spark.read.json`` + explode; ``select_section`` filters a split
('all' = every section, the X4 concat, lib/dataset.py:203-204);
``align_sources`` re-expresses the basename triple-alignment as inner
joins on the key column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SECTIONS = ("train", "test", "eval")


def load_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Read ``{train:[{url,...}], test:[...], eval:[...]}`` (multiLine
    JSON, one or more files) into rows (split, url, ...)."""
    raw = spark.read.option("multiLine", "true").json(path)
    parts = []
    for section in SECTIONS:
        if section in raw.columns:
            parts.append(
                raw.select(
                    F.lit(section).alias("split"),
                    F.explode(F.col(section)).alias("e"),
                ).select("split", "e.*")
            )
    if not parts:
        raise ValueError(f"manifest at {path} has no {SECTIONS} sections")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def select_section(manifest: DataFrame, section: str) -> DataFrame:
    """'train' | 'test' | 'eval' | 'all' (flattened concat)."""
    if section == "all":
        return manifest
    return manifest.where(F.col("split") == section)


def align_sources(
    keyed: Sequence[DataFrame], key: str = "url", verify: bool = False
) -> DataFrame:
    """S1/J1: N-way alignment on a key column.  verify=True mirrors
    ``verify_filenames`` (keep only keys present everywhere == inner
    join); verify=False asserts equal counts like the reference's zip
    (lib/dataset.py:105-111)."""
    if not verify:
        # one driver action for all sources (union of per-source counts),
        # not one count() job per source
        cnt_dfs = [df.agg(F.count(F.lit(1)).alias("n")) for df in keyed]
        allc = cnt_dfs[0]
        for c in cnt_dfs[1:]:
            allc = allc.unionByName(c)
        counts = {r["n"] for r in allc.collect()}
        if len(counts) > 1:
            raise ValueError(f"unaligned source counts: {sorted(counts)}")
    out = keyed[0]
    for df in keyed[1:]:
        out = out.join(df, key, "inner")
    return out
