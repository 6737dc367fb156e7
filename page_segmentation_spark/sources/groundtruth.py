"""Ground-truth annotation ingestion (S5/S7/P12/P13/J5 analogs).

The reference ingests PageXML ground truth: namespace/version autodetect,
XPath over typed regions, points-string decode, polygon rasterization to
label masks (reference lib/pagexml.py:44-265).  The graft ingests an
annotation-XML column describing labeled node spans per document:

    <annotation>
      <region type="paragraph" spans="3,9 14,20"/>
      <region type="ad" spans="10,13"/>
    </annotation>

* XML parse runs in an Arrow-batched pandas UDF over ``mapInPandas``
  (stdlib xml.etree standing in for lxml) — S5.
* The 19-type -> {background, text, image} collapse
  (reference lib/pagexml.py:66-129) becomes the REGION_TYPE_CLASS map.
* ``string_to_points`` (P12, reference lib/pagexml.py:161-167) is pure
  column math: transform(split(...)).
* ``label_nodes`` rasterizes spans onto nodes via a range join (J5/P13).
* ``write_labels`` materializes the label table (S7 MaskGenerator.save).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from page_segmentation_spark.config import CLS_BOILER, CLS_MAIN, CLS_MEDIA

#: region-type collapse — the text_nontext MaskSetting analog
#: (reference lib/pagexml.py:95-112: 19 PageXML region types -> 3 classes)
REGION_TYPE_CLASS = {
    "paragraph": CLS_MAIN,
    "heading": CLS_MAIN,
    "caption": CLS_MAIN,
    "text": CLS_MAIN,
    "image": CLS_MEDIA,
    "graphic": CLS_MEDIA,
    "table": CLS_MEDIA,
    "maths": CLS_MEDIA,
    "ad": CLS_BOILER,
    "nav": CLS_BOILER,
    "footer": CLS_BOILER,
    "header": CLS_BOILER,
    "background": CLS_BOILER,
}

GT_SPAN_SCHEMA = (
    "url string, region_type string, label int, span_start long, span_end long"
)


def parse_annotations(df: DataFrame, xml_col: str = "labels_xml") -> DataFrame:
    """(url, labels_xml) -> one row per ground-truth span (S5)."""
    pruned = df.select("url", xml_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("url", "region_type", "label", "span_start", "span_end")}
            for url, xml in zip(pdf["url"], pdf[xml_col]):
                if not xml:
                    continue
                try:
                    root = ET.fromstring(xml)
                except ET.ParseError:
                    continue  # malformed annotation -> no GT for this url
                for region in root.iter("region"):
                    rtype = region.get("type", "background")
                    label = REGION_TYPE_CLASS.get(rtype, CLS_BOILER)
                    for span in (region.get("spans") or "").split():
                        try:
                            s, e = span.split(",")
                            s_i, e_i = int(s), int(e)
                        except ValueError:
                            continue
                        out["url"].append(url)
                        out["region_type"].append(rtype)
                        out["label"].append(label)
                        out["span_start"].append(s_i)
                        out["span_end"].append(e_i)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(kernel, schema=GT_SPAN_SCHEMA)


def string_to_points(col: Column) -> Column:
    """P12: '"x,y x,y ..."' -> array<struct<x:int, y:int>>
    (reference lib/pagexml.py:161-167)."""
    return F.transform(
        F.split(F.trim(col), " "),
        lambda p: F.struct(
            F.split(p, ",").getItem(0).cast("int").alias("x"),
            F.split(p, ",").getItem(1).cast("int").alias("y"),
        ),
    )


def label_nodes(
    nodes: DataFrame, gt_spans: DataFrame, default_label: int = CLS_BOILER
) -> DataFrame:
    """P13/J5: rasterize GT spans onto the node table via a range join;
    nodes outside every span get the background label.  Overlapping spans
    resolve to the lowest label id (deterministic, matching first-max
    argmax discipline)."""
    spans = gt_spans.select(
        F.col("url").alias("g_url"),
        F.col("label").alias("g_label"),
        "span_start",
        "span_end",
    )
    joined = nodes.join(
        spans,
        (nodes.url == spans.g_url)
        & nodes.node_idx.between(
            spans.span_start, spans.span_end
        ),
        "left",
    )
    return (
        joined.groupBy(*[nodes[c] for c in nodes.columns])
        .agg(F.min("g_label").alias("gt_label"))
        .withColumn(
            "gt_label",
            F.coalesce(F.col("gt_label"), F.lit(default_label)).cast("int"),
        )
    )


def write_labels(labels: DataFrame, path: str) -> None:
    """S7: materialize the ground-truth label table."""
    labels.select("url", "node_idx", "gt_label").write.mode(
        "overwrite"
    ).parquet(path)


def filter_region_types(gt_spans: DataFrame, types) -> DataFrame:
    """F3: ``PageRegions.only_types`` analog (reference
    lib/pagexml.py:142-145) — keep only ground-truth regions of the
    given types."""
    return gt_spans.where(F.col("region_type").isin(*list(types)))
