"""Ground-truth ingestion tests (S5/P12/P13/J5 analogs)."""

from pyspark.sql import functions as F

from page_segmentation_spark.config import CLS_BOILER, CLS_MAIN, CLS_MEDIA
from page_segmentation_spark.sources.groundtruth import (
    label_nodes,
    parse_annotations,
    string_to_points,
)

XML = (
    '<annotation><region type="paragraph" spans="1,3 6,7"/>'
    '<region type="image" spans="4,4"/>'
    '<region type="ad" spans="5,5"/></annotation>'
)


def test_parse_annotations(spark):
    df = spark.createDataFrame(
        [("u1", XML), ("u2", "<broken"), ("u3", None)],
        "url string, labels_xml string",
    )
    rows = parse_annotations(df).orderBy("span_start").collect()
    assert [(r["span_start"], r["span_end"], r["label"]) for r in rows] == [
        (1, 3, CLS_MAIN),
        (4, 4, CLS_MEDIA),
        (5, 5, CLS_BOILER),
        (6, 7, CLS_MAIN),
    ]
    assert all(r["url"] == "u1" for r in rows)  # malformed/null skipped


def test_string_to_points(spark):
    df = spark.createDataFrame([("10,20 30,40 5,6",)], "pts string")
    out = df.select(string_to_points(F.col("pts")).alias("p")).first()["p"]
    assert [(p["x"], p["y"]) for p in out] == [(10, 20), (30, 40), (5, 6)]


def test_label_nodes_range_join_and_default(spark):
    nodes = spark.createDataFrame(
        [("u1", i) for i in range(9)], "url string, node_idx long"
    )
    gt = parse_annotations(
        spark.createDataFrame([("u1", XML)], "url string, labels_xml string")
    )
    labeled = {
        r["node_idx"]: r["gt_label"]
        for r in label_nodes(nodes, gt).collect()
    }
    assert labeled == {
        0: CLS_BOILER, 1: CLS_MAIN, 2: CLS_MAIN, 3: CLS_MAIN,
        4: CLS_MEDIA, 5: CLS_BOILER, 6: CLS_MAIN, 7: CLS_MAIN,
        8: CLS_BOILER,
    }


def test_label_nodes_overlap_lowest_wins(spark):
    nodes = spark.createDataFrame([("u", 0)], "url string, node_idx long")
    gt = spark.createDataFrame(
        [("u", "paragraph", CLS_MAIN, 0, 0), ("u", "image", CLS_MEDIA, 0, 0)],
        "url string, region_type string, label int, span_start long, span_end long",
    )
    r = label_nodes(nodes, gt).first()
    assert r["gt_label"] == CLS_MAIN  # lowest class id wins


def test_end_to_end_eval_against_gt(spark):
    """Extraction pred vs GT labels -> metrics (the reference's eval loop,
    lib/evaluation.py, over the graft's tables)."""
    from page_segmentation_spark import metrics as M
    from page_segmentation_spark.datagen import pages_df
    from page_segmentation_spark.plans.extract import classified_nodes

    pages = pages_df(spark, 6, partitions=1)
    nodes = classified_nodes(pages).select("url", "node_idx", "pred", "is_fg")
    # trivial GT: everything main in 2..20 per doc
    gt = spark.createDataFrame(
        [(r["url"], "paragraph", 1, 2, 20) for r in pages.select("url").collect()],
        "url string, region_type string, label int, span_start long, span_end long",
    )
    labeled = label_nodes(nodes, gt).withColumnRenamed("gt_label", "label")
    r = M.fgpa(labeled).first()
    assert r["fgpa"] is not None and 0.0 <= r["fgpa"] <= 1.0


def test_filter_region_types(spark):
    from page_segmentation_spark.sources.groundtruth import (
        filter_region_types,
    )

    gt = parse_annotations(
        spark.createDataFrame([("u1", XML)], "url string, labels_xml string")
    )
    out = filter_region_types(gt, ["paragraph"])
    assert {r["region_type"] for r in out.collect()} == {"paragraph"}
    assert out.count() == 2


# ----------------------------------------------------------- real PageXML

_NS19 = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
_NS13 = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"


def _pagexml(ns: str) -> str:
    xmlns = f' xmlns="{ns}"' if ns else ""
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<PcGts{xmlns}>
 <Page imageFilename="p1.png" imageWidth="800" imageHeight="1200">
  <TextRegion id="r0" type="heading">
   <Coords points="10,10 790,10 790,60 10,60"/>
   <TextLine id="l0"><Coords points="10,10 790,60"/>
    <TextEquiv><Unicode>The Heading</Unicode></TextEquiv></TextLine>
  </TextRegion>
  <TextRegion id="r1" type="paragraph">
   <Coords points="10,70 790,70 790,300 10,300"/>
   <TextLine id="l1"><TextEquiv><Unicode>first line</Unicode></TextEquiv></TextLine>
   <TextLine id="l2"><TextEquiv><Unicode>second line</Unicode></TextEquiv></TextLine>
  </TextRegion>
  <ImageRegion id="r2"><Coords points="10,310 400,500"/></ImageRegion>
  <TextRegion id="r3" type="footer">
   <Coords points="10,1150 790,1190"/>
   <TextLine id="l3"><TextEquiv><Unicode>page 1 of 9</Unicode></TextEquiv></TextLine>
  </TextRegion>
  <SeparatorRegion id="r4"><Coords points="0,600 800,601"/></SeparatorRegion>
 </Page>
</PcGts>"""


def test_parse_pagexml_namespace_autodetect(spark):
    from page_segmentation_spark.sources.groundtruth import parse_pagexml

    df = spark.createDataFrame(
        [("u19", _pagexml(_NS19)), ("u13", _pagexml(_NS13)),
         ("unone", _pagexml("")), ("ubad", "<not-pagexml/>"),
         ("umalformed", "<PcGts><unclosed")],
        "url string, pagexml string",
    )
    rows = parse_pagexml(df).orderBy("url", "region_idx").collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    # every namespace variant parses identically
    assert set(by_url) == {"u19", "u13", "unone"}
    for u, rs in by_url.items():
        assert [r["region_kind"] for r in rs] == [
            "TextRegion", "TextRegion", "ImageRegion", "TextRegion",
            "SeparatorRegion",
        ], u
        assert [r["label"] for r in rs] == [1, 1, 2, 0, 0], u  # main/media/boiler
        assert rs[0]["text"] == "The Heading"
        assert rs[1]["text"] == "first line second line"
        # cumulative line spans in reading order
        assert (rs[0]["line_start"], rs[0]["line_end"]) == (0, 0)
        assert (rs[1]["line_start"], rs[1]["line_end"]) == (1, 2)
        assert (rs[2]["line_start"], rs[2]["line_end"]) == (-1, -1)  # no lines
        assert (rs[3]["line_start"], rs[3]["line_end"]) == (3, 3)
        assert rs[0]["points"].startswith("10,10 ")


def test_pagexml_gt_spans_feed_label_nodes(spark):
    from page_segmentation_spark.sources.groundtruth import (
        pagexml_gt_spans,
        parse_pagexml,
    )

    df = spark.createDataFrame([("u", _pagexml(_NS19))], "url string, pagexml string")
    spans = pagexml_gt_spans(parse_pagexml(df))
    got = {(r["span_start"], r["span_end"]): (r["region_type"], r["label"])
           for r in spans.collect()}
    assert got == {
        (0, 0): ("heading", 1),
        (1, 2): ("paragraph", 1),
        (3, 3): ("footer", 0),
    }
    # rasterize onto a 4-line node table
    nodes = spark.createDataFrame(
        [("u", i) for i in range(4)], "url string, node_idx long"
    )
    labeled = {r["node_idx"]: r["gt_label"]
               for r in label_nodes(nodes, spans).collect()}
    assert labeled == {0: 1, 1: 1, 2: 1, 3: 0}
