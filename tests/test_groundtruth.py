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
