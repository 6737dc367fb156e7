"""Sink tests (S6/S8 analogs)."""

from page_segmentation_spark.datagen import pages_df
from page_segmentation_spark.plans.extract import classified_nodes, extract
from page_segmentation_spark.sources.sinks import (
    debug_overlay,
    write_node_classes,
    write_results,
)


def test_write_results_bucketed_append(spark, tmp_path):
    out = str(tmp_path / "results")
    pages = pages_df(spark, 10, partitions=2).cache()
    res = extract(pages)
    write_results(res, out, n_buckets=4)
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert "bucket" in back.columns
    # append mode: second write doubles rows (idempotence lives in the
    # checkpoint protocol, not the raw sink)
    write_results(res, out, n_buckets=4)
    assert spark.read.parquet(out).count() == 20


def test_write_results_format_param(spark, tmp_path):
    import pytest

    from page_segmentation_spark.sources.sinks import read_results

    out = str(tmp_path / "fmt")
    res = extract(pages_df(spark, 6, partitions=1))
    write_results(res, out, n_buckets=2, format="parquet")
    assert read_results(spark, out, format="parquet").count() == 6
    with pytest.raises(ValueError):
        write_results(res, out, format="csv")
    with pytest.raises(ValueError):
        write_results(res, format="iceberg")  # table required
    # the iceberg branch is config-complete: without the catalog conf the
    # V2 writer fails with a catalog/table resolution error, not a bug here
    with pytest.raises(Exception):
        write_results(res, format="iceberg", table="lake.db.results")


def test_write_node_classes(spark, tmp_path):
    out = str(tmp_path / "classes")
    nodes = classified_nodes(pages_df(spark, 5, partitions=1))
    write_node_classes(nodes, out)
    back = spark.read.parquet(out)
    assert set(back.columns) == {"url", "node_idx", "tag", "pred", "is_fg"}
    assert back.count() == nodes.count()


def test_debug_overlay(spark):
    nodes = classified_nodes(pages_df(spark, 8, partitions=1))
    rows = debug_overlay(nodes).collect()
    assert 0 < len(rows) <= 8
    joined = "\n".join(r["overlay"] for r in rows)
    assert "█" in joined and "[p]" in joined


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must
    sort-merge-join with ZERO Exchange (the 100-TB co-location story),
    and a groupBy on the bucket column must aggregate shuffle-free."""
    from page_segmentation_spark.sources.sinks import write_bucketed_table

    pages = pages_df(spark, 12, partitions=2).cache()
    res = extract(pages).select("url", "extracted_text")
    meta = pages.select("url", "lang")
    write_bucketed_table(
        res, "t_bucket_res", bucket_col="url", n_buckets=4,
        sort_cols=("url",), path=str(tmp_path / "res"),
    )
    write_bucketed_table(
        meta, "t_bucket_meta", bucket_col="url", n_buckets=4,
        sort_cols=("url",), path=str(tmp_path / "meta"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        a, b = spark.table("t_bucket_res"), spark.table("t_bucket_meta")
        j = a.join(b, "url")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 12
        g = a.groupBy("url").agg({"extracted_text": "count"})
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in gplan, gplan
        assert g.count() == 12
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_res")
        spark.sql("DROP TABLE IF EXISTS t_bucket_meta")
        pages.unpersist()
