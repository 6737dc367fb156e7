"""Structured-Streaming extraction tests: incremental output must be
byte-identical to the batch pipeline; late-data aggregation compiles to a
valid streaming plan."""

from page_segmentation_spark.datagen import pages_df
from page_segmentation_spark.plans.extract import extract
from page_segmentation_spark.streaming.extract_stream import (
    crawl_stats_stream,
    stream_extract,
)


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    pages = pages_df(spark, 20, partitions=2).cache()
    pages.write.parquet(src)

    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(out).collect()
    }
    want = {r["url"]: r["extracted_text"] for r in extract(pages).collect()}
    assert got == want  # byte-identical to batch

    # second availableNow run: checkpoint says nothing new -> no dupes
    q2 = stream_extract(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 20


def test_stream_extract_incremental_new_files(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    pages_df(spark, 10, partitions=1).write.parquet(src)
    stream_extract(spark, src, out, ckpt).awaitTermination(120)
    # land more pages, stream again
    pages_df(spark, 6, partitions=1, ).where(
        "url like '%page/3%'"
    ).write.mode("append").parquet(src)
    stream_extract(spark, src, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() > 10


def test_crawl_stats_stream_plan(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    pages_df(spark, 8, partitions=1).write.parquet(src)
    agg = crawl_stats_stream(spark, src)
    assert agg.isStreaming
    # run one availableNow cycle into memory sink
    q = (
        agg.writeStream.format("memory")
        .queryName("crawl_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from crawl_stats").collect()
    assert len(rows) > 0
    assert all(r["n_pages"] > 0 for r in rows)
