"""Checkpoint/resume protocol tests (SURVEY §5.3 idempotent resume)."""

import os

from page_segmentation_spark.datagen import pages_df
from page_segmentation_spark.plans.checkpoint import (
    read_result,
    run_checkpointed,
)
from page_segmentation_spark.plans.extract import extract


def test_checkpoint_resume_idempotent(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    pages = pages_df(spark, 24, partitions=2).cache()

    # first run: complete 2 of 4 buckets, then "crash"
    calls = {"n": 0}

    def job_crashing(df):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated crash")
        return extract(df)

    try:
        run_checkpointed(spark, pages, job_crashing, out, n_buckets=4)
    except RuntimeError:
        pass
    manifests = os.listdir(os.path.join(out, "_progress"))
    assert len(manifests) == 2

    # resume: only remaining buckets run
    summary = run_checkpointed(spark, pages, extract, out, n_buckets=4)
    assert summary["skipped"] == sorted(
        int(m.split("=")[1].split(".")[0]) for m in manifests
    )
    assert len(summary["completed"]) == 2

    # final table covers every url exactly once
    result = read_result(spark, out)
    assert result.count() == 24
    assert result.select("url").distinct().count() == 24

    # full re-run is a no-op
    summary2 = run_checkpointed(spark, pages, extract, out, n_buckets=4)
    assert summary2["completed"] == [] and len(summary2["skipped"]) == 4


def test_input_fingerprint_tracks_table_state(spark, tmp_path):
    """Snapshot-keyed resume (Iceberg-snapshot analog): same input ->
    same fingerprint -> skip; changed input -> new fingerprint ->
    recompute."""
    from page_segmentation_spark.plans.checkpoint import input_fingerprint

    src = str(tmp_path / "input")
    pages_df(spark, 8, partitions=1).write.mode("overwrite").parquet(src)
    fp1 = input_fingerprint(spark, src)
    assert fp1 == input_fingerprint(spark, src)  # stable

    out = str(tmp_path / "ckpt3")
    s1 = run_checkpointed(
        spark, spark.read.parquet(src), extract, out,
        n_buckets=2, fingerprint=fp1,
    )
    assert len(s1["completed"]) == 2

    # input "snapshot" advances: append more pages
    pages_df(spark, 4, partitions=1).write.mode("append").parquet(src)
    fp2 = input_fingerprint(spark, src)
    assert fp2 != fp1
    s2 = run_checkpointed(
        spark, spark.read.parquet(src), extract, out,
        n_buckets=2, fingerprint=fp2,
    )
    assert len(s2["completed"]) == 2  # stale manifests do not skip
    # appended doc_ids 0-3 collide with existing urls; extract dedups by
    # url, so the recomputed table still holds the 8 distinct urls
    assert read_result(spark, out).select("url").distinct().count() == 8


def test_checkpoint_fingerprint_invalidates(spark, tmp_path):
    out = str(tmp_path / "ckpt2")
    pages = pages_df(spark, 8, partitions=1)
    s1 = run_checkpointed(
        spark, pages, extract, out, n_buckets=2, fingerprint="v1"
    )
    assert len(s1["completed"]) == 2
    s2 = run_checkpointed(
        spark, pages, extract, out, n_buckets=2, fingerprint="v2"
    )
    assert len(s2["completed"]) == 2  # different settings -> recompute
