"""Manifest ingestion tests (S2/S1 analogs)."""

import json

import pytest

from page_segmentation_spark.sources.manifest import (
    align_sources,
    load_manifest,
    select_section,
)


@pytest.fixture()
def manifest_path(tmp_path):
    m = {
        "train": [
            {"url": "u1", "line_hint": 40},
            {"url": "u2", "line_hint": 50},
        ],
        "test": [{"url": "u3", "line_hint": 60}],
        "eval": [{"url": "u4"}],
    }
    p = tmp_path / "manifest.json"
    p.write_text(json.dumps(m))
    return str(p)


def test_load_and_sections(spark, manifest_path):
    m = load_manifest(spark, manifest_path)
    assert m.count() == 4
    assert select_section(m, "train").count() == 2
    assert select_section(m, "all").count() == 4
    rows = {r["url"]: r["split"] for r in m.collect()}
    assert rows == {"u1": "train", "u2": "train", "u3": "test", "u4": "eval"}


def test_align_sources_verified(spark):
    a = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, x int")
    b = spark.createDataFrame([("u2", 20), ("u3", 30)], "url string, y int")
    out = align_sources([a, b], verify=True)
    assert [(r["url"], r["x"], r["y"]) for r in out.collect()] == [
        ("u2", 2, 20)
    ]


def test_align_sources_unverified_count_assert(spark):
    a = spark.createDataFrame([("u1", 1)], "url string, x int")
    b = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, y int")
    with pytest.raises(ValueError):
        align_sources([a, b], verify=False)
