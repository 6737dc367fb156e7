"""Deterministic k-means (operators/clustering.py): Lloyd convergence on
separated clusters, partitioning invariance of the quantized update,
empty-cluster preservation, and the trained-quantizer handoff into
semantic_dedup."""

import pytest
from pyspark.sql import functions as F

from page_segmentation_spark.operators.clustering import (
    QUANT,
    anchor_centroids,
    kmeans_fit,
    kmeans_step,
)


def _df(spark, vecs, partitions=None):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    return df.repartition(partitions) if partitions else df


# Two tight direction cones: ids 0,2,4,6 near +x, ids 1,3,5 near +y.
# Anchors (ids 0 and 1) start one per cone, so one step converges.
CONES = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0]),
    (2, [1.0, 0.1, 0.0]),
    (3, [0.1, 1.0, 0.0]),
    (4, [1.0, 0.0, 0.1]),
    (5, [0.0, 1.0, 0.1]),
    (6, [1.0, 0.05, 0.05]),
]


def test_kmeans_step_quantized_means(spark):
    out = {
        r["list_id"]: r
        for r in kmeans_step(
            _df(spark, CONES), anchor_centroids(_df(spark, CONES), 2), dim=3
        ).collect()
    }
    assert out[0]["n_members"] == 4 and out[1]["n_members"] == 3
    # quantized mean of dim 0 in cluster 0: floor-div of integer sums
    qs = sum(int(v[0] * QUANT) for _, v in CONES if _ % 2 == 0)
    assert out[0]["cvec"][0] == (qs - qs % 4) / 4 / QUANT
    # cluster 1 mean points at +y
    assert out[1]["cvec"][1] > 0.9 and out[1]["cvec"][0] < 0.1


@pytest.mark.parametrize("parts", [1, 7])
def test_kmeans_fit_partitioning_invariant(spark, parts):
    """Integer-quantized sums make the fit bit-identical under any
    partitioning (a float SUM would drift in the last ulp)."""
    base = kmeans_fit(_df(spark, CONES), k=2, iters=3, dim=3).collect()
    alt = kmeans_fit(
        _df(spark, CONES, partitions=parts), k=2, iters=3, dim=3
    ).collect()
    as_map = lambda rows: {r["list_id"]: list(r["cvec"]) for r in rows}
    assert as_map(base) == as_map(alt)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # anchor 1 = [0,1]: every point (all on +x) is nearer anchor 0, so
    # cluster 1 goes empty and must keep its old centroid with n=0
    vecs = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.01])]
    df = _df(spark, vecs)
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "list_id long, cvec array<float>",
    )
    out = {r["list_id"]: r for r in kmeans_step(df, cent, dim=2).collect()}
    assert out[1]["n_members"] == 0
    assert list(out[1]["cvec"]) == [-1.0, 0.0]
    assert out[0]["n_members"] == 3


def test_kmeans_fit_improves_semantic_dedup_blocking(spark):
    """Trained centroids feed semantic_dedup: with anchors both inside
    one cone, untrained assignment lumps the cones together; after
    training, the clusters separate and cross-cone rows stop being
    compared (list_id differs per cone)."""
    from page_segmentation_spark.operators.similarity import semantic_dedup

    df = _df(spark, CONES)
    fitted = kmeans_fit(df, k=2, iters=3, dim=3)
    out = semantic_dedup(df, threshold=0.99, centroids=fitted).collect()
    lists = {r["vec_id"]: r["list_id"] for r in out}
    assert {lists[0], lists[2], lists[4], lists[6]} == {0}
    assert {lists[1], lists[3], lists[5]} == {1}
