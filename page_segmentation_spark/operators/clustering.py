"""Deterministic distributed k-means (Lloyd) over embedding columns.

Trains the coarse quantizer that :mod:`operators/similarity` consumes:
``ivf_topk`` / ``ivf_assign`` / ``semantic_dedup`` all take a centroid
table, and until now used fixed id-anchors standing in for trained
k-means.  ``kmeans_fit`` closes that loop in-engine (the reference
trains its models externally too — reference lib/trainer.py — so this
is a build-brief extension, SURVEY §2.9, not a parity item).

Determinism discipline (CLAUDE.md #3): a float ``SUM`` over an
unordered group is partitioning-dependent, so the centroid update is
computed on QUANTIZED integers —

    q(x)   = floor(x * 2^20)                  (exact: float32 -> double
                                               -> power-of-two scale)
    cmean  = floordiv(sum q(x), n) / 2^20     (integer floordiv, then
                                               one exact power-of-2
                                               division)

Integer sums are order-independent, so the fitted centroids are
bit-identical across partitionings, engines (DuckDB oracle twin), and
reruns.  The 2^-20 resolution (~1e-6) is far below float32 embedding
noise; the trade is documented, not hidden.  floordiv is spelled
``(s - mathmod(s, n)) / n`` with C-style ``%`` on BOTH engines — the
numerator is exactly divisible, so the double division is exact while
|s| < 2^53 (10^12 rows x 2^20 scale needs per-cluster sums < 2^53:
holds for unit-normalized embeddings up to ~10^13 members per cluster).

Scale shape per iteration: assignment is the zero-shuffle broadcast
fold of :func:`similarity.ivf_assign` (no corpus Exchange, no row
multiplication), and the update is ONE hash aggregate keyed by
``list_id`` with map-side partial combine over ``dim`` integer sums —
O(corpus) work, one shuffle of k x (dim+1) partial rows per map task.
Nothing O(corpus) is ever collected or broadcast.  Empty clusters keep
their previous centroid (standard Lloyd fallback), so k never decays.

``kmeans_fit`` is the driver loop form: ``iters`` chained steps.  By
default the chain stays lazy (action-free, composes into one Catalyst
plan that re-scans the corpus per iteration — Lloyd's inherent cost);
``materialize=True`` localCheckpoints the k-row centroid table between
iterations to truncate lineage for large ``iters`` (job-level actions,
same policy as components.connected_components_converged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from page_segmentation_spark.operators.similarity import ivf_assign

#: Quantization scale for the centroid update: 2^20 steps per unit.
QUANT = 1 << 20


def _mathmod(x, n):
    """Mathematical (non-negative) mod from C-style %, identical in
    Spark and DuckDB: ((x % n) + n) % n."""
    return ((x % n) + n) % n


def anchor_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic init: the embeddings of the first ``k`` ids (the
    same anchor convention as similarity.ivf_topk)."""
    return df.where(F.col(id_col) < k).select(
        F.col(id_col).cast("long").alias("list_id"),
        F.col(vec_col).alias("cvec"),
    )


def kmeans_step(
    df: DataFrame,
    centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration: assign every vector to its nearest centroid
    (cosine, first-max ties — similarity._nearest_list), then recompute
    each centroid as the quantized member mean.

    Returns (list_id, cvec array<double>, n_members) — empty clusters
    carry the previous centroid with n_members = 0."""
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    qsums = [
        F.sum(
            F.floor(F.col(vec_col)[i].cast("double") * QUANT).cast("long")
        ).alias(f"s_{i}")
        for i in range(dim)
    ]
    agg = assigned.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_members"), *qsums
    )
    n = F.col("n_members")
    mean_dims = [
        (
            (F.col(f"s_{i}") - _mathmod(F.col(f"s_{i}"), n)) / n / float(QUANT)
        ).alias(f"m_{i}")
        for i in range(dim)
    ]
    new = agg.select("list_id", n, *mean_dims).select(
        "list_id",
        "n_members",
        F.array(*[F.col(f"m_{i}") for i in range(dim)]).alias("new_cvec"),
    )
    prev = centroids.select(
        F.col("list_id").cast("long").alias("list_id"),
        F.transform(F.col("cvec"), lambda x: x.cast("double")).alias(
            "old_cvec"
        ),
    )
    return prev.join(new, "list_id", "left").select(
        "list_id",
        F.coalesce(F.col("new_cvec"), F.col("old_cvec")).alias("cvec"),
        F.coalesce(F.col("n_members"), F.lit(0)).cast("long").alias(
            "n_members"
        ),
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> DataFrame:
    """Lloyd k-means: ``iters`` chained :func:`kmeans_step` rounds from
    the deterministic anchor init.  Returns the final centroid table
    (list_id, cvec, n_members) — feed it to similarity.ivf_assign /
    semantic_dedup as the trained coarse quantizer."""
    cent = anchor_centroids(df, k, id_col=id_col, vec_col=vec_col)
    out = None
    for _ in range(iters):
        out = kmeans_step(df, cent, dim, id_col=id_col, vec_col=vec_col)
        cent = out.select("list_id", "cvec")
        if materialize:
            cent = cent.localCheckpoint()  # k rows; truncates lineage
    return out if out is not None else cent.withColumn(
        "n_members", F.lit(0).cast("long")
    )
