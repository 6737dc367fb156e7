"""Similarity search over embedding columns (array<float>).

Training-data-pipeline first-class ops (build brief):

  * cosine / dot product as pure Catalyst array folds (zip_with +
    aggregate — JVM-side, no UDF)
  * brute_force_topk — exact top-k vs a query vector (the baseline)
  * lsh_bucket_topk  — random-hyperplane LSH-bucketed variant (the scale
    path: query only touches its bucket; hyperplanes derive from the
    portable md5 hash so results are deterministic and test-checkable)
  * embedding_neardup_pairs — all-pairs cosine >= threshold within LSH
    buckets (near-dup dedup on embeddings)
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from page_segmentation_spark.functions.hashing import h32_py


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.  One pass +
    TakeOrderedAndProject (no full sort); ties broken by id for
    determinism."""
    q = lit_vec(query)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def brute_force_topk_df(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str | None = None,
) -> DataFrame:
    """Action-free exact top-k: the query vector arrives as a ONE-ROW
    DataFrame broadcast onto the corpus (the Spark twin of the oracle's
    ``WITH q AS (SELECT ...)``) — plan construction runs no
    ``.first()``/collect, so the whole query stays lazy and composable
    (e.g. inside a larger pipeline or a stream).  Same scoring fold and
    tie-break as :func:`brute_force_topk`."""
    qcol = query_vec_col or vec_col
    q = query_df.select(F.col(qcol).alias("__qv"))
    scored = df.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def hyperplane_signs(n_planes: int, dim: int) -> List[List[float]]:
    """Deterministic ±1 hyperplanes from the portable hash (seedable,
    identical in tests/oracles)."""
    return [
        [1.0 if h32_py(f"hp_{p}_{i}") % 2 == 0 else -1.0 for i in range(dim)]
        for p in range(n_planes)
    ]


def with_lsh_bucket(
    df: DataFrame, vec_col: str, planes: List[List[float]]
) -> DataFrame:
    """Bucket id = sign-bit string over the hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = dot(F.col(vec_col), lit_vec(plane))
        bucket = bucket + F.when(proj > 0.0, F.lit(1 << j)).otherwise(0)
    return df.withColumn("lsh_bucket", bucket)


def lsh_bucket_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only the query's LSH bucket (approximate — trades recall
    for a 2^n_planes partition-pruned scan at scale)."""
    dim = len(query)
    planes = hyperplane_signs(n_planes, dim)
    qbucket = 0
    for j, plane in enumerate(planes):
        proj = sum(float(q) * w for q, w in zip(query, plane))
        if proj > 0.0:
            qbucket += 1 << j
    bucketed = with_lsh_bucket(df, vec_col, planes)
    cand = bucketed.where(F.col("lsh_bucket") == qbucket)
    q = lit_vec(query)
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def centroid_struct_array(centroids: DataFrame) -> DataFrame:
    """Collapse a (list_id, cvec) centroid table into ONE row holding
    ``carr = array<struct<list_id, cvec>>`` sorted by list_id.  Broadcast
    this single row onto the corpus and the IVF assignment becomes a pure
    projection (a fold over the array) — zero shuffle on the corpus side,
    zero row multiplication (the naive crossJoin(centroids) +
    row_number() window multiplies 10^12 rows by n_centroids and then
    shuffles the multiplied table)."""
    return centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("list_id"), F.col("cvec")))
        ).alias("carr")
    )


def _nearest_list(vec: Column, carr: Column) -> Column:
    """Argmax-cosine fold over the centroid array: strict ``>`` keeps the
    FIRST max, and carr is sorted by list_id, so ties break to the lowest
    list_id (same first-max rule as the scorer argmax)."""
    vn = norm(vec)
    init = F.struct(
        F.lit(-1).cast("long").alias("list_id"),
        F.lit(-2.0).alias("cos_c"),
    )

    def step(acc: Column, c: Column) -> Column:
        cos_c = dot(vec, c["cvec"]) / (vn * norm(c["cvec"]))
        return F.when(
            cos_c > acc["cos_c"],
            F.struct(
                c["list_id"].cast("long").alias("list_id"),
                cos_c.alias("cos_c"),
            ),
        ).otherwise(acc)

    return F.aggregate(carr, init, step)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (cosine, first-max ties to the lowest list_id).

    Plan shape: the centroid table collapses to a single broadcast row
    (centroid_struct_array) and the argmax is a projection-side fold —
    the corpus stage has NO Exchange and NO row multiplication
    (plan-audited in tests/test_plan_audits.py).  At 10^12 rows, write
    the result bucketed by list_id so probes become partition-pruned
    scans."""
    carr = centroid_struct_array(centroids)
    out = df.crossJoin(F.broadcast(carr))  # 1-row scalar attach
    best = _nearest_list(F.col(vec_col), F.col("carr"))
    return out.select(id_col, vec_col, best["list_id"].alias("list_id"))


def _probe_lists(carr: Column, q: Column, n_probe: int) -> Column:
    """The ``n_probe`` list_ids nearest the query, computed in-plan from
    the broadcast centroid array (no driver-side collect): sort the array
    by (-cosine, list_id), slice, project the ids."""
    ranked = F.array_sort(
        F.transform(
            carr,
            lambda c: F.struct(
                (-cosine(c["cvec"], q)).alias("neg_cos"),
                c["list_id"].cast("long").alias("list_id"),
            ),
        )
    )
    return F.transform(
        F.slice(ranked, 1, n_probe), lambda s: s["list_id"]
    )


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: inverted-file search — coarse-quantize the corpus into
    ``n_centroids`` lists, probe only the ``n_probe`` lists nearest the
    query, exact cosine top-k within the probed lists.

    Deterministic coarse quantizer: the centroids are the embeddings of
    the first ``n_centroids`` ids (fixed anchors standing in for trained
    k-means — the IVF SHAPE is the point: at 10^12 rows the probed lists
    are a partition-pruned fraction n_probe/n_centroids of the corpus,
    vs the brute-force full scan).  Plan construction is ACTION-FREE:
    probe selection is a sort-slice expression over the broadcast
    centroid array, and assignment is the zero-shuffle fold of
    ivf_assign."""
    cent = df.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("list_id"), F.col(vec_col).alias("cvec")
    )
    carr = centroid_struct_array(cent)
    q = lit_vec(query)
    out = df.crossJoin(F.broadcast(carr))
    best = _nearest_list(F.col(vec_col), F.col("carr"))
    probes = _probe_lists(F.col("carr"), q, n_probe)
    cand = out.where(F.array_contains(probes, best["list_id"]))
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def ivf_topk_df(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_centroids: int = 4,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str | None = None,
) -> DataFrame:
    """Action-free IVF ANN: like :func:`ivf_topk` but the query vector
    arrives as a ONE-ROW DataFrame broadcast onto the corpus (two 1-row
    broadcast attaches: centroid array + query) — no driver action
    anywhere in plan construction.  Probe selection and assignment are
    the same in-plan folds, so results match :func:`ivf_topk` for the
    same query vector."""
    qcol = query_vec_col or vec_col
    qdf = query_df.select(F.col(qcol).alias("__qv"))
    cent = df.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("list_id"), F.col(vec_col).alias("cvec")
    )
    carr = centroid_struct_array(cent)
    out = df.crossJoin(F.broadcast(carr)).crossJoin(F.broadcast(qdf))
    best = _nearest_list(F.col(vec_col), F.col("carr"))
    probes = _probe_lists(F.col("carr"), F.col("__qv"), n_probe)
    cand = out.where(F.array_contains(probes, best["list_id"]))
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, blocked by LSH bucket
    (exact within bucket; at scale the bucket join replaces the quadratic
    cross product).  ``dim`` is an explicit parameter (the embedding
    dimension is a pipeline constant) so plan construction runs no
    driver-side action."""
    planes = hyperplane_signs(n_planes, dim)
    b = with_lsh_bucket(df, vec_col, planes).select(
        F.col(id_col).alias("sid"), F.col(vec_col).alias("vec"), "lsh_bucket"
    )
    x, y = b.alias("x"), b.alias("y")
    cand = x.join(
        y,
        (F.col("x.lsh_bucket") == F.col("y.lsh_bucket"))
        & (F.col("x.sid") < F.col("y.sid")),
    )
    sim = F.round(cosine(F.col("x.vec"), F.col("y.vec")), 6)
    return cand.select(
        F.col("x.sid").alias("id_a"),
        F.col("y.sid").alias("id_b"),
        sim.alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)


def semantic_dedup(
    df: DataFrame,
    n_centroids: int = 4,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding corpus, then mark as
    duplicates the members whose cosine to a LOWER-id member of the SAME
    cluster reaches ``threshold``.  Keep rule = lowest id (deterministic,
    oracle-expressible; the paper keeps the point farthest from the
    centroid — same cluster-blocked shape, different tie policy).

    Scale shape: assignment is the zero-shuffle broadcast-fold of
    :func:`ivf_assign`; the pair search is an equi-join on the cluster id
    (one hash shuffle keyed by ``list_id``) so the quadratic term is
    bounded by the largest CLUSTER, never the corpus — exactly the
    SemDeDup recipe for 10^9+ corpora (k is chosen so clusters fit an
    executor).  A DEGENERATE quantizer (one hot cluster — untrained
    centroids on clumped data) re-quadratizes the pair stage on a single
    reduce task; ``max_cluster_size`` guards it: clusters larger than
    the cap salt-split their self-join — each member carries a
    deterministic salt in [0, ceil(size/cap)), the candidate (lower-id)
    side replicates once per salt, and the join keys on
    (list_id, salt), so a hot cluster becomes ceil(size/cap) reduce
    tasks with ~cap probe rows each while the pair SET (and hence the
    output) is unchanged — the same two-phase discipline as
    operators/skew.two_phase_agg, applied to a self-join.
    Deterministic coarse quantizer: centroids default to the embeddings
    of the first ``n_centroids`` ids (fixed anchors, same convention as
    :func:`ivf_topk`); pass ``centroids`` (a (list_id, cvec) table, e.g.
    the output of clustering.kmeans_fit) to dedup against a TRAINED
    quantizer instead.

    Output: one row per input — (id, list_id, keep) with keep=1 for the
    retained representative set, keep=0 for semantic duplicates.

    Thresholding happens on the ROUNDED (6-dp) cosine so the Spark and
    DuckDB sides agree bit-for-bit at the boundary.
    """
    if centroids is None:
        centroids = df.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("list_id"), F.col(vec_col).alias("cvec")
        )
    assigned = ivf_assign(
        df, centroids.select("list_id", "cvec"), id_col=id_col, vec_col=vec_col
    )
    a = assigned.select(
        F.col(id_col).alias("aid"),
        F.col(vec_col).alias("avec"),
        F.col("list_id").alias("alist"),
    )
    b = assigned.select(
        F.col(id_col).alias("bid"),
        F.col(vec_col).alias("bvec"),
        F.col("list_id").alias("blist"),
    )
    if max_cluster_size is None:
        cand = a.join(
            b, (F.col("alist") == F.col("blist")) & (F.col("bid") < F.col("aid"))
        )
    else:
        # per-cluster salt count: ceil(size / cap); size-1 clusters get 1
        sizes = assigned.groupBy("list_id").agg(
            F.ceil(
                F.count(F.lit(1)) / F.lit(max_cluster_size)
            ).cast("int").alias("n_salts_c")
        )
        a2 = a.join(
            F.broadcast(sizes), F.col("alist") == F.col("list_id")
        ).select(
            "aid", "avec", "alist",
            F.pmod(
                F.crc32(F.col("aid").cast("string")), F.col("n_salts_c")
            ).cast("int").alias("asalt"),
        )
        b2 = b.join(
            F.broadcast(sizes), F.col("blist") == F.col("list_id")
        ).select(
            "bid", "bvec", "blist",
            F.explode(
                F.sequence(F.lit(0), F.col("n_salts_c") - 1)
            ).alias("bsalt"),
        )
        cand = a2.join(
            b2,
            (F.col("alist") == F.col("blist"))
            & (F.col("asalt") == F.col("bsalt"))
            & (F.col("bid") < F.col("aid")),
        )
    dup = (
        cand.where(
            F.round(cosine(F.col("avec"), F.col("bvec")), 6) >= threshold
        )
        .select(F.col("aid"))
        .distinct()
    )
    return (
        assigned.join(dup, assigned[id_col] == dup["aid"], "left")
        .select(
            F.col(id_col),
            F.col("list_id"),
            F.col("aid").isNull().cast("int").alias("keep"),
        )
    )
