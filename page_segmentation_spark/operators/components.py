"""Distributed connected components — duplicate-cluster formation.

The production step AFTER near-dup pair generation (minhash LSH /
simhash blocking, operators/dedup.py): pairs are edges of a similarity
graph; deduplication keeps one representative per connected component.
This is the standard corpus-dedup shape (CCNet / Gopher / RefinedWeb
all cluster candidate pairs before dropping duplicates) — a first-class
pipeline operator beyond the reference's inventory (the reference has
no dedup at all; build-brief extension, SURVEY §2.9).

Algorithm: iterated *min-label propagation with path shortcutting* —
each round every node takes the minimum label over itself and its
neighbors (one shuffle: edge-label join + hash groupBy-min), then
labels are shortcut through one pointer-jumping step
(``label <- label(label)``, one equi-join).  Labels only ever decrease
and never leave the component, so any fixed iteration count is SAFE
(under-iteration can only leave a component split, never merged), and
``iters`` rounds are guaranteed EXACT for every component whose nodes
all sit within ``iters`` hops of the component min — the propagation
bound; shortcutting accelerates beyond it in the typical case but an
adversarial id layout on a long path can still take one hop per round
(pinned by test_cc_under_iteration_never_merges_components).  Near-dup
clusters are dense and shallow (hub-and-spokes around the duplicated
content), so small fixed ``iters`` is exact in practice; batch jobs
that need unconditional exactness use ``*_converged``, which iterates
to the fixed point under a convergence count.  (Same problem family as
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14; this formulation favors two cheap equi-join shuffles per
round over the star-contraction edge rewrites.)

Scale notes: every round is two equi-joins and one hash aggregate keyed
by node/label id — all shuffle-partitioned, no broadcast of anything
O(V) or O(E), no quadratic step.  At 10^12 nodes the edge list (LSH
candidates) is the big side; it is scanned once per round, so total
cost is O(iters * |E|) with iters ~ log(diameter) — near-dup similarity
graphs have tiny diameters (dup clusters are dense), so 4-6 rounds is
the practical ceiling.  The action-free fixed-``iters`` form below
composes into one lazy Catalyst plan (driver-gate compatible); the
``*_converged`` variant adds the production driver loop (per-round
localCheckpoint to truncate lineage + a changed-label count to detect
the fixed point — job-level actions, same policy as
plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetric_edges(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Undirected edge list (src, dst) from canonical id_a < id_b pairs."""
    return pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )


def _one_round(labels: DataFrame, edges: DataFrame) -> DataFrame:
    """One propagate+shortcut round.  labels: (id, label)."""
    # propagate: every edge offers its src's label to its dst
    prop = (
        edges.alias("e")
        .join(labels.alias("l"), F.col("e.src") == F.col("l.id"))
        .select(F.col("e.dst").alias("id"), F.col("l.label").alias("label"))
    )
    labels = (
        labels.unionByName(prop)
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    # shortcut (pointer jumping): label <- label(label).  Every label value
    # is itself a node id (labels start as ids and min() only selects
    # existing ids), so the left join always matches; coalesce is a guard.
    parent = labels.select(
        F.col("id").alias("p_id"), F.col("label").alias("p_label")
    )
    return (
        labels.alias("x")
        .join(parent.alias("p"), F.col("x.label") == F.col("p.p_id"), "left")
        .select(
            F.col("x.id").alias("id"),
            F.coalesce(F.col("p.p_label"), F.col("x.label")).alias("label"),
        )
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 4,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Action-free fixed-iteration connected components.

    Returns (id, label) for EVERY node in ``nodes`` (singletons label
    themselves); label = min node id reachable within the iteration
    horizon — exact whenever every node is within ``iters`` hops of its
    component min (see module docstring for the sharpness of that
    bound); never merges distinct components regardless of ``iters``.

    ``truncate_lineage`` (default on) lazily localCheckpoints the edge
    list and each round's label table: each round references the
    previous labels up to 4x, so the naive composed plan grows O(4^k)
    subtree copies and Catalyst optimization time explodes long before
    the data does.  ``localCheckpoint(eager=False)`` replaces the
    subtree with a (lazily materialized, executor-persisted) RDD scan
    immediately — no driver action, each round computed exactly once.
    This is the standard iterative-algorithm discipline on Spark
    (GraphX/ALS checkpoint for the same reason); at cluster scale with
    unreliable executors a reliable ``checkpoint()`` dir is the
    drop-in upgrade.
    """
    edges = symmetric_edges(pairs, id_a, id_b)
    if truncate_lineage:
        edges = edges.localCheckpoint(eager=False)
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    )
    for _ in range(iters):
        labels = _one_round(labels, edges)
        if truncate_lineage:
            labels = labels.localCheckpoint(eager=False)
    return labels


def connected_components_checked(
    nodes: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 4,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Fixed-iteration components with an IN-PLAN convergence proof.

    Same lazy, action-free contract as :func:`connected_components`
    (composable into the driver gate's single Catalyst plan — no
    ``count()`` at construction time), but unconditionally exact OR a
    loud failure: one extra propagate+shortcut round is joined back on
    id and every output label passes through
    ``CASE WHEN label = label_next THEN label ELSE raise_error(...)``.
    Min-label propagation is monotone (labels only decrease) and
    idempotent at the fixed point, so round ``iters+1`` changing ANY
    label is exactly the statement that round ``iters`` had not
    converged — a fixture/threshold change producing a deeper component
    now fails the JOB with an explicit message instead of silently
    hash-mismatching the oracle (which computes exact reachability).
    The raise_error branch guards the output column itself, so column
    pruning cannot drop the check.  Cost over the unchecked form: one
    extra round plus one id-keyed equi-join — both hash-partitioned,
    no new scale hazard.
    """
    edges = symmetric_edges(pairs, id_a, id_b)
    if truncate_lineage:
        edges = edges.localCheckpoint(eager=False)
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    )
    for _ in range(iters):
        labels = _one_round(labels, edges)
        if truncate_lineage:
            labels = labels.localCheckpoint(eager=False)
    nxt = _one_round(labels, edges).withColumnRenamed(
        "label", "label_next"
    )
    return labels.join(nxt, "id").select(
        "id",
        F.when(
            F.col("label") == F.col("label_next"), F.col("label")
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "connected_components_checked: label still "
                        f"moving after iters={iters} rounds at id="
                    ),
                    F.col("id").cast("string"),
                    F.lit(" — raise iters or use *_converged"),
                )
            )
        )
        .alias("label"),
    )


def connected_components_converged(
    nodes: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> tuple[DataFrame, int]:
    """Production driver loop: iterate to the exact fixed point.

    Per round: localCheckpoint truncates the iterative lineage (the plan
    would otherwise grow O(iters) and re-derive the edge source every
    round) and a changed-label count detects convergence.  These are
    job-level driver actions — control flow, not data movement — under
    the same policy as plans/checkpoint.py:56.  Returns (labels, rounds).
    """
    edges = symmetric_edges(pairs, id_a, id_b).localCheckpoint()
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint()
    rounds = 0
    for _ in range(max_iters):
        new = _one_round(labels, edges).localCheckpoint()
        rounds += 1
        changed = (
            new.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels, rounds


def with_cluster_stats(labels: DataFrame) -> DataFrame:
    """Attach cluster_size (windowed integer count — determinism-safe)
    to a (id, label) component assignment."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("label")
    return labels.select(
        "id",
        F.col("label").alias("component_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def representatives(labels: DataFrame) -> DataFrame:
    """One row per component: the kept representative (= the component
    min id, i.e. the label itself) and the number of dropped dups."""
    return labels.groupBy(F.col("label").alias("component_id")).agg(
        F.count(F.lit(1)).alias("cluster_size"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
    )
