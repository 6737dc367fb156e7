"""Explicit skew handling: salting, two-phase aggregation, diagnostics.

North-rule requirement: partitioning/shuffle/skew handled explicitly.
The reference's only skew tactic is the ``max_width`` clamp on oversized
pages (lib/dataset.py:139-143); the engine's policy is:

  1. **Giant documents**: bounded at parse time (max_nodes cap,
     config.MAX_NODES_PER_DOC) because the CC/vote/span stages are
     whole-document windows — one url must fit one task.
  2. **Stateless stages** (per-node transforms, shingle explosion,
     feature extraction): salt with :func:`with_salt` /
     :func:`salted_repartition` so a hot key spreads over k tasks.
  3. **Skewed aggregations** whose combiner is associative:
     :func:`two_phase_agg` — partial agg on (key, salt), final on key.
     (Spark's hash aggregate already does map-side partial aggregation;
     use this only when the *reduce side* itself skews, e.g. huge
     collect_list groups.)
  4. **Skewed joins**: AQE skew-join splitting is enabled session-wide
     (session.get_spark) and repartitioning is adaptive.

``skew_report`` is the observability hook: per-key row-count quantiles
to decide which lever applies.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(
    df: DataFrame, n_salts: int = DEFAULT_SALTS, out_col: str = "salt"
) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): derived from a stable
    row hash (never rand() — resumability and retry-safety demand
    deterministic salting, and tests assert repartition-invariance).

    Assumes row-distinct input: fully duplicated rows hash to the same
    salt and still land in one reduce task.  If the hot key consists of
    identical rows, give the input a discriminating column first (an id,
    an offset) — do NOT mix in spark_partition_id(), which would make
    the salt depend on physical layout and break resumability."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(out_col, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_repartition(
    df: DataFrame, key: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Spread a hot key over n_salts partitions for stateless work."""
    salted = with_salt(df, n_salts)
    return salted.repartition(F.col(key), F.col("salt")).drop("salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Callable[[], List[Column]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Salted two-phase aggregation for associative aggregates: the
    partial phase shuffles on (keys..., salt) — a hot key becomes
    n_salts reduce tasks — and the final phase re-aggregates the tiny
    partial results on keys alone.

    ``aggs`` must return aggregate Columns that are valid for BOTH
    phases (sum/min/max/count-as-sum style), aliased with a prefix from
    the re-fold whitelist: ``sum_``/``n_``/``cnt_`` (re-summed) or
    ``min_``/``max_``.  Non-decomposable aggregates (avg_x, first_x)
    are rejected — re-summing them would be silently wrong."""
    partial = with_salt(df, n_salts).groupBy(*keys, "salt").agg(*aggs())
    return partial.groupBy(*keys).agg(
        *[
            _refold(c) for c in partial.columns
            if c not in set(keys) | {"salt"}
        ]
    )


_REFOLD_PREFIXES = ("sum_", "min_", "max_", "n_", "cnt_")


def _refold(name: str) -> Column:
    """Final-phase re-fold by alias convention: sum_*/n_*/cnt_* are
    summed, min_*/max_* take min/max; anything else raises."""
    if name.startswith("min_"):
        return F.min(name).alias(name)
    if name.startswith("max_"):
        return F.max(name).alias(name)
    if name.startswith(("sum_", "n_", "cnt_")):
        return F.sum(name).alias(name)
    raise ValueError(
        f"two_phase_agg alias {name!r} lacks a decomposable-aggregate "
        f"prefix {_REFOLD_PREFIXES}; non-decomposable aggregates (avg, "
        "first, ...) cannot be re-folded across salts"
    )


def skew_report(df: DataFrame, key: str) -> DataFrame:
    """Per-key cardinality distribution: max/p99/p90/median rows per key
    and the skew ratio (max / median) — decides whether salting or a cap
    is needed before a heavy stage."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("rows"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("rows").alias("max_rows"),
        F.expr("percentile(rows, 0.99)").alias("p99_rows"),
        F.expr("percentile(rows, 0.9)").alias("p90_rows"),
        F.expr("percentile(rows, 0.5)").alias("median_rows"),
        (
            F.max("rows").cast("double")
            / F.expr("percentile(rows, 0.5)")
        ).alias("skew_ratio"),
    )
