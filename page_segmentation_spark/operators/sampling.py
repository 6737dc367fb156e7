"""Deterministic sampling & data-mixing operators.

Training-data pipelines downsample skewed sources (per-host caps,
language/temperature rebalancing a la CC-100/mC4) and need the sample
to be REPRODUCIBLE — the same row set on every run, every engine, every
partitioning.  Random sampling (``df.sample``) is none of those, so all
selection here is hash-threshold sampling: keep a row iff

    h32(id || ':' || salt)  <  rate * 2^32

with the portable md5-based h32 (functions/hashing.py), giving an exact
DuckDB oracle and salt-controlled independence between samples.  This
replaces the reference's ``np.random.shuffle`` split policy
(lib/dataset.py:270-276) at corpus scale, same discipline as
operators/splits.py.

Temperature rebalancing: per-stratum keep-rate

    rate(s) = sqrt(min_count / count(s))        (temperature alpha=0.5)

downsamples big strata toward a flatter distribution (the smallest
stratum keeps everything).  sqrt and a single division are both
IEEE-correctly-rounded, so the rate — and therefore the kept row set —
is bit-identical across engines; arbitrary alpha would need pow(),
which libms round differently (documented trade: the alpha knob is
fixed to the half-power family).

Scale notes: the rate table is one hash aggregate over the corpus plus
a 1-row global min; attaching it is a broadcast join (O(#strata) rows);
selection is pure column math.  No shuffle beyond the one counting
aggregate — the sample itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from page_segmentation_spark.functions.hashing import h32

#: 2^32 — h32's value universe; rate * SCALE is the keep threshold.
HASH_SCALE = 4294967296.0


def sample_hash_u(key: Column, salt: str) -> Column:
    """The sampling hash as a double in [0, 2^32)."""
    return h32(F.concat(key.cast("string"), F.lit(":" + salt))).cast("double")


def deterministic_sample(
    df: DataFrame, *, key_col: str, rate: float, salt: str
) -> DataFrame:
    """Keep each row iff its salted key hash falls under ``rate``.
    Reproducible across runs/engines/partitionings; different salts give
    independent samples of the same corpus."""
    return df.where(
        sample_hash_u(F.col(key_col), salt) < F.lit(rate * HASH_SCALE)
    )


def temperature_rates(
    df: DataFrame, *, stratum_col: str
) -> DataFrame:
    """Per-stratum keep-rates sqrt(min_n / n): (stratum, n_docs, rate)."""
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    global_min = counts.agg(F.min("n_docs").alias("min_n"))
    return counts.crossJoin(F.broadcast(global_min)).select(
        "stratum",
        "n_docs",
        F.sqrt(
            F.col("min_n").cast("double") / F.col("n_docs").cast("double")
        ).alias("rate"),
    )


def _with_rates(df: DataFrame, stratum_col: str) -> DataFrame:
    """df + broadcast-joined per-stratum ``rate`` column (internal join
    key aliased so a df column literally named 'stratum' can't clash)."""
    rates = temperature_rates(df, stratum_col=stratum_col).select(
        F.col("stratum").alias("__rate_stratum"), "rate"
    )
    return df.join(
        F.broadcast(rates), df[stratum_col] == F.col("__rate_stratum")
    ).drop("__rate_stratum")


def stratified_sample(
    df: DataFrame, *, stratum_col: str, key_col: str, salt: str
) -> DataFrame:
    """Temperature-rebalanced deterministic sample: attach the rate table
    (broadcast — O(#strata)) and keep rows under the per-stratum
    threshold.  Adds a ``rate`` column; drops nothing else."""
    joined = _with_rates(df, stratum_col)
    return joined.where(
        sample_hash_u(F.col(key_col), salt)
        < F.col("rate") * F.lit(HASH_SCALE)
    )


def stratified_sample_summary(
    df: DataFrame, *, stratum_col: str, key_col: str, salt: str
) -> DataFrame:
    """Per-stratum accounting of the temperature sample: (stratum,
    n_docs, n_kept, rate) — the audit table a mixing run logs."""
    joined = _with_rates(df, stratum_col)
    kept = (
        sample_hash_u(F.col(key_col), salt)
        < F.col("rate") * F.lit(HASH_SCALE)
    ).cast("long")
    return joined.groupBy(
        F.col(stratum_col).alias("stratum")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
        F.round(F.max("rate"), 6).alias("rate"),
    )


def token_budget_sample(
    df: DataFrame,
    *,
    group_col: str,
    tokens_col: str,
    key_col: str,
    budget: int,
    salt: str,
    mode: str = "rate",
) -> DataFrame:
    """Data-mixing by TOKEN budget: keep documents per group (language,
    source, domain bucket...) until the group's token budget is met —
    the unit that matters when composing a training mixture is tokens,
    not documents.

    ``mode="exact"`` (fixture/oracle form): documents order by their
    salted key hash (deterministic, engine-portable) and a per-group
    cumulative token sum keeps every document that STARTS under the
    budget — so the kept set always reaches at least ``budget`` tokens
    (unless the group is smaller) and is a prefix of the hash order.
    The running sum is one window per group: inherently sequential,
    single task per group — the fixture twin, not the crawl path.

    ``mode="rate"`` (scale path, default): ONE hash aggregate totals
    each group's tokens, the keep-rate min(1, budget/total) broadcasts
    back, and the same salted hash thresholds rows — zero windows, two
    map-side stages around one small agg; expected kept tokens ==
    budget with multiplicative concentration (documents are tiny vs a
    real budget).  Same hash, same salt: the rate sample of a group is
    NOT a prefix of the exact sample's order but draws from the same
    uniform key, so audits can compare them group by group."""
    u = sample_hash_u(F.col(key_col), salt)
    if mode == "exact":
        from pyspark.sql import Window

        w = (
            Window.partitionBy(group_col)
            .orderBy(u.asc(), F.col(key_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
        return (
            df.withColumn("__before", before)
            .where(F.col("__before") < budget)
            .drop("__before")
        )
    if mode != "rate":
        raise ValueError(f"unknown mode {mode!r}")
    totals = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.sum(tokens_col).alias("__total")
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(budget)) / F.col("__total").cast("double")
    )
    return (
        df.join(F.broadcast(totals), df[group_col] == F.col("__g"))
        .where(u < rate * F.lit(HASH_SCALE))
        .drop("__g", "__total")
    )
