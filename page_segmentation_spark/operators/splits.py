"""Deterministic dataset splits (X2/X3 analogs).

The reference shuffles indices with ``np.random.shuffle`` and slices by
counts/fractions with one '-1 = remainder' slot (``single_split``,
lib/dataset.py:247-276) and builds k-folds by chunking
(``create_splits``, lib/dataset.py:279-289).  At 10^12 rows a shuffle is
impossible and non-reproducible; the engine uses md5-hash buckets of the
key — stable under repartitioning, resumable, and DuckDB-checkable.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from page_segmentation_spark.functions.hashing import h32

N_BUCKETS = 100


def bucket_col(key: Column) -> Column:
    return (h32(key.cast("string")) % N_BUCKETS).cast("int")


def single_split(
    df: DataFrame, key: str, fractions: Dict[str, float], out_col: str = "split"
) -> DataFrame:
    """Assign split labels by cumulative hash-bucket ranges.  Exactly one
    fraction may be -1 (remainder), mirroring the reference's validation
    (lib/dataset.py:252-263)."""
    rem = [k for k, v in fractions.items() if v == -1]
    if len(rem) > 1:
        raise ValueError("only one remainder (-1) slot allowed")
    known = sum(v for v in fractions.values() if v != -1)
    if known > 1.0 + 1e-9 or (not rem and abs(known - 1.0) > 1e-9):
        raise ValueError("fractions must total 1.0 (or use one -1 slot)")
    b = bucket_col(F.col(key))
    expr = None
    lo = 0
    for name, frac in fractions.items():
        if frac == -1:
            continue
        hi = lo + int(round(frac * N_BUCKETS))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    default = rem[0] if rem else list(fractions)[-1]
    expr = (expr if expr is not None else F.when(F.lit(False), "")).otherwise(
        default
    )
    return df.withColumn(out_col, expr)


def create_splits(df: DataFrame, key: str, k: int, out_col: str = "fold") -> DataFrame:
    """k-fold id per row; fold i's train set = complement (X3)."""
    return df.withColumn(out_col, (bucket_col(F.col(key)) % k).cast("int"))


def fold_train(df: DataFrame, fold: int, fold_col: str = "fold") -> DataFrame:
    return df.where(F.col(fold_col) != fold)


def fold_test(df: DataFrame, fold: int, fold_col: str = "fold") -> DataFrame:
    return df.where(F.col(fold_col) == fold)


def union_sections(dfs: Sequence[DataFrame]) -> DataFrame:
    """X4: section concat (train+test+eval 'all')."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
