"""Small array/channel utilities (P5/P7 analogs).

gray_to_rgb (reference lib/util.py:4-9) replicates a single channel x3;
in the graft a scalar per-node feature widens to an n-channel array.
``remap_to_original`` is the P7/P8 ``preserving_resize`` /
``scale_to_original_shape`` analog: scores computed at a coarser
granularity are joined back to the full-resolution node table by key —
order-0 (nearest) semantics = take the coarse row's value verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def widen_channels(col: Column, n: int = 3) -> Column:
    """P5: scalar -> n-channel array (gray_to_rgb analog)."""
    return F.array_repeat(col.cast("double"), n)


def remap_to_original(
    original: DataFrame,
    coarse: DataFrame,
    keys: tuple = ("url",),
    value_cols: tuple = ("pred",),
    stride_col: str = "node_idx",
    stride: int = 1,
) -> DataFrame:
    """P7/P8: join coarse-granularity values back to the original table.

    ``coarse`` holds one row per (keys, stride_col) where stride_col is
    the coarse index; each original row maps to coarse index
    floor(stride_col / stride) — nearest-neighbour (order 0) remap,
    range-preserving by construction (values are carried, never
    interpolated; reference lib/util.py:21-29, lib/output.py:63-79)."""
    cidx = (F.col(stride_col) / stride).cast("long")
    right = coarse.select(
        *[F.col(k).alias(f"_c_{k}") for k in keys],
        F.col(stride_col).alias("_c_idx"),
        *[F.col(v) for v in value_cols],
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_c_{k}"))
    cond = cond & (cidx == F.col("_c_idx"))
    out = original.join(right, cond, "left")
    return out.drop(*[f"_c_{k}" for k in keys], "_c_idx")
