"""Gaps-and-islands primitives (W1/W6 analogs).

The reference finds gaps with ``np.where(~indication)`` + consecutive-run
splitting (``_get_gaps``, lib/xycut.py:112-117) and labels 4-connected
components with ``cv2.connectedComponentsWithStats``
(lib/postprocess.py:10).  In 1-D node order both collapse to the classic
lag/-change-flag/running-sum island pattern — pure window functions, no
Python, no extra shuffle once data is clustered by ``url``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_islands(
    df: DataFrame,
    change_on: Sequence[str],
    partition_by: str = "url",
    order_by: str = "node_idx",
    out_col: str = "island_id",
) -> DataFrame:
    """Add a per-partition island id that increments whenever any of the
    ``change_on`` columns changes between consecutive rows (ordered by
    ``order_by``).  Island ids start at 1 and are dense per partition."""
    w = Window.partitionBy(partition_by).orderBy(order_by)
    change: Column = F.lit(False)
    for c in change_on:
        prev = F.lag(F.col(c)).over(w)
        change = change | prev.isNull() | (~F.col(c).eqNullSafe(prev))
    running = Window.partitionBy(partition_by).orderBy(order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        out_col, F.sum(F.when(change, 1).otherwise(0)).over(running)
    )
