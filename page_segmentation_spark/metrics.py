"""Evaluation metrics as DataFrame aggregations (A4-A11).

Re-expresses the reference's measurement machinery over node tables with
``pred`` / ``label`` / ``is_fg`` columns:

  * fgpa                — foreground pixel accuracy (lib/image_ops.py:8-19)
  * fg_overlap_per_class— per-class IoU-ish tp/(tp+fp+fn) on foreground
                          (lib/image_ops.py:22-55)
  * count_matches       — TP/FP/FN for one label (lib/evaluation.py:8-22)
  * total_accuracy      — element equality rate (lib/evaluation.py:25-33)
  * f1_measures         — precision/recall/F1 with 0-guards
                          (lib/evaluation.py:36-49)
  * label_percentage    — majority-class baseline (lib/trainer.py:135-143)
  * cc_matching         — per-component TP/FP/FN by area-ratio thresholds
                          (lib/evaluation.py:52-68)
  * run_per_component   — grouped-map metric fan-out
                          (lib/evaluation.py:71-117) via applyInPandas

All are plain grouped conditional-sum aggregations — partial (map-side)
aggregation applies, one shuffle on the group keys.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_I = lambda c: c.cast("long")  # noqa: E731


def _cnt(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def fgpa(
    df: DataFrame,
    pred: str = "pred",
    label: str = "label",
    fg: str = "is_fg",
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(fg_count - mismatches_on_fg) / fg_count, optionally per group."""
    fgc = _cnt(F.col(fg))
    mism = _cnt(F.col(fg) & (F.col(pred) != F.col(label)))
    agg = ((fgc - mism).cast("double") / fgc.cast("double")).alias("fgpa")
    return df.groupBy(*(by or [])).agg(agg)


def fg_overlap_per_class(
    df: DataFrame,
    n_classes: int,
    pred: str = "pred",
    label: str = "label",
    fg: str = "is_fg",
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per class c (0..n_classes, where 0 == 'not classified' i.e. non-fg,
    matching the reference's (x+1)*bin-1 trick): rows (cls, tp, fp, fn,
    overlap).  overlap is NULL when the class never occurs (np.nan
    analog)."""
    # reference maps non-fg to class -1 then evaluates classes 0..n:
    # pfg = (pred+1)*bin - 1 ; class i of pfg == (fg AND pred == i-? ) —
    # classes are shifted by +1 in its loop (i in range(n+1) over the
    # shifted arrays).  We keep the same effective classes: for c in
    # 0..n_classes, actual = fg & (pred == c), expected = fg & (label==c).
    rows = []
    for c in range(n_classes + 1):
        a = F.col(fg) & (F.col(pred) == c)
        e = F.col(fg) & (F.col(label) == c)
        tp = _cnt(a & e)
        fp = _cnt(a & ~e)
        fn = _cnt(~a & e)
        denom = (tp + fp + fn).cast("double")
        overlap = F.when(denom > 0, tp.cast("double") / denom)
        rows.append(
            df.groupBy(*(by or [])).agg(
                F.lit(c).alias("cls"),
                tp.alias("tp"),
                fp.alias("fp"),
                fn.alias("fn"),
                overlap.alias("overlap"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def count_matches(
    df: DataFrame, cls: int, pred: str = "pred", label: str = "label"
) -> DataFrame:
    """TP/FP/FN for one class across two label columns (A7)."""
    a = F.col(pred) == cls
    e = F.col(label) == cls
    return df.agg(
        _cnt(a & e).alias("tp"), _cnt(a & ~e).alias("fp"), _cnt(~a & e).alias("fn")
    )


def total_accuracy(
    df: DataFrame,
    pred: str = "pred",
    label: str = "label",
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    return df.groupBy(*(by or [])).agg(
        F.avg((F.col(pred) == F.col(label)).cast("double")).alias("accuracy")
    )


def f1_cols(tp: Column, fp: Column, fn: Column) -> tuple[Column, Column, Column]:
    """precision/recall/F1 column arithmetic with the reference's 0-guards
    (lib/evaluation.py:36-49)."""
    d = lambda c: c.cast("double")  # noqa: E731
    prec = F.when(tp + fp > 0, d(tp) / d(tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, d(tp) / d(tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, 2.0 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return prec, rec, f1


def f1_measures(
    df: DataFrame, cls: int, pred: str = "pred", label: str = "label"
) -> DataFrame:
    counts = count_matches(df, cls, pred, label)
    prec, rec, f1 = f1_cols(F.col("tp"), F.col("fp"), F.col("fn"))
    return counts.select(
        "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def label_percentage(df: DataFrame, label: str = "label") -> DataFrame:
    """A4 majority-class baseline: fraction of rows per label.  The global
    total is a window over the (tiny, post-agg) label counts — no second
    scan of the input."""
    from pyspark.sql import Window

    counts = df.groupBy(label).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return counts.select(
        F.col(label),
        (F.col("cnt").cast("double") / total.cast("double")).alias("pct"),
    )


def cc_matching(
    df: DataFrame,
    threshold: float = 0.8,
    pred: str = "pred",
    label: str = "label",
    cc: str = "cc_id",
    by: Sequence[str] = ("url",),
) -> DataFrame:
    """A10: per component, TP if the matching-class ratio >= threshold on
    both directions, FP/FN otherwise (area-ratio thresholds,
    lib/evaluation.py:52-68, adapted to 1-D components)."""
    keys = list(by) + [cc]
    g = df.groupBy(*keys).agg(
        _cnt(F.col(pred) == F.col(label)).alias("match"),
        F.count(F.lit(1)).alias("size"),
    )
    ratio = F.col("match").cast("double") / F.col("size").cast("double")
    return g.select(
        *keys,
        "size",
        ratio.alias("match_ratio"),
        F.when(ratio >= threshold, 1).otherwise(0).alias("is_tp"),
        F.when(ratio < threshold, 1).otherwise(0).alias("is_fp"),
    )


def run_per_component(
    df: DataFrame,
    metric_fn: Callable,
    schema: str,
    cc: str = "cc_id",
    by: Sequence[str] = ("url",),
) -> DataFrame:
    """A11 grouped-map fan-out: apply any pandas metric function per
    (url, cc_id) group (the reference's per-component generator,
    lib/evaluation.py:112-117) — the engine's UDAF extension point."""
    return df.groupBy(*list(by), cc).applyInPandas(metric_fn, schema=schema)


def cc_relevance_filter(
    df: DataFrame,
    cls: int,
    ratio_threshold: float = 0.1,
    pred: str = "pred",
    label: str = "label",
    cc: str = "cc_id",
    by: Sequence[str] = ("url",),
) -> DataFrame:
    """F7: keep a component iff its GT-label ratio >= threshold OR any
    predicted element has the label (``ConnectedComponentEval.only_label``
    / ``_filter``, reference lib/evaluation.py:85-103) — a HAVING over
    per-component aggregates; rows of surviving components pass through."""
    keys = [*by, cc]
    g = df.groupBy(*keys).agg(
        (
            _cnt(F.col(label) == cls).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_gt_ratio"),
        _cnt(F.col(pred) == cls).alias("_n_pred"),
    )
    keep = g.where(
        (F.col("_gt_ratio") >= ratio_threshold) | (F.col("_n_pred") > 0)
    ).select(*keys)
    return df.join(keep, keys, "left_semi")
