"""JVM-side linear scorer (P9 inference analog).

The reference runs ``model.predict_on_batch`` one image at a time
(lib/network.py:248-260).  Here the classifier head is a fixed linear
scorer evaluated entirely inside Catalyst expressions: logits are a
sequential ``aggregate`` fold over ``zip_with(features, weights)`` —
bit-identical to the oracle's :func:`scorer_core.logit` — so no Python
worker is involved in the hot path at all (whole-stage codegen).

``pred_raw`` = first-max argmax (ties -> lowest class id, matching
np.argmax, reference lib/postprocess.py:23).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from page_segmentation_spark.functions import scorer_core as sc


def logit_col(cls: int, arch=None) -> Column:
    w_row = sc.WEIGHTS[cls] if arch is None else arch.weights[cls]
    bias = sc.BIAS[cls] if arch is None else arch.bias[cls]
    weights = F.array(*[F.lit(float(w)) for w in w_row])
    products = F.zip_with("features", weights, lambda f, w: f * w)
    return F.aggregate(
        products, F.lit(float(bias)), lambda acc, x: acc + x
    )


def with_logits(nodes: DataFrame, arch=None) -> DataFrame:
    out = nodes
    for cls in sc.CLASS_ORDER:
        out = out.withColumn(f"logit_{cls}", logit_col(cls, arch))
    return out


def with_pred(nodes: DataFrame) -> DataFrame:
    """First-max argmax over CLASS_ORDER using strict > comparisons
    (exactly the oracle's classify loop)."""
    l0, l1, l2 = (F.col(f"logit_{c}") for c in sc.CLASS_ORDER)
    best1 = F.when(l1 > l0, l1).otherwise(l0)
    cls1 = F.when(l1 > l0, F.lit(sc.CLASS_ORDER[1])).otherwise(
        F.lit(sc.CLASS_ORDER[0])
    )
    pred = F.when(l2 > best1, F.lit(sc.CLASS_ORDER[2])).otherwise(cls1)
    return nodes.withColumn("pred_raw", pred.cast("int"))


def score(nodes: DataFrame, arch=None) -> DataFrame:
    """``arch`` swaps in a named architecture's weights/bias (None =
    base; see functions/architectures.ARCHITECTURES)."""
    return with_pred(with_logits(nodes, arch))
