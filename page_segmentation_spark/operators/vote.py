"""Connected-component majority vote + bbox postprocessors (A2/A3).

``vote_connected_component_class`` (reference lib/postprocess.py:9-26)
labels components of the *binary* image and overwrites each component's
prediction with its most frequent class, ties to the lowest class id
(np.argmax(bins[1:])).  1-D analog: a component is a maximal run of
consecutive foreground nodes sharing the same tag (glyph-scale structural
homogeneity; see oracle.cc_majority_vote).

Implemented join-free: per-(cc,class) counts via a window, then a windowed
max over an encoded ``count*4 + (3-class)`` key — max count wins, lowest
class id wins ties.  Both windows are satisfied by the existing ``url``
clustering (only local sorts, no new exchange).

The postprocessor registry mirrors the reference's
(lib/postprocess.py:45-64) so settings name stages the same way.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from page_segmentation_spark.operators.islands import with_islands


def with_cc_ids(nodes: DataFrame) -> DataFrame:
    """Component id for fg nodes (null for non-fg) — W6 analog.

    A component is homogeneous in (tag, container): a footer/aside
    paragraph is NOT the same structural component as an adjacent
    article paragraph even when the tags match — voting them together
    lets a big body run flip a furniture node to main (mirror:
    oracle.cc_majority_vote)."""
    keys = (
        ["is_fg", "tag", "container"]
        if "container" in nodes.columns
        else ["is_fg", "tag"]
    )
    marked = with_islands(nodes, keys, out_col="cc_id")
    return marked.withColumn(
        "cc_id", F.when(F.col("is_fg"), F.col("cc_id"))
    )


def cc_majority(nodes: DataFrame) -> DataFrame:
    """A2: overwrite fg nodes with their component's majority class."""
    marked = with_cc_ids(nodes)
    w_ccp = Window.partitionBy("url", "cc_id", "pred_raw")
    w_cc = Window.partitionBy("url", "cc_id")
    cnt = F.count(F.lit(1)).over(w_ccp)
    key = cnt.cast("long") * 4 + (3 - F.col("pred_raw"))
    win_key = F.max(F.when(F.col("cc_id").isNotNull(), key)).over(w_cc)
    voted = F.when(
        F.col("cc_id").isNotNull(), (3 - win_key % 4).cast("int")
    ).otherwise(F.col("pred_raw"))
    return marked.withColumn("pred", voted)


def bounding_boxes(nodes: DataFrame) -> DataFrame:
    """A3 analog of ``add_bounding_boxes`` (reference lib/postprocess.py:
    29-42): for each same-class island, fill its [min,max] node range with
    the class.  In 1-D islands are already contiguous, so this is the
    identity on island members — kept for registry parity and used by the
    spans stage via min/max extent aggregation."""
    col = "pred" if "pred" in nodes.columns else "pred_raw"
    marked = with_islands(nodes, [col], out_col="bbox_cc")
    w = Window.partitionBy("url", "bbox_cc")
    return (
        marked.withColumn("bbox_start", F.min("node_idx").over(w))
        .withColumn("bbox_end", F.max("node_idx").over(w))
    )


def identity(nodes: DataFrame) -> DataFrame:
    col = "pred" if "pred" in nodes.columns else "pred_raw"
    return nodes.withColumn("pred", F.col(col))


#: name -> stage, mirroring the reference's alias table
#: (lib/postprocess.py:56-64).
POSTPROCESSORS: Dict[str, Callable[[DataFrame], DataFrame]] = {
    "ccmajority": cc_majority,
    "cc_majority": cc_majority,
    "ccvote": cc_majority,
    "voteconnectedcomponents": cc_majority,
    "votecomponents": cc_majority,
    "boundingboxes": bounding_boxes,
    "bbox": bounding_boxes,
    "none": identity,
}


def find_postprocessor(key: str) -> Callable[[DataFrame], DataFrame]:
    return POSTPROCESSORS[key.lower().replace("-", "_").replace("__", "_")]
