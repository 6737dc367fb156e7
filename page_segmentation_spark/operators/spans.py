"""Span formation: dilate -> gap merge -> islands -> trim (W1-W4, P15).

Re-expression of the reference's segmentation stage
(``find_segments``, lib/pc_segmentation.py:24-60):

  * dilation (lib/pc_segmentation.py:63-67)  -> windowed max over ±radius;
  * gap filter  (``split_size``, lib/xycut.py:166) -> interior zero-runs
    shorter than split_size are merged into the surrounding segment
    (sentinel border gaps are never merged, lib/xycut.py:165);
  * segment filter (``px_threshold``, lib/xycut.py:148,170) -> spans must
    contain >= min_main raw main nodes;
  * spans are trimmed to raw-main extents (segments cover exactly the
    content extent between gaps) and emitted in document order
    (order preservation, lib/pc_segmentation.py:114-116).

Thresholds derive from the per-doc normalization stat (W4,
lib/pc_segmentation.py:37-42) via integer-only logic in
:func:`page_segmentation_spark.config.derive_thresholds`.

Everything is window/column math over the existing ``url`` clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from page_segmentation_spark.config import (
    CLS_MAIN,
    HEADING_TAGS,
    ExtractSettings,
)
from page_segmentation_spark.operators.islands import with_islands


def with_spans(nodes: DataFrame, settings: ExtractSettings) -> DataFrame:
    """Input: node table with pred, is_fg, char_med, n_nodes.
    Output: adds ``selected`` (node contributes to extraction),
    ``span_start``, ``span_end``, ``span_main`` (null outside spans)."""
    w_ord = Window.partitionBy("url").orderBy("node_idx")

    # W4 threshold derivation (mirror config.derive_thresholds)
    split_size = F.when(F.col("char_med") >= 40.0, F.lit(2)).otherwise(F.lit(3))
    min_main = F.lit(settings.min_main_nodes)

    ind = (
        (F.col("pred") == F.lit(CLS_MAIN)) & F.col("is_fg")
    ).cast("int")
    df = nodes.withColumn("ind", ind)

    # P15 dilation: windowed max, radius r
    r = settings.dilate_radius
    df = df.withColumn(
        "dil", F.max("ind").over(w_ord.rowsBetween(-r, r))
    )

    # interior zero-runs < split_size flip to 1 (gap merge)
    df = with_islands(df, ["dil"], out_col="zisl")
    w_z = Window.partitionBy("url", "zisl")
    df = (
        df.withColumn("z_len", F.count(F.lit(1)).over(w_z))
        .withColumn("z_min", F.min("node_idx").over(w_z))
        .withColumn("z_max", F.max("node_idx").over(w_z))
    )
    interior = (F.col("z_min") > 0) & (F.col("z_max") < F.col("n_nodes") - 1)
    df = df.withColumn(
        "merged",
        F.when(
            (F.col("dil") == 0) & interior & (F.col("z_len") < split_size),
            F.lit(1),
        ).otherwise(F.col("dil")),
    ).drop("zisl", "z_len", "z_min", "z_max")

    # islands of merged==1 -> candidate spans, trimmed to raw-main
    # extents; then the trailing-heading trim: a heading at the very end
    # of a span announces content that lies OUTSIDE the span (the next /
    # boilerplate section — e.g. an aside's "Related" header), so the
    # span ends at its last non-heading main node instead.  A span whose
    # main nodes are ALL headings has no content at all and is dropped
    # (span_end stays null -> keep is false).
    df = with_islands(df, ["merged"], out_col="sisl")
    w_s = Window.partitionBy("url", "sisl")
    in_span = F.col("merged") == 1
    is_heading = F.col("tag").isin(*sorted(HEADING_TAGS))
    main_idx = F.when(F.col("ind") == 1, F.col("node_idx"))
    df = (
        df.withColumn(
            "span_start", F.when(in_span, F.min(main_idx).over(w_s))
        )
        .withColumn(
            "span_end",
            F.when(
                in_span,
                F.max(
                    F.when(
                        (F.col("ind") == 1) & ~is_heading, F.col("node_idx")
                    )
                ).over(w_s),
            ),
        )
        .withColumn(
            "span_main",
            F.when(
                in_span,
                F.sum(
                    F.when(
                        (F.col("ind") == 1)
                        & (F.col("node_idx") <= F.col("span_end")),
                        1,
                    ).otherwise(0)
                ).over(w_s),
            ),
        )
    )
    keep = F.coalesce(
        in_span
        & (F.col("span_main") >= min_main)
        & F.col("span_start").isNotNull()
        & F.col("span_end").isNotNull()
        & F.col("node_idx").between(F.col("span_start"), F.col("span_end")),
        F.lit(False),
    )
    return (
        df.withColumn("in_kept_span", keep)
        .withColumn("selected", keep & F.col("is_fg") & _not_pure_link())
        .drop("sisl", "merged", "dil", "ind")
    )


def _not_pure_link():
    """Extraction guard (mirror: oracle.extract_document): a node inside a
    span is emitted unless it is non-main AND (entirely link text OR in a
    boilerplate container) — the gap-merge bridges short interior runs
    for connectivity, and a bridged fully-link node (inline ad /
    related-links block) or a bridged boiler-container node (template
    promo, share bar: html_parse class hints resolve those to 'aside')
    is not content.  Nodes the vote kept as main are always emitted."""
    from page_segmentation_spark.functions.scorer_core import (
        BOILER_CONTAINERS,
    )

    return (F.col("ind") == 1) | (
        (F.col("n_link_chars") < F.col("n_chars"))
        & ~F.col("container").isin(*sorted(BOILER_CONTAINERS))
    )


def xycut_spans(nodes: DataFrame, settings: ExtractSettings) -> DataFrame:
    """Faithful 1-D re-expression of the recursive XY-cut (W3,
    ``recursive_cut``/``_get_segments``, reference lib/xycut.py:127-173):

      * gaps = maximal zero-runs of the indicator; only gaps with
        length >= split_size survive as cut points (lib/xycut.py:166);
      * segments = maximal regions between kept gaps (they swallow the
        short interior gaps) with length > px_threshold
        (lib/xycut.py:170);
      * recursion terminates at depth 1: DOM order has a single axis, so
        the axis-flipped subproblem is the identity and re-cutting a
        segment with the same thresholds finds no further kept gaps —
        the reference's fixed point is reached immediately.

    Produces the same output columns as :func:`with_spans`.
    """
    split_size = F.when(F.col("char_med") >= 40.0, F.lit(2)).otherwise(F.lit(3))
    px_threshold = F.lit(settings.min_main_nodes)

    ind = ((F.col("pred") == F.lit(CLS_MAIN)) & F.col("is_fg")).cast("int")
    df = nodes.withColumn("ind", ind)

    # gap runs and the kept-gap mask
    df = with_islands(df, ["ind"], out_col="gisl")
    w_g = Window.partitionBy("url", "gisl")
    df = df.withColumn("g_len", F.count(F.lit(1)).over(w_g)).withColumn(
        "in_kept_gap",
        (F.col("ind") == 0) & (F.col("g_len") >= split_size),
    )

    # segments between kept gaps
    df = with_islands(df, ["in_kept_gap"], out_col="sisl")
    w_s = Window.partitionBy("url", "sisl")
    in_seg = ~F.col("in_kept_gap")
    df = (
        df.withColumn("seg_len", F.count(F.lit(1)).over(w_s))
        .withColumn(
            "span_main", F.when(in_seg, F.sum("ind").over(w_s))
        )
        .withColumn("span_start", F.when(in_seg, F.min("node_idx").over(w_s)))
        .withColumn("span_end", F.when(in_seg, F.max("node_idx").over(w_s)))
    )
    keep = in_seg & (F.col("seg_len") > px_threshold) & (F.col("span_main") > 0)
    return (
        df.withColumn("in_kept_span", keep)
        .withColumn("selected", keep & F.col("is_fg") & _not_pure_link())
        .drop("gisl", "g_len", "in_kept_gap", "sisl", "seg_len", "ind")
    )


def morphological_spans(nodes: DataFrame, settings: ExtractSettings) -> DataFrame:
    """1-D re-expression of the morphological variant
    (``get_text_contours``, reference lib/pc_segmentation.py:70-116):
    close(k1) -> open(k_open) -> dilate(k1)+close(k1) over the main-
    content indicator, with kernel widths derived from the per-doc
    normalization stat (W4); contiguous runs of the result become spans
    in document order (contours reversed to reading order,
    lib/pc_segmentation.py:116 == orderBy span_start).

    close = windowed max then min; open = min then max (P15/P16).
    """
    w_ord = Window.partitionBy("url").orderBy("node_idx")

    def wmax(c, r):
        return F.max(c).over(w_ord.rowsBetween(-r, r))

    def wmin(c, r):
        return F.min(c).over(w_ord.rowsBetween(-r, r))

    # W4 width derivation, integer-only (char_height / char_height/3 /
    # char_height/1.1 analog at node granularity)
    k1 = 2  # close width
    k_open = 1  # noise-removal width (k1 // 3 rounded up)

    ind = ((F.col("pred") == F.lit(CLS_MAIN)) & F.col("is_fg")).cast("int")
    df = nodes.withColumn("ind", ind)
    df = df.withColumn("m1", wmin(wmax(F.col("ind"), k1), k1))  # close
    df = df.withColumn("m2", wmax(wmin(F.col("m1"), k_open), k_open))  # open
    df = df.withColumn("m3", wmin(wmax(wmax(F.col("m2"), k1), k1), k1))
    # ^ dilate(k1) then close(k1) (max, then max+min)

    df = with_islands(df, ["m3"], out_col="sisl")
    w_s = Window.partitionBy("url", "sisl")
    in_seg = F.col("m3") == 1
    df = (
        df.withColumn(
            "span_main", F.when(in_seg, F.sum("ind").over(w_s))
        )
        .withColumn("span_start", F.when(in_seg, F.min("node_idx").over(w_s)))
        .withColumn("span_end", F.when(in_seg, F.max("node_idx").over(w_s)))
    )
    keep = in_seg & (F.col("span_main") >= F.lit(settings.min_main_nodes))
    return (
        df.withColumn("in_kept_span", keep)
        .withColumn("selected", keep & F.col("is_fg") & _not_pure_link())
        .drop("sisl", "m1", "m2", "m3", "ind")
    )


#: span-former registry (the post-processor-registry pattern, SURVEY §2.8)
SPAN_FORMERS = {
    "default": with_spans,
    "xycut": xycut_spans,
    "morphological": morphological_spans,
}
