"""Result sinks (S6/S8 analogs).

``output_data`` (reference lib/output.py:20-41) writes three mask
variants per record into directory trees; ``render_regions``
(lib/render.py:16-31) writes segment overlays.  The graft's sinks are
tables:

  * write_results   — the results table (url, extracted_text, spans,
                      n_nodes), bucket-partitioned by url hash so a
                      10^12-row append is balanced and partition-pruned
                      on read (the Iceberg-partition analog)
  * debug_overlay   — the overlay analog: per-node text with class
                      markers, for eyeballing classification quality
  * write_node_classes — the color-mask analog: per-node predicted class
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from page_segmentation_spark.functions.hashing import h32

DEFAULT_BUCKETS = 256


def write_results(
    results: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "append",
) -> None:
    """S6: append results partitioned by url-hash bucket."""
    (
        results.withColumn(
            "bucket", (h32(F.col("url")) % n_buckets).cast("int")
        )
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def write_node_classes(nodes: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Color-mask analog: the per-node class table."""
    nodes.select("url", "node_idx", "tag", "pred", "is_fg").write.mode(
        mode
    ).parquet(path)


_MARKS = {0: "·", 1: "█", 2: "▒"}  # boilerplate / main / media


def debug_overlay(nodes: DataFrame, max_chars: int = 40) -> DataFrame:
    """S8 render analog: one line per node, class-marked, in document
    order — collect per url into a printable overlay string."""
    mark = (
        F.when(F.col("pred") == 1, F.lit(_MARKS[1]))
        .when(F.col("pred") == 2, F.lit(_MARKS[2]))
        .otherwise(F.lit(_MARKS[0]))
    )
    line = F.concat(
        mark,
        F.lit(" ["),
        F.col("tag"),
        F.lit("] "),
        F.substring(F.col("text"), 1, max_chars),
    )
    return nodes.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("node_idx", line.alias("line")))
                ),
                lambda x: x.getField("line"),
            ),
            "\n",
        ).alias("overlay")
    )
