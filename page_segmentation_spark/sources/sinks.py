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

Iceberg (north_rule: the production table is Iceberg): the sinks take a
``format`` parameter.  ``format="parquet"`` is the sandbox path (no
Iceberg runtime jars in this container); ``format="iceberg"`` is
config-complete — submit with

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hadoop   # or hive/rest
    --conf spark.sql.catalog.lake.warehouse=<warehouse path>

and pass ``format="iceberg", table="lake.db.results"``.  The bucket
column doubles as the Iceberg partition spec, so appends stay balanced
and reads partition-prune identically in both formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_segmentation_spark.functions.hashing import h32

DEFAULT_BUCKETS = 256
FORMATS = ("parquet", "iceberg")


def write_results(
    results: DataFrame, path: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS, mode: str = "append",
    format: str = "parquet", table: str | None = None,
) -> None:
    """S6: append results partitioned by url-hash bucket.

    ``format="parquet"`` writes ``path`` (directory layout, bucket=k
    subdirs); ``format="iceberg"`` writes catalog ``table`` via the V2
    writer (requires the Iceberg catalog conf — module docstring)."""
    if format not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {format!r}")
    out = results.withColumn(
        "bucket", (h32(F.col("url")) % n_buckets).cast("int")
    )
    if format == "parquet":
        if path is None:
            raise ValueError("format='parquet' requires path")
        out.write.mode(mode).partitionBy("bucket").parquet(path)
        return
    if table is None:
        raise ValueError("format='iceberg' requires table")
    writer = out.writeTo(table).using("iceberg").partitionedBy(F.col("bucket"))
    if mode == "overwrite":
        writer.createOrReplace()
    else:
        writer.createOrReplace() if mode == "create" else writer.append()


def read_results(
    spark: SparkSession, path: str | None = None, format: str = "parquet",
    table: str | None = None,
) -> DataFrame:
    """Read the results table back (partition-pruned on ``bucket`` in
    both formats)."""
    if format == "parquet":
        return spark.read.parquet(path)
    if format == "iceberg":
        return spark.read.format("iceberg").load(table)
    raise ValueError(f"format must be one of {FORMATS}, got {format!r}")


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    n_buckets: int = 32,
    sort_cols: tuple = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Spark-native bucketed table write (``bucketBy`` + ``saveAsTable``)
    — the co-location answer for url-keyed pipelines at 100 TB: two
    tables bucketed identically on the join key sort-merge-join with
    ZERO Exchange on either side (plan-audited in test_sinks), and a
    groupBy on the bucket column aggregates shuffle-free.  Use it for
    the hot repeated joins (results ⋈ node classes ⋈ annotations) where
    re-shuffling 10^12 rows per query would dominate the plan.

    Directory-``partitionBy`` (write_results) splits by VALUE for
    pruning; ``bucketBy`` splits by HASH for join/agg co-location — the
    two compose (Spark persists bucket spec in the catalog)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:  # external table at an explicit location
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


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
