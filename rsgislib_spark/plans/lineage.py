"""Per-partition lineage + idempotent checkpoint/resume.

The north rule requires the job to "checkpoint per-partition with lineage
(input snapshot-id, cell range, row counts, pixel checksums) so a killed
run resumes idempotently".  The reference has no streaming/resume at all
(SURVEY.md §2.10) — its closest analog is transactional batched vector
writes (zonalstats/__init__.py:326, 20k-feature transactions).

Design (works identically on Iceberg; parquet stands in here):

* work is partitioned by spatial ``cell`` (the engine's universal
  partition key);
* a *lineage table* holds one row per completed cell:
  ``(cell, snapshot_id, n_rows, sum_phash, min_id, max_id)`` —
  ``sum_phash`` is the content checksum (order-independent int64 sum);
* ``run_resumable`` diff-joins the lineage table against the input's
  cell list and processes ONLY missing cells, appending data +
  lineage atomically per cell batch.  Killing the job between batches
  loses nothing; re-running skips completed cells (idempotent).

On Iceberg the lineage append and the data append share one snapshot
commit; with plain parquet we order writes (data first, lineage last)
and write the data with DYNAMIC partition overwrite: a crash between the
two writes leaves un-recorded data for some cells, and the resume pass
re-processes exactly those cells, *replacing* their partitions rather
than appending a duplicate copy — at-least-once execution, exactly-once
data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..geo.cellindex import DEFAULT_RES
from ..operators.spatial_join import with_point_cell

__all__ = ["lineage_records", "run_resumable", "completed_cells"]


def lineage_records(images: DataFrame, res: int = DEFAULT_RES,
                    snapshot_id: int = 0) -> DataFrame:
    """Per-cell lineage rows for an image table (order-independent).

    All aggregates are exact integers; ``sum_phash`` is the cheap
    content checksum (sums commute, so partitioning cannot change it).
    """
    return (
        with_point_cell(images, res=res)
        .groupBy("cell")
        # modular sum: overflow-proof at any cell population (the hot
        # megacity cell would overflow a raw int64 phash sum), still an
        # order-independent content checksum.
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(F.pmod(F.col("phash"), F.lit(1000003))).alias("sum_phash"),
             F.min("id").alias("min_id"),
             F.max("id").alias("max_id"))
        .withColumn("snapshot_id", F.lit(snapshot_id).cast("long"))
    )


def completed_cells(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Cells already recorded as done (empty frame if no lineage yet)."""
    if os.path.exists(lineage_path):
        return spark.read.parquet(lineage_path).select("cell").distinct()
    return spark.range(0).select(F.col("id").alias("cell"))


def run_resumable(images: DataFrame, out_dir: str, process,
                  res: int = DEFAULT_RES, snapshot_id: int = 0) -> int:
    """Process only cells without a lineage record; returns #cells done.

    ``process(df) -> DataFrame`` maps the pending slice (rows whose cell
    has no lineage row) to its output, which is written under
    ``{out_dir}/data`` partitioned by cell with dynamic partition
    overwrite (only the pending cells' partitions are replaced — a
    crashed run's partial data for those cells is discarded, not
    duplicated); the matching lineage rows are appended under
    ``{out_dir}/lineage`` *after* the data commit.
    """
    spark = images.sparkSession
    lineage_path = os.path.join(out_dir, "lineage")
    data_path = os.path.join(out_dir, "data")

    keyed = with_point_cell(images, res=res)
    done = completed_cells(spark, lineage_path)
    pending = keyed.join(done, "cell", "left_anti")

    todo = lineage_records(pending.drop("cell"), res=res,
                           snapshot_id=snapshot_id).persist()
    n_cells = todo.count()
    if n_cells == 0:
        todo.unpersist()
        return 0

    # dynamic overwrite only replaces partitions PRESENT in this run's
    # output: if ``process`` changed between attempts (or is
    # non-deterministic) and now emits no rows for a crashed cell, that
    # cell's stale partial data would survive while lineage marks it
    # complete.  Deleting the pending cells' partition directories up
    # front makes the replacement unconditional; a crash between the
    # delete and the write just leaves the cells pending again (no
    # lineage row yet), so the resume contract is unchanged.  On
    # Iceberg this is a single atomic replacePartitions commit.
    # Routed through the Hadoop FileSystem API so the delete is real on
    # ANY store the cluster can write (file:, hdfs:, s3a:, ...) — a
    # local os.path/shutil delete would silently no-op for non-local
    # URIs and reintroduce the stale-partial hazard (ADVICE r3).  Cell
    # ids are plain integers, so the ``cell=<n>`` directory name never
    # needs Hive escaping.
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    data_p = jvm.org.apache.hadoop.fs.Path(data_path)
    fs = data_p.getFileSystem(hconf)
    if fs.exists(data_p):
        for row in todo.select("cell").collect():
            d = jvm.org.apache.hadoop.fs.Path(data_path,
                                              f"cell={row.cell}")
            if fs.exists(d):
                fs.delete(d, True)

    out = process(pending)
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        # dynamic overwrite = replace ONLY the partitions present in
        # `out` (the pending cells); completed cells are untouched.
        out.write.mode("overwrite").partitionBy("cell").parquet(data_path)
    finally:
        spark.conf.set(mode_key, prev)
    todo.write.mode("append").parquet(lineage_path)
    todo.unpersist()
    return int(n_cells)
