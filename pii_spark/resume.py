"""Checkpoint-resume: process only pages not yet committed (north rule).

Production semantics (documented for Iceberg; sandbox runs the same logic on
plain parquet because no Iceberg runtime jar ships in this container):

* results land in an Iceberg table via ``df.writeTo(tbl).append()`` — each
  run is ONE atomic snapshot; the snapshot id is the checkpoint token.
* on resume, read the table AS OF the last committed snapshot, take its
  ``url`` set, and LEFT ANTI JOIN the input against it — only unprocessed
  pages flow into the extraction pass.
* lineage rows (run_id, partition_id, docs, bytes, spans_by_type) append to a
  side table in the same transaction scope, so a run is replayable and
  auditable partition-by-partition.

The anti-join is a shuffle on ``url`` only when the committed side is large;
for typical incremental runs the committed-urls projection is a single
column that AQE plans as a broadcast. At 100 TB the committed side is read
column-pruned to ``url`` (an Iceberg/parquet scan of one dictionary-encoded
string column), which is why the anti-join stays cheap even at 10^12 rows —
never ``collect()`` it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pii_core.pipeline import ExtractConfig
from pii_spark.extract import extract_pages, lineage_from_results


def committed_urls(spark: SparkSession, results_dir: str) -> DataFrame | None:
    """Column-pruned projection of already-committed urls, or None if the
    target does not exist yet (first run)."""
    if not _exists(results_dir):
        return None
    return spark.read.parquet(results_dir).select("url")


def run_incremental(
    spark: SparkSession,
    pages: DataFrame,
    results_dir: str,
    lineage_dir: str,
    run_id: str,
    cfg: ExtractConfig | None = None,
    num_partitions: int | None = None,
) -> dict:
    """One resumable increment: anti-join committed urls, extract the
    remainder, append results + lineage. Returns counters for the run."""
    done = committed_urls(spark, results_dir)
    todo = pages if done is None else pages.join(done, "url", "left_anti")

    results = extract_pages(todo, cfg, num_partitions=num_partitions)
    results = results.persist()
    try:
        n = results.count()
        if n:
            # Lineage FIRST: its plan contains the anti-join against the
            # committed results dir, so it must run before this increment's
            # rows land there (the cache makes this cheap; the ordering makes
            # it correct even under cache eviction / executor loss).
            lineage = lineage_from_results(results, run_id)
            lineage.write.mode("append").parquet(lineage_dir)
            results.drop("partition_id").write.mode("append").parquet(results_dir)
        return {"run_id": run_id, "docs": n}
    finally:
        results.unpersist()


def lineage_summary(spark: SparkSession, lineage_dir: str) -> DataFrame:
    """Roll lineage up per run: docs, bytes, spans by type (map-merge)."""
    lin = spark.read.parquet(lineage_dir)
    exploded = lin.select(
        "run_id", "docs", "bytes", F.explode_outer("spans_by_type").alias("type", "n")
    )
    per_type = (
        exploded.where(F.col("type").isNotNull())
        .groupBy("run_id", "type").agg(F.sum("n").alias("n"))
        .groupBy("run_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("type", "n"))).alias("spans_by_type"))
    )
    totals = lin.groupBy("run_id").agg(
        F.sum("docs").alias("docs"), F.sum("bytes").alias("bytes"))
    return totals.join(per_type, "run_id", "left")


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(path)
    )
