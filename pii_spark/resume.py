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
from pii_spark.extract import RESULTS_WITH_PID, extract_pages, lineage_from_results


def _committed_schema():
    """Explicit read schema for the results dir: pins the hive partition
    column run_id to STRING. Without it, partition-type inference turns
    numeric-looking run ids ("007") into integers, and the read-back value
    ("7") no longer equals the id the caller passed — silently matching
    zero rows."""
    from pyspark.sql import types as T  # noqa: PLC0415

    return T.StructType(
        RESULTS_WITH_PID.fields
        + [T.StructField("run_id", T.StringType(), False)]
    )


def committed_urls(spark: SparkSession, results_dir: str) -> DataFrame | None:
    """Column-pruned projection of already-committed urls, or None if the
    target holds no data yet (first run)."""
    if not _exists(results_dir):
        return None
    return spark.read.schema(_committed_schema()).parquet(
        results_dir).select("url")


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
    remainder, commit results, derive lineage FROM the committed files.
    Returns counters for the run.

    Commit protocol (crash-safe, never double-counts):
    1. Results land first, hive-partitioned by run_id. The write is the ONLY
       action that executes the extraction UDF — exactly one pass, no
       persist() needed and no re-extraction under cache eviction.
    2. Lineage derives from the COMMITTED parquet, partition-pruned to this
       run_id, so a lineage row can never describe a document that failed to
       land.
    A crash between (1) and (2) leaves a run with results but no lineage;
    the next increment's anti-join still skips its urls (no re-extraction),
    and ``backfill_lineage`` repairs the gap from the committed files.

    ``run_id`` must be FRESH per increment — it names this run's results
    partition and lineage rows, so reusing one would make both ambiguous
    (docs/lineage would cover every increment sharing the id). A reused id
    raises before anything is written; after a crash, repair the old run
    with ``backfill_lineage`` and retry under a new id.
    """
    run_id = str(run_id)
    if _exists(results_dir):
        prior = (
            spark.read.schema(_committed_schema()).parquet(results_dir)
            .where(F.col("run_id") == run_id).limit(1).count()
        )
        if prior:
            raise ValueError(
                f"run_id {run_id!r} already has committed results; use a "
                "fresh run_id per increment (backfill_lineage repairs a "
                "crashed run's missing lineage)")

    done = committed_urls(spark, results_dir)
    todo = pages if done is None else pages.join(done, "url", "left_anti")

    results = extract_pages(todo, cfg, num_partitions=num_partitions)
    (
        results.withColumn("run_id", F.lit(run_id))
        .write.mode("append").partitionBy("run_id").parquet(results_dir)
    )
    if not _exists(results_dir):  # first run over an empty input
        return {"run_id": run_id, "docs": 0}
    committed = spark.read.schema(_committed_schema()).parquet(
        results_dir).where(F.col("run_id") == run_id)
    n = committed.count()
    if n:
        lineage = lineage_from_results(committed, run_id)
        lineage.write.mode("append").parquet(lineage_dir)
    return {"run_id": run_id, "docs": n}


def backfill_lineage(
    spark: SparkSession, results_dir: str, lineage_dir: str
) -> list[str]:
    """Repair lineage for runs whose results committed but whose lineage
    write was lost (crash between the two writes in ``run_incremental``).
    Recomputes the missing runs' lineage from the committed results
    partitions — the committed files are the source of truth, so the
    backfilled counters are exactly what the crashed run would have written.
    Returns the repaired run ids (the run-id list is tiny — one per job)."""
    if not _exists(results_dir):
        return []
    res = spark.read.schema(_committed_schema()).parquet(results_dir)
    runs = res.select("run_id").distinct()
    if _exists(lineage_dir):
        have = spark.read.parquet(lineage_dir).select("run_id").distinct()
        runs = runs.join(have, "run_id", "left_anti")
    missing = [r["run_id"] for r in runs.collect()]
    for rid in sorted(missing):
        lineage_from_results(res.where(F.col("run_id") == rid), rid) \
            .write.mode("append").parquet(lineage_dir)
    return sorted(missing)


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
    """True iff the directory holds at least one COMMITTED parquet data
    file — recursive, because results are hive-partitioned by run_id (a
    bare _SUCCESS marker from an all-empty write is NOT data). Hidden dirs
    (`_temporary/` task attempts from a crashed write, `.staging`) are
    skipped: Spark's reader ignores them too, so counting them would make
    _exists say "data" while the read finds none — bricking every retry
    after a first-write crash."""
    if not os.path.isdir(path):
        return False
    for _root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any(f.endswith(".parquet") and not f.startswith((".", "_"))
               for f in files):
            return True
    return False
