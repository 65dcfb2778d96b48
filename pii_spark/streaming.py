"""Structured Streaming incremental extraction.

The reference is pure batch and the north rule's resume story is
batch-incremental (Iceberg snapshots — see resume.py), but a web-crawl
pipeline often lands pages continuously. This module runs the SAME
extraction pass as a stream: new parquet files appearing under the input
path are picked up, extracted, and appended to the sink exactly once —
Spark's checkpoint dir tracks which source files are committed, which is the
streaming twin of resume.py's anti-join.

``mapInPandas`` works unchanged on streaming DataFrames (stateless
per-batch), so extraction semantics and byte-parity carry over verbatim.
``Trigger.AvailableNow`` drains everything pending then stops — the shape a
scheduled incremental crawl job uses; remove the trigger for continuous
micro-batches.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from pii_core.pipeline import ExtractConfig
from pii_spark.extract import _extract_batches, RESULTS_WITH_PID
from pii_spark.schemas import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start (and return) the incremental extraction stream.

    Scale notes: maxFilesPerTrigger bounds micro-batch size so executor
    memory stays flat regardless of how many files land between runs; the
    salted repartition is unnecessary here because each micro-batch is
    small — per-file input splits already balance.
    """
    cfg = cfg or ExtractConfig()
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)

    results = pages.select("url", "html", "text").mapInPandas(
        _extract_batches(cfg), schema=RESULTS_WITH_PID
    ).drop("partition_id")

    writer = (
        results.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
