"""Raw-SQL surface: register the driver tables and engine outputs as temp
views so users can query with plain ``spark.sql`` (the reference's users get
the same data-access capability through SQL instead of its Python CLI).

At scale these become catalog tables (Iceberg); here they are session temp
views over the parquet testdata plus the extraction results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pii_spark.util import read_table

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(
    spark: SparkSession,
    sf_dir: str,
    results: DataFrame | None = None,
) -> list[str]:
    """Create temp views for every driver table (and optionally the
    extraction ``results`` frame). Returns the registered view names."""
    names = []
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if results is not None:
        results.createOrReplaceTempView("results")
        names.append("results")
    return names
