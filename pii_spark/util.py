"""Small shared helpers for the engine and the query registry."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver-provided parquet table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def checksum_udf(fn):
    """Vectorized boolean pandas UDF over a string column — the Arrow-batched
    wrapper for pii_core checksum validators (north rule: checksum validation
    over Arrow batches, never per-row Python at the DataFrame level)."""

    @F.pandas_udf("boolean")
    def ok(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return ok
