"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship extraction pipeline (html → extracted text + typed
               PII spans + should_be_public) over a deterministic synthetic
               pages corpus, smoke-run at sf0.001 scale.
``queries``  — one entry per implemented operator (SURVEY.md §2 + the
               training-data-pipeline ops), from pii_spark.queries.
``oracle_sql`` — DuckDB-equivalent SQL per query (omitted only for
               non-SQL-expressible ops: the full greedy span pipeline and
               the stubbed multimodal decoder — driver records rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full PII extraction over synthetic Common-Crawl-style pages
    (the sf0.001 parquet tables seed the corpus size; the pages themselves
    are generated deterministically — the engine's true input shape per
    BASELINE.json input_hint is (url, warc_ts, html, text, lang))."""
    from pii_spark.extract import extract_pages
    from pii_spark.synth import pages_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = max(60, min(docs.count(), 300))
    pages = pages_df(spark, int(n), seed=42)
    res = extract_pages(pages)
    return res.select("url", "extracted_text", "spans", "should_be_public",
                      "n_spans", "doc_bytes")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pii_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pii_spark.queries import ORACLES

    return dict(ORACLES)
