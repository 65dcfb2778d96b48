"""Engine table schemas (FIXTURES.md §1, §5, §6).

The pages schema follows BASELINE.json's ``input_hint`` exactly:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
The results schema mirrors the reference output record
(``/root/reference/infer_pii.py:553-569``) plus the passthrough url and the
recomputed ``extracted_text``.
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SPAN_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("conf", T.DoubleType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
    ]
)

RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
        T.StructField("should_be_public", T.BooleanType(), False),
        T.StructField("n_spans", T.IntegerType(), False),
        T.StructField("doc_bytes", T.LongType(), False),
        # null on success; on per-doc failure the row is quarantined in place
        # (fail-closed: should_be_public=false) instead of killing the job.
        T.StructField("error", T.StringType(), True),
    ]
)

# The lineage read schema lives in pii_spark.resume._lineage_schema —
# run_id is a HIVE PARTITION column (last, string-pinned) there, so a
# data-column twin here would drift and misread the dir.
