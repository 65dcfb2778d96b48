"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container ships no image/audio codecs, so the decode step is a
deterministic stub (clearly marked) — but every Spark-side concern that
matters at 100 TB is real and tested: binary column schema, Arrow batch
transfer of bytes into pandas, ``mapInPandas`` batch shape, partition
behavior, and metadata pushdown-friendly layout (metadata columns live
beside the blob so filters prune without touching bytes).

``binary_meta`` is oracle-checked (byte lengths + content hash are
SQL-expressible); ``multimodal_features`` exercises the mapInPandas decode
path (rows-only check — the stub "decoder" is not SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feat_sum", T.LongType(), False),
])


def decode_stub(blob: bytes) -> dict:
    """Deterministic stand-in for an image decode. A real deployment
    replaces this with e.g. PIL/ffmpeg inside the same mapInPandas —
    the Spark-side contract (bytes in, typed metadata + features out)
    is unchanged. NotImplementedError is deliberately NOT raised so the
    plumbing stays testable end-to-end in this container."""
    n = len(blob)
    head = blob[:4]
    fmt = "png" if head.startswith(b"\x89P") else ("jpg" if head.startswith(b"\xff\xd8") else "raw")
    width = (blob[0] % 64 + 1) if n else 0
    height = (blob[1] % 64 + 1) if n > 1 else 0
    feat_sum = sum(blob[:256])  # stand-in "feature": bounded byte sum
    return {"fmt": fmt, "width": width, "height": height,
            "n_bytes": n, "feat_sum": feat_sum}


def extract_features(docs_with_blob: DataFrame) -> DataFrame:
    """(doc_id, blob binary) -> typed features via iterator-of-batches
    mapInPandas; decoder state is constructed once per partition."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(b if b is not None else b"")
                     for b in pdf["blob"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "fmt", "width", "height", "n_bytes", "feat_sum"]]

    return docs_with_blob.mapInPandas(run, schema=FEATURES_SCHEMA)


from pii_spark.util import read_table as _t  # noqa: E402


def register_queries(register) -> None:
    @register(
        "binary_meta",
        oracle="""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(COUNT(DISTINCT substr(md5(text), 1, 8)) AS BIGINT) AS n_distinct_sig
        FROM documents GROUP BY source ORDER BY source
        """,
    )
    def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Binary-column metadata without touching a decoder: byte lengths
        and content signatures over utf-8 encoded payloads."""
        d = _t(spark, sf_dir, "documents")
        blob = F.encode("text", "utf-8")
        return (
            d.groupBy("source").agg(
                F.count("*").alias("n_docs"),
                F.sum(F.octet_length(blob)).alias("total_bytes"),
                F.countDistinct(F.substring(F.md5("text"), 1, 8))
                .alias("n_distinct_sig"),
            ).orderBy("source")
        )

    @register("multimodal_features")  # rows-only: stub decoder is not SQL
    def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Arrow-batched binary decode plumbing: documents.text encoded to a
        binary blob column, then mapInPandas feature extraction (stubbed
        decode, real batch shape)."""
        d = _t(spark, sf_dir, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("blob"))
        return extract_features(d).orderBy("doc_id")
