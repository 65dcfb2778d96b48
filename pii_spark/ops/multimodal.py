"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container ships no image/audio codecs, so the decode step is a
deterministic stub (clearly marked) — but every Spark-side concern that
matters at 100 TB is real and tested: binary column schema, Arrow batch
transfer of bytes into pandas, ``mapInPandas`` batch shape, partition
behavior, and metadata pushdown-friendly layout (metadata columns live
beside the blob so filters prune without touching bytes).

``frame_sample`` is oracle-checked end-to-end, including the binary
metadata columns it carries per frame (byte lengths + content hash are
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


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("off", T.IntegerType(), False),
    T.StructField("frame_sig", T.StringType(), False),
])


def sample_frames(docs_with_blob: DataFrame, n_frames: int = 4,
                  frame_len: int = 32) -> DataFrame:
    """Frame sampling over an opaque "video" blob: ``n_frames`` evenly
    spaced byte windows per document (the real decode — ffmpeg keyframe
    extraction — replaces the byte-window slice inside the SAME mapInPandas;
    offsets, batch shape and the one-row-per-frame explode are the
    production plumbing). Documents shorter than one frame emit nothing.

    Offsets are pure integer arithmetic on the blob length, so the whole
    operator is oracle-checkable: off_i = floor(i·(n−len)/(k−1)).
    """
    if n_frames < 1 or frame_len < 1:
        raise ValueError(f"bad n_frames={n_frames} / frame_len={frame_len}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            ids, idxs, offs, sigs = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"].to_numpy(), pdf["blob"]):
                b = bytes(blob) if blob is not None else b""
                n = len(b)
                if n < frame_len:
                    continue
                for i in range(n_frames):
                    off = ((i * (n - frame_len)) // (n_frames - 1)
                           if n_frames > 1 else 0)
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    sigs.append(hashlib.md5(b[off:off + frame_len]).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "off": pd.Series(offs, dtype="int32"),
                "frame_sig": pd.Series(sigs, dtype="object"),
            })

    return docs_with_blob.mapInPandas(run, schema=FRAMES_SCHEMA)


from pii_spark.util import read_table as _t  # noqa: E402


def register_queries(register) -> None:
    @register(
        "frame_sample",
        oracle="""
        WITH f AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n,
                 unnest(generate_series(0, 3)) AS i
          FROM documents
          WHERE doc_id < 300 AND octet_length(encode(text)) >= 32
        )
        SELECT doc_id, CAST(i AS INT) AS frame_idx,
               CAST(floor(i * (n - 32) / 3.0) AS INT) AS off,
               md5(substr(text,
                          CAST(floor(i * (n - 32) / 3.0) AS INT) + 1,
                          32)) AS frame_sig,
               CAST(n AS BIGINT) AS n_bytes,
               substr(md5(text), 1, 8) AS doc_sig
        FROM f ORDER BY doc_id, frame_idx
        """,
    )
    def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Frame sampling over binary payloads (video-style): 4 evenly
        spaced 32-byte windows per document via the mapInPandas explode in
        ``sample_frames``, each frame row carrying the blob's typed
        metadata (byte length + content signature — the decoder-free
        binary-meta derivation, consolidated from the retired
        ``binary_meta`` slot; identical expressions, per-doc grain instead
        of the old per-source rollup, which was a trivial groupBy on top).
        The oracle re-derives offsets with flat SQL and signatures via md5
        over text slices — valid because documents.text is ASCII word soup
        (byte offsets == char offsets)."""
        d = _t(spark, sf_dir, "documents").where("doc_id < 300")
        blobs = d.select("doc_id", F.encode("text", "utf-8").alias("blob"))
        meta = d.select(
            "doc_id",
            F.octet_length(F.encode("text", "utf-8")).cast("long")
            .alias("n_bytes"),
            F.substring(F.md5("text"), 1, 8).alias("doc_sig"),
        )
        return (
            sample_frames(blobs, n_frames=4, frame_len=32)
            .join(meta, "doc_id")
            .orderBy("doc_id", "frame_idx")
        )

    @register("multimodal_features")  # rows-only: stub decoder is not SQL
    def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Arrow-batched binary decode plumbing: documents.text encoded to a
        binary blob column, then mapInPandas feature extraction (stubbed
        decode, real batch shape)."""
        d = _t(spark, sf_dir, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("blob"))
        return extract_features(d).orderBy("doc_id")
