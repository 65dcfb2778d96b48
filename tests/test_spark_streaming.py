"""Structured Streaming incremental extraction: exactly-once file pickup,
parity with the batch pass."""

from __future__ import annotations

from pii_spark.streaming import stream_extract
from pii_spark.synth import pages_df


def _write_batch(spark, pages, path):
    pages.write.mode("append").parquet(path)


def test_stream_extract_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = pages_df(spark, 25, seed=31)
    _write_batch(spark, first, in_dir)
    q = stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 25

    # new files land; restart drains ONLY them (checkpoint-tracked)
    more = pages_df(spark, 40, seed=31).where("url LIKE '%/3_' ")
    n_more = more.count()
    assert n_more > 0
    _write_batch(spark, more, in_dir)
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 25 + n_more

    # streamed results match the batch pipeline byte-for-byte
    from pii_spark.extract import extract_pages

    batch = {r["url"]: r.asDict(recursive=True)
             for r in extract_pages(first, num_partitions=2).collect()}
    streamed = {r["url"]: r.asDict(recursive=True)
                for r in got2.collect() if r["url"] in batch}
    for url, b in batch.items():
        s = streamed[url]
        assert s["extracted_text"] == b["extracted_text"]
        assert s["spans"] == b["spans"]
        assert s["should_be_public"] == b["should_be_public"]
