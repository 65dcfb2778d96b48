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


def test_windowed_watermark_closes_and_drops_late(spark, tmp_path):
    """Watermarked event-time windows: a window emits exactly once when the
    watermark passes it; rows later than the watermark are dropped."""
    import datetime as dt

    from pii_spark.streaming import windowed_pii_stream
    from pii_spark.synth import gen_page

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def rows(ts_list, base=0):
        out = []
        for k, ts in enumerate(ts_list):
            r = gen_page(base + k, seed=61)
            out.append((f"{r['url']}?k={base + k}", ts, r["html"],
                        r["text"], r["lang"]))
        return out

    def write(rows_, name):
        from pii_spark.schemas import PAGES_SCHEMA
        spark.createDataFrame(rows_, PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    t = dt.datetime(2025, 1, 1, 0, 5)
    late_ok = dt.datetime(2025, 1, 1, 0, 6)
    t2 = dt.datetime(2025, 1, 1, 2, 0)
    too_late = dt.datetime(2025, 1, 1, 0, 7)

    # run 1: three docs in window [00:00, 00:10) — window stays OPEN
    write(rows([t, t, t]), "a")
    q = windowed_pii_stream(spark, in_dir, output_dir=out_dir, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    # watermark has not passed the window yet -> zero rows emitted
    assert spark.read.parquet(out_dir).count() == 0

    # run 2: one ACCEPTED late row for the old window (watermark still
    # behind it) plus two rows two hours later that push the watermark past
    # the old window -> it closes and emits docs=4
    write(rows([late_ok, t2, t2], base=10), "b")
    q = windowed_pii_stream(spark, in_dir, output_dir=out_dir, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    out = {(r["win_start"], ): r for r in spark.read.parquet(out_dir).collect()}
    assert [(r["win_start"].hour, r["win_start"].minute, r["docs"])
            for r in out.values()] == [(0, 0, 4)]

    # run 3: a row older than the watermark (01:30) -> dropped; the closed
    # window's emitted row is immutable
    write(rows([too_late], base=20), "c")
    q = windowed_pii_stream(spark, in_dir, output_dir=out_dir, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    final = spark.read.parquet(out_dir).collect()
    assert len(final) == 1 and final[0]["docs"] == 4


def _latest_per_host(spark, out_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("host").orderBy(F.col("batch_id").desc())
    return {
        r["host"]: r
        for r in df.withColumn("rn", F.row_number().over(w))
        .where("rn = 1").collect()
    }


def test_stateful_host_stats_accumulate_across_restarts(spark, tmp_path):
    from pii_spark.streaming import host_stats_stream

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "stats")

    first = pages_df(spark, 30, seed=55)
    first.write.mode("append").parquet(in_dir)
    q = host_stats_stream(spark, in_dir, output_dir=out, checkpoint_dir=ckpt)
    q.awaitTermination(180)
    t1 = _latest_per_host(spark, out)
    assert sum(r["docs"] for r in t1.values()) == 30
    assert all(r["pii_docs"] <= r["docs"] for r in t1.values())

    # more pages land; restart must resume state from the checkpoint and
    # ACCUMULATE (not restart from zero)
    more = pages_df(spark, 60, seed=55).where("url LIKE '%/4_'")
    n_more = more.count()
    assert n_more > 0
    more.write.mode("append").parquet(in_dir)
    q2 = host_stats_stream(spark, in_dir, output_dir=out, checkpoint_dir=ckpt)
    q2.awaitTermination(180)
    t2 = _latest_per_host(spark, out)
    assert sum(r["docs"] for r in t2.values()) == 30 + n_more
    for host, r in t1.items():
        assert t2[host]["docs"] >= r["docs"]


def test_stream_dirs_are_keyword_only():
    """ADVICE r4: output_dir/checkpoint_dir are both plain strings, so a
    positional caller who swaps them writes checkpoints into the output
    dir with no error. Keyword-only params make stale positional call
    sites fail loudly instead of mis-wiring directories."""
    import inspect

    import pytest

    from pii_spark.streaming import host_stats_stream, windowed_pii_stream

    for fn in (windowed_pii_stream, host_stats_stream):
        sig = inspect.signature(fn)
        for name in ("output_dir", "checkpoint_dir"):
            assert sig.parameters[name].kind is inspect.Parameter.KEYWORD_ONLY
    with pytest.raises(TypeError):
        windowed_pii_stream(None, "in", "out", "ckpt")
    with pytest.raises(TypeError):
        host_stats_stream(None, "in", "out", "ckpt")
