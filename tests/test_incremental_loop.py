"""End-to-end incremental-crawl production loop (VERDICT r4 #3).

One test drives the full pipeline the way a scheduled 100-TB crawl job
would: crawl 1 → extract+commit (resume.run_incremental) → curate →
build + persist the bucketed band index → crawl 2 (url overlap, a
byte-identical recrawl under a new url, an edited recrawl under a new
url, genuinely new pages) → anti-join committed urls → exact then near
cross-crawl dedup of the new batch → APPEND the admitted batch's bands
to the index (never rebuild) → lineage rollup across both runs.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pii_spark.curation import CurationConfig, curate
from pii_spark.ops.dedup import (
    build_band_index,
    dedup_against_corpus,
    near_dedup_against_corpus,
)
from pii_spark.resume import lineage_summary, run_incremental
from pii_spark.schemas import PAGES_SCHEMA
from pii_spark.synth import gen_page
from pii_spark.util import write_bucketed_table

IDX_TABLE = "crawl_loop_band_idx"


def _fresh_table(spark, name):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(f"spark-warehouse/{name}", ignore_errors=True)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
         for r in rows], PAGES_SCHEMA)


def _committed_docs(spark, rdir, run_id=None):
    """(url, text) docs from committed results, quarantine-free."""
    df = spark.read.parquet(rdir)
    if run_id is not None:
        df = df.where(F.col("run_id") == run_id)
    return (df.where(F.col("error").isNull())
            .where(F.length("extracted_text") > 0)
            .select("url", F.col("extracted_text").alias("text")))


def test_incremental_crawl_production_loop(spark, tmp_path):
    rdir = str(tmp_path / "results")
    ldir = str(tmp_path / "lineage")

    # ---- CRAWL 1: extract + atomic commit -------------------------------
    crawl1 = [gen_page(i, seed=31) for i in range(10)]
    out1 = run_incremental(spark, _pages(spark, crawl1), rdir, ldir,
                           "crawl1", num_partitions=3)
    assert out1["docs"] == 10

    # ---- curate the committed crawl, admit survivors to the corpus ------
    docs1 = _committed_docs(spark, rdir, "crawl1")
    cur1 = curate(docs1, CurationConfig(), id_col="url", text_col="text")
    corpus1 = (cur1.where(F.col("drop_reason").isNull())
               .select("url", "text"))
    admitted1 = {r["url"] for r in corpus1.select("url").collect()}
    assert len(admitted1) >= 5  # synth corpus survives the Gopher gates

    # ---- build + persist the band index, bucketed on bk -----------------
    _fresh_table(spark, IDX_TABLE)
    write_bucketed_table(build_band_index(corpus1, id_col="url"),
                         IDX_TABLE, "bk", 8)
    idx_rows_1 = spark.table(IDX_TABLE).count()
    assert idx_rows_1 == 4 * len(admitted1)  # 4 bands per admitted doc

    # ---- CRAWL 2 input: overlap + recrawls + new pages -------------------
    # base for the recrawls: the longest admitted doc (deterministic)
    base = max(corpus1.collect(), key=lambda r: len(r["text"]))
    base_page = next(p for p in crawl1 if p["url"] == base["url"])
    exact_recrawl = dict(base_page,
                         url="https://mirror.example.gov.br/copy/1")
    edited_recrawl = dict(
        base_page, url="https://mirror.example.gov.br/edited/2",
        html=b"", text=base["text"] + "\n\nUma frase nova no final.")
    crawl2_rows = ([gen_page(i, seed=31) for i in range(5, 15)]
                   + [exact_recrawl, edited_recrawl])

    out2 = run_incremental(spark, _pages(spark, crawl2_rows), rdir, ldir,
                           "crawl2", num_partitions=3)
    # urls 5..9 are committed: the anti-join must skip them — only the 5
    # new pages and the 2 recrawl urls extract
    assert out2["docs"] == 7

    # ---- cross-crawl dedup of the new batch ------------------------------
    docs2 = _committed_docs(spark, rdir, "crawl2")
    stored_idx = spark.table(IDX_TABLE)
    after_exact = dedup_against_corpus(docs2, corpus1)
    exact_urls = {r["url"] for r in after_exact.select("url").collect()}
    # the byte-identical recrawl dies on the exact fingerprint; the edited
    # recrawl slips past it — precisely the gap the near pass fills
    assert exact_recrawl["url"] not in exact_urls
    assert edited_recrawl["url"] in exact_urls

    near_kept = near_dedup_against_corpus(after_exact, stored_idx, corpus1,
                                          id_col="url")
    kept_urls = {r["url"] for r in near_kept.collect()}
    assert edited_recrawl["url"] not in kept_urls
    assert kept_urls == {p["url"] for p in crawl2_rows[5:10]}  # the 5 new

    # plan gate: the committed side of the near-dedup candidate join is the
    # bucketed stored index — scanned bucketed (zero Exchange above it)
    plan = near_kept._jdf.queryExecution().executedPlan().toString()
    assert IDX_TABLE in plan and "CartesianProduct" not in plan
    scan_line = next(ln for ln in plan.splitlines()
                     if IDX_TABLE in ln and "FileScan" in ln)
    assert "Bucketed: true" in scan_line, scan_line

    # ---- admit crawl 2 survivors; APPEND their bands to the index --------
    cur2 = curate(near_kept, CurationConfig(), id_col="url",
                  text_col="text")
    corpus2 = (cur2.where(F.col("drop_reason").isNull())
               .select("url", "text"))
    n_admitted2 = corpus2.count()
    assert n_admitted2 >= 1
    (build_band_index(corpus2, id_col="url")
     .write.mode("append").format("parquet")
     .bucketBy(8, "bk").saveAsTable(IDX_TABLE))

    # appended, not rebuilt: crawl 1's rows are untouched and the delta is
    # exactly crawl 2's bands
    idx_after = spark.table(IDX_TABLE)
    assert idx_after.count() == idx_rows_1 + 4 * n_admitted2
    old_rows = idx_after.join(corpus1.select(F.col("url").alias("doc_id")),
                              "doc_id")
    assert old_rows.count() == idx_rows_1
    # and the appended table still scans bucketed for the NEXT increment
    nxt = near_dedup_against_corpus(
        docs2.limit(1), spark.table(IDX_TABLE),
        corpus1.unionByName(corpus2), id_col="url")
    plan2 = nxt._jdf.queryExecution().executedPlan().toString()
    scan2 = next(ln for ln in plan2.splitlines()
                 if IDX_TABLE in ln and "FileScan" in ln)
    assert "Bucketed: true" in scan2, scan2

    # ---- lineage rollup across both committed runs -----------------------
    lineage = {r["run_id"]: r for r in
               lineage_summary(spark, ldir, rdir).collect()}
    assert set(lineage) == {"crawl1", "crawl2"}
    assert lineage["crawl1"]["docs"] == 10
    assert lineage["crawl2"]["docs"] == 7

    _fresh_table(spark, IDX_TABLE)
