"""End-to-end corpus curation: the composed DAG (line dedup → quality
gates → exact dedup → LSH near-dedup) with the drop-reason audit trail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_spark.curation import CurationConfig, curate


def _corpus():
    import random

    nav = "Menu | Institucional | Contato"
    docs = []
    bodies = {}
    for i in range(8):  # healthy prose docs, each with a DISTINCT body
        rng = random.Random(1000 + i)
        bodies[i] = " ".join(
            f"palavra{rng.randint(0, 10**9)}" for _ in range(45))
        docs.append((i, f"{nav}\n{bodies[i]} variante numero {i}."))
    docs.append((100, "curto demais"))                       # too_short
    docs.append((101, "spam " * 60))                         # repetitive
    docs.append((102, f"{nav}\n{bodies[0]} variante numero 0."))  # exact dup
    docs.append((103, f"{nav}\n{bodies[1]} variante numero 1. "
                      "Um sufixo extra anexado."))           # near dup of 1
    docs.append((104, "\n".join(["linha repetida"] * 25)))   # repetitive lines
    return docs


def test_curate_full_dag_reasons_and_survivors(spark):
    df = spark.createDataFrame(_corpus(), ["doc_id", "text"])
    out = curate(df, CurationConfig(line_dedup_max_doc_freq=5)).cache()
    try:
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {r[0] for r in _corpus()}  # nothing disappears

        assert rows[100]["drop_reason"] == "too_short"
        assert rows[101]["drop_reason"] == "repetitive"
        assert rows[104]["drop_reason"] == "repetitive"
        assert rows[102]["drop_reason"] == "exact_dup"
        assert rows[103]["drop_reason"] == "near_dup"
        for i in range(8):
            assert rows[i]["drop_reason"] is None, i
            # line dedup stripped the 10x-repeated nav from survivors
            assert "Menu |" not in rows[i]["text"], i

        audit = {r["drop_reason"]: r["n"] for r in out.groupBy("drop_reason")
                 .agg(F.count("*").alias("n")).collect()}
        assert audit == {None: 8, "too_short": 1, "repetitive": 2,
                         "exact_dup": 1, "near_dup": 1}
    finally:
        out.unpersist()


def test_curate_stage_order_and_toggles(spark):
    df = spark.createDataFrame(_corpus(), ["doc_id", "text"])
    # near-dup off: 103 survives; exact dup still caught
    out = {r["doc_id"]: r["drop_reason"]
           for r in curate(df, CurationConfig(line_dedup_max_doc_freq=5,
                                              near_dup_jaccard_pm=None))
           .collect()}
    assert out[103] is None and out[102] == "exact_dup"
    # everything off: all survive, text untouched (no line dedup)
    allpass = curate(df, CurationConfig(
        min_tokens=None, max_dup_line_pm=None, max_top_2gram_char_pm=None,
        max_dup_5gram_char_pm=None, exact_dedup=False,
        near_dup_jaccard_pm=None))
    rows = {r["doc_id"]: r for r in allpass.collect()}
    assert all(r["drop_reason"] is None for r in rows.values())
    assert rows[0]["text"] == dict(_corpus())[0]  # byte-identical
    # a quality-dropped doc never reaches the dedup stages: 102's exact
    # twin is doc 0; if 0 were quality-dropped 102 would survive exact
    out2 = {r["doc_id"]: r["drop_reason"]
            for r in curate(df, CurationConfig(
                min_tokens=1000, line_dedup_max_doc_freq=5)).collect()}
    assert out2[0] == "too_short" and out2[102] == "too_short"


def test_curation_config_validation():
    with pytest.raises(ValueError, match="min_tokens"):
        CurationConfig(min_tokens=-1)


def test_curate_null_and_empty_text_gate_out(spark):
    """A crawl row with NULL text must NOT survive curation: NULL n_tok
    would make every gate predicate NULL (never fires) and a NULL
    fingerprint never matches a dedup join key, so before the fix such
    rows sailed through the whole DAG as keepable survivors. NULL text is
    an empty document — it gates as too_short, with and without the
    near-dup stage, and never poisons healthy rows."""
    healthy = " ".join(f"palavra{i} termo{i * 7}" for i in range(40))
    rows = [(1, healthy), (2, None), (3, None), (4, ""), (5, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for cfg in (CurationConfig(), CurationConfig(near_dup_jaccard_pm=None)):
        got = {r["doc_id"]: r["drop_reason"]
               for r in curate(df, cfg).collect()}
        assert got[1] is None
        assert got[2] == "too_short"
        assert got[3] == "too_short"
        assert got[4] == "too_short"
        assert got[5] == "too_short"


def test_curate_null_id_quarantined_not_lost(spark):
    """A NULL-id row previously VANISHED from curate()'s output when the
    ngram gates were on (inner join on the id) — violating the
    every-input-doc contract; and with gates off it could never be
    deduped (id anti-joins can't address it). It must come back with
    drop_reason='null_id'."""
    from pii_spark.curation import CurationConfig, curate

    body = (" ".join(f"palavra{i}" for i in range(20))
            + " unica frase longa o bastante para passar em todos os "
            "filtros de qualidade sem repeticao excessiva")
    rows = [(None, body), (1, body), (2, "poucas palavras")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = curate(df, CurationConfig(
        min_tokens=5, max_dup_line_pm=900, max_top_2gram_char_pm=900,
        max_dup_5gram_char_pm=900, exact_dedup=True,
        near_dup_jaccard_pm=None))
    reasons = {r["doc_id"]: r["drop_reason"] for r in out.collect()}
    assert out.count() == 3            # every input row accounted for
    assert reasons[None] == "null_id"  # quarantined, not lost/kept
    assert reasons[1] is None          # real-id twin unaffected


def test_run_curation_job_end_to_end(spark, tmp_path):
    """The submission-surface orchestration (pii_spark/curatejob.py):
    curate -> committed parquet -> mix over the committed survivors with
    a persisted bench-keys artifact -> kept export + report, all counts
    served from the written files."""
    from pii_spark.curatejob import run_curation_job
    from pii_spark.curation import CurationConfig, MixConfig
    from pii_spark.ops.decontaminate import benchmark_gram_keys

    words = lambda i, n: " ".join(f"p{i}w{j}" for j in range(n))
    rows = (
        [(i, "web", f"h{i % 3}", words(i, 40)) for i in range(12)]
        + [(20, "books", "hb", words(20, 40))]
        + [(21, "web", "h0", "curto")]            # too_short
        + [(22, "web", "h1", words(5, 40))]       # exact dup of doc 5
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, host string, text string")
    bench = spark.createDataFrame(
        [(0, words(3, 40))], "doc_id long, text string")  # contaminates doc 3
    kpath = str(tmp_path / "keys")
    benchmark_gram_keys(bench, n=13).write.parquet(kpath)

    out = run_curation_job(
        spark, docs, str(tmp_path / "curated"),
        curation=CurationConfig(min_tokens=10, near_dup_jaccard_pm=None),
        mix=MixConfig(budgets={"web": 250, "books": 10_000},
                      decontaminate_n=13),
        bench_keys=spark.read.parquet(kpath),
        write_mix_dir=str(tmp_path / "mix"),
        report_dir=str(tmp_path / "report"),
    )
    assert out["docs_in"] == len(rows)
    assert out["curation"]["too_short"] == 1
    assert out["curation"]["exact_dup"] == 1
    assert out["mix"]["contaminated"] == 1            # doc 3 via the artifact
    assert out["mix"]["over_budget"] >= 1             # web budget bites
    assert "host_capped" not in out["mix"]            # cap off
    kept = spark.read.parquet(str(tmp_path / "mix"))
    assert "drop_reason" not in kept.columns
    assert 3 not in {r["doc_id"] for r in kept.collect()}
    rep = {r["source"]: r for r in
           spark.read.parquet(str(tmp_path / "report")).collect()}
    assert rep["books"]["achieved_tok"] == rep["books"]["available_tok"]
    assert rep["web"]["achieved_tok"] <= 250
    # committed counts equal a fresh read of the audit frames
    cur = spark.read.parquet(str(tmp_path / "curated"))
    assert cur.count() == len(rows)
    # second invocation without overwrite refuses (committed data stands)
    import pytest as _pt
    with _pt.raises(Exception):
        run_curation_job(spark, docs, str(tmp_path / "curated"),
                         curation=CurationConfig(near_dup_jaccard_pm=None))


def test_run_curation_job_derives_host_from_url(spark, tmp_path):
    """The crawl schema carries url, not host — when the host cap is on
    and only url is present, the job derives host with ops.urls.host_of
    so every surface buckets hosts identically."""
    from pii_spark.curatejob import run_curation_job
    from pii_spark.curation import CurationConfig, MixConfig

    words = lambda i: " ".join(f"q{i}w{j}" for j in range(40))
    rows = [(i, "web", f"https://h{i % 2}.ex.com/p/{i}", words(i))
            for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, url string, text string")
    out = run_curation_job(
        spark, docs, str(tmp_path / "c"),
        curation=CurationConfig(min_tokens=5, near_dup_jaccard_pm=None),
        mix=MixConfig(budgets={"web": 10_000}, decontaminate_n=None,
                      max_tokens_per_host=100))
    # both hosts exceed 100 tokens -> the cap fires on derived hosts
    assert out["mix"].get("host_capped", 0) > 0
    # without url OR host, the same config refuses loudly
    import pytest as _pt
    with _pt.raises(ValueError, match="host"):
        run_curation_job(
            spark, docs.drop("url"), str(tmp_path / "c2"),
            curation=CurationConfig(near_dup_jaccard_pm=None),
            mix=MixConfig(budgets={"web": 1}, decontaminate_n=None,
                          max_tokens_per_host=1))
