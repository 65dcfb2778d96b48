"""Per-host token cap (ops/mixing.py): deterministic domain balancing.
DuckDB-oracle verified (registry at its 50-slot cap), plus partition
invariance, NULL-host/NULL-text edges, and a plan gate showing under-cap
hosts never enter the window."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pii_spark.ops.mixing import cap_host_tokens
from pii_spark.ops.urls import host_of


def _corpus():
    rows = []
    did = 0
    # mega-host: 40 docs x 50 tokens = 2000 tokens, cap will bite
    for i in range(40):
        rows.append((did, "mega.example.com",
                     " ".join(f"m{did}t{j}" for j in range(50))))
        did += 1
    # mid host: 6 docs x 50 = 300 tokens
    for i in range(6):
        rows.append((did, "mid.example.com",
                     " ".join(f"d{did}t{j}" for j in range(50))))
        did += 1
    # tiny host, one doc
    rows.append((did, "tiny.example.com", "um dois tres")); did += 1
    # single doc BIGGER than the cap on its own host
    rows.append((did, "giant.example.com",
                 " ".join(f"g{j}" for j in range(900)))); did += 1
    # NULL host bucket (unparseable urls) with enough tokens to be capped
    for i in range(12):
        rows.append((did, None,
                     " ".join(f"n{did}t{j}" for j in range(50))))
        did += 1
    # NULL text doc on the mega host: zero tokens, must never flip a
    # predicate or consume budget
    rows.append((did, "mega.example.com", None)); did += 1
    return rows


CAP = 500


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pd.DataFrame(_corpus(), columns=["doc_id", "host", "text"])
    return spark.createDataFrame(pdf, "doc_id long, host string, text string"), pdf


def test_cap_host_tokens_vs_duckdb_oracle(corpus):
    import duckdb

    df, pdf = corpus
    kept, dropped = cap_host_tokens(df, CAP, seed=7)
    got_kept = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    got_dropped = {r["doc_id"]: (r["n_tok"], r["host_cum_tok"])
                   for r in dropped.collect()}

    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql(rf"""
        WITH toks AS (
          SELECT doc_id, host,
                 CASE WHEN text IS NULL THEN 0
                      ELSE len(list_filter(string_split_regex(text, '\s+'),
                                           t -> t <> '')) END AS n_tok
          FROM docs),
        cum AS (
          SELECT doc_id, host, n_tok,
                 sum(n_tok) OVER (
                   PARTITION BY host
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id
                   ROWS UNBOUNDED PRECEDING) AS c
          FROM toks)
        SELECT doc_id, n_tok, c FROM cum WHERE c > {CAP} ORDER BY doc_id
    """).fetchall()
    want_dropped = {d: (n, c) for d, n, c in want}
    assert got_dropped == want_dropped
    all_ids = set(pdf["doc_id"])
    assert set(got_kept) == all_ids - set(want_dropped)


def test_cap_semantics_and_edges(corpus):
    df, pdf = corpus
    kept, dropped = cap_host_tokens(df, CAP, seed=7)
    k = kept.withColumn("h", F.col("host"))
    # every surviving host's total is within the cap
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    n_tok = F.when(F.col("text").isNull(), F.lit(0)).otherwise(F.size(toks))
    totals = {r["host"]: r["t"] for r in
              k.select("host", n_tok.alias("n")).groupBy("host")
              .agg(F.sum("n").alias("t")).collect()}
    for h, t in totals.items():
        assert t <= CAP, (h, t)
    # under-cap hosts survive whole
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    tiny = set(pdf[pdf["host"] == "tiny.example.com"]["doc_id"])
    mid = set(pdf[pdf["host"] == "mid.example.com"]["doc_id"])
    assert tiny <= kept_ids and mid <= kept_ids
    # a lone doc over the cap drops
    giant = set(pdf[pdf["host"] == "giant.example.com"]["doc_id"])
    assert giant & kept_ids == set()
    # the NULL-host bucket is capped too (12 x 50 = 600 > 500)
    null_ids = set(pdf[pdf["host"].isna()]["doc_id"])
    assert 0 < len(null_ids & kept_ids) < len(null_ids)
    # exactly-one-side partition
    dropped_ids = {r["doc_id"] for r in dropped.select("doc_id").collect()}
    assert kept_ids | dropped_ids == set(pdf["doc_id"])
    assert kept_ids & dropped_ids == set()


def test_zero_token_doc_never_influences_neighbors(spark, corpus):
    """A zero-token (NULL-text) doc adds nothing to the running total, so
    its presence must not change which OTHER documents survive — whether
    IT survives depends only on its own hash position vs the cap point
    (oracle-pinned)."""
    df, pdf = corpus
    null_text = set(pdf[pdf["text"].isna()]["doc_id"])
    with_null, _ = cap_host_tokens(df, CAP, seed=7)
    without_null, _ = cap_host_tokens(
        df.where(~F.col("doc_id").isin(list(null_text))), CAP, seed=7)
    a = {r["doc_id"] for r in with_null.select("doc_id").collect()}
    b = {r["doc_id"] for r in without_null.select("doc_id").collect()}
    assert a - null_text == b


def test_cap_partition_invariance(corpus):
    df, _ = corpus
    a, _ = cap_host_tokens(df.repartition(1), CAP, seed=7)
    b, _ = cap_host_tokens(df.repartition(16, "doc_id"), CAP, seed=7)
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in b.select("doc_id").collect())


def test_cap_window_prunes_under_cap_hosts(corpus):
    """The running-sum window must rank ONLY over-cap hosts' skinny rows:
    the semi-join prune sits below the Window in the plan, and the
    windowed frame carries no text column."""
    df, _ = corpus
    _, dropped = cap_host_tokens(df, CAP, seed=7)
    plan = dropped._jdf.queryExecution().executedPlan().toString()
    w = plan.find("Window")
    assert w != -1
    below_window = plan[w:]
    assert "LeftSemi" in below_window
    # the window's own projection is skinny: host/id/n_tok, never text
    import re
    win_line = next(l for l in plan.splitlines() if "Window" in l)
    assert "text" not in win_line


def test_cap_validation_and_host_of(spark, corpus):
    df, _ = corpus
    with pytest.raises(ValueError):
        cap_host_tokens(df, -1)
    urls = spark.createDataFrame(
        [("https://WWW.Site.com/path?q=1",),
         ("http://site.com?id=9",),
         ("HTTPS://Host.org#frag",),
         ("no-scheme.com/x",)], "url string")
    got = [r["h"] for r in urls.select(host_of(F.col("url")).alias("h"))
           .collect()]
    assert got == ["www.site.com", "site.com", "host.org", ""]
