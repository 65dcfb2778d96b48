"""Training-side operators: dataset scan (S3), train/val split (O7),
token micro-F1 (A9) — the data-plane parts of the reference's
finetune_pii_token_classification.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pii_spark.training import (
    load_training_dataset,
    token_micro_f1,
    train_val_split,
    write_training_jsonl,
)


def test_split_disjoint_deterministic_and_proportional(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train, val = train_val_split(d, 0.10, seed=42, key_col="doc_id")
    n, nt, nv = d.count(), train.count(), val.count()
    assert nt + nv == n
    assert train.join(val, "doc_id", "inner").count() == 0
    # proportional within sampling noise (4-hex-digit uniform hash)
    assert 0.03 * n <= nv <= 0.20 * n
    # deterministic: a second invocation picks the identical val set
    _, val2 = train_val_split(d, 0.10, seed=42, key_col="doc_id")
    assert val.select("doc_id").subtract(val2.select("doc_id")).count() == 0
    # a different seed picks a different set
    _, val3 = train_val_split(d, 0.10, seed=7, key_col="doc_id")
    assert val.select("doc_id").subtract(val3.select("doc_id")).count() > 0


def test_split_groups_stay_together(spark):
    # chunks of one document (equal keys) must land on one side — leak-free
    rows = [(f"doc{i % 5}", i) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_key string, chunk int")
    train, val = train_val_split(df, 0.4, seed=1)
    sides = (
        train.select("doc_key").distinct().withColumn("s", F.lit("t"))
        .unionByName(val.select("doc_key").distinct().withColumn("s", F.lit("v")))
    )
    per_key = sides.groupBy("doc_key").agg(F.countDistinct("s").alias("ns"))
    assert per_key.where("ns > 1").count() == 0


def test_split_rejects_bad_fraction(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_key")
    with pytest.raises(ValueError):
        train_val_split(df, 1.0)


def test_training_jsonl_roundtrip(spark, tmp_path):
    # S3: the chunked dataset written as JSONL reads back schema-identical
    from pii_core.pipeline import ExtractConfig
    from pii_spark.dataset import build_chunked_dataset

    docs = spark.createDataFrame(
        [("d1", "O requerente Carlos Silva mora na Rua A, 10. " * 6,
          [{"type": "NOME_PESSOA", "value": "Carlos Silva"}])],
        "doc_key string, text string, entities array<struct<type:string,value:string>>",
    )
    chunks = build_chunked_dataset(
        docs, ExtractConfig(max_length=32, stride=8, boundary_backoff=8))
    path = str(tmp_path / "ds")
    write_training_jsonl(chunks, path)
    back = load_training_dataset(spark, path)
    # JSON scans surface every (nested) field nullable; names and types
    # must match — simpleString drops nullability
    assert back.schema.simpleString() == chunks.schema.simpleString()
    key = lambda r: (r["doc_key"], r["chunk_index"])
    a = sorted((r.asDict(recursive=True) for r in chunks.collect()), key=key)
    b = sorted((r.asDict(recursive=True) for r in back.collect()), key=key)
    assert a == b


def _reference_micro_f1(seqs, o_id=0):
    """Literal port of compute_metrics (finetune...py:562-587) for the test
    oracle."""
    tp = pred_pos = true_pos = 0
    for p_seq, y_seq in seqs:
        for p, y in zip(p_seq, y_seq):
            if y == -100:
                continue
            if p != o_id:
                pred_pos += 1
            if y != o_id:
                true_pos += 1
            if p != o_id and y != o_id and p == y:
                tp += 1
    precision = tp / pred_pos if pred_pos else 0.0
    recall = tp / true_pos if true_pos else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "pred_pos": pred_pos, "true_pos": true_pos,
            "precision": precision, "recall": recall, "f1": f1}


def test_token_micro_f1_matches_reference_semantics(spark):
    import random

    rng = random.Random(11)
    seqs = []
    for _ in range(40):
        length = rng.randrange(1, 30)
        y = [rng.choice([-100, 0, 1, 2, 3]) for _ in range(length)]
        p = [rng.choice([0, 1, 2, 3]) for _ in range(length)]
        seqs.append((p, y))
    df = spark.createDataFrame(seqs, "pred array<int>, label array<int>")
    got = token_micro_f1(df)
    want = _reference_micro_f1(seqs)
    assert got == pytest.approx(want)


def test_token_micro_f1_truncates_like_zip(spark):
    # reference zip() stops at the shorter sequence; zip_with null-padding
    # would inflate true_pos for truncated predictions
    seqs = [([1, 0], [1, 2, 3, 3]), ([2, 2, 2], [2])]
    df = spark.createDataFrame(seqs, "pred array<int>, label array<int>")
    assert token_micro_f1(df) == pytest.approx(_reference_micro_f1(seqs))


def test_load_training_dataset_failfast_on_drift(spark, tmp_path):
    import os

    path = str(tmp_path / "bad")
    os.makedirs(path)
    with open(f"{path}/part-0.json", "w") as f:
        f.write('{"doc_key": "d", "chunk_index": "NOT_AN_INT", '
                '"char_start": 0, "char_end": 1, "text": "x", '
                '"entities": "oops", "error": null}\n')
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        load_training_dataset(spark, path).collect()


def test_token_micro_f1_empty_and_all_o(spark):
    df = spark.createDataFrame(
        [([0, 0], [0, 0]), ([], [])], "pred array<int>, label array<int>")
    m = token_micro_f1(df)
    assert (m["tp"], m["pred_pos"], m["true_pos"]) == (0, 0, 0)
    assert m["f1"] == 0.0


def test_stratified_sample_deterministic_and_oracle(spark):
    """Content-hash stratified sampling: exact row-set parity with the
    same expression in DuckDB, identical at any partition count, grouped
    keys sample together, unknown strata drop, per-stratum rates near
    their targets."""
    import duckdb
    import pandas as pd

    from pii_spark.training import stratified_sample

    rows = [(i, f"k{i // 2}", ["com", "org", "gov", "net"][i % 4])
            for i in range(4000)]
    pdf = pd.DataFrame(rows, columns=["rid", "doc_key", "tld"])
    fracs = {"com": 0.5, "org": 0.1, "gov": 1.0}  # net absent -> dropped

    df = spark.createDataFrame(pdf)
    got = sorted(r["rid"] for r in stratified_sample(
        df, fracs, "tld", "doc_key", seed=7).select("rid").collect())
    got_16 = sorted(r["rid"] for r in stratified_sample(
        df.repartition(16), fracs, "tld", "doc_key", seed=7)
        .select("rid").collect())
    assert got == got_16  # partition-invariant

    con = duckdb.connect()
    con.register("t", pdf)
    # 'g' sorts after every hex char: the keep-all threshold for frac=1.0.
    # Digest-concat encoding (md5(key)||md5(stratum)||tag): fixed-width
    # fields, so no delimiter can alias distinct (key, stratum) pairs.
    want = sorted(x[0] for x in con.sql("""
        SELECT rid FROM t
        WHERE substring(md5(md5(doc_key) || md5(tld) || 'sample:7'), 1, 4) <
              CASE tld WHEN 'com' THEN '8000'
                       WHEN 'org' THEN '199a'
                       WHEN 'gov' THEN 'g' END
    """).fetchall())
    assert got == want  # exact cross-engine row-set parity

    samp = stratified_sample(df, fracs, "tld", "doc_key", seed=7)
    by = {r["tld"]: r["n"] for r in
          samp.groupBy("tld").agg(F.count("*").alias("n")).collect()}
    assert by.get("net") is None                 # unknown stratum dropped
    assert by["gov"] == 1000                     # fraction 1.0 keeps all
    assert abs(by["com"] / 1000 - 0.5) < 0.08
    assert abs(by["org"] / 1000 - 0.1) < 0.05
    # grouped keys sample together: every kept doc_key has both its rows
    pairs = samp.groupBy("doc_key", "tld").agg(F.count("*").alias("c"))
    # rid i and i+1 share a key but differ in tld, so count per (key, tld)
    # is 1; the cohesion property is that the SAME (key, stratum) decision
    # is a pure function of (key, stratum, seed) — asserted by the parity
    assert pairs.where("c > 1").count() == 0

    # independence from train_val_split: sampling then splitting must give
    # ~val_fraction of the SAMPLE, not half of it (the operators hash with
    # different salts; identical salts would nest the ranges)
    from pii_spark.training import train_val_split

    com = stratified_sample(df, {"com": 0.2}, "tld", "doc_key", seed=42)
    train, val = train_val_split(com, 0.10, seed=42, key_col="doc_key")
    n_tr, n_val = train.count(), val.count()
    assert n_tr > 0 and n_val / (n_tr + n_val) < 0.25

    # degenerate fractions: ~1.0 must keep ~all (the 5-char '10000'
    # threshold bug kept ~6%); null keys drop at ANY fraction
    near_all = stratified_sample(df, {"com": 0.9999999}, "tld", "doc_key")
    assert near_all.count() == 1000
    with_null = pd.concat([pdf, pd.DataFrame(
        [(9999, None, "gov"), (9998, None, "com")],
        columns=["rid", "doc_key", "tld"])])
    nulls = stratified_sample(spark.createDataFrame(with_null),
                              fracs, "tld", "doc_key", seed=7)
    assert nulls.where("doc_key is null").count() == 0


def test_stratified_sample_delimiter_keys_do_not_alias(spark):
    """A '|' inside the key or stratum must NOT correlate sampling
    decisions across distinct (key, stratum) pairs: under the old
    '|'-joined encoding, key 'a|b'/stratum 'c' and key 'a'/stratum 'b|c'
    hashed identically and sampled in lockstep at every fraction."""
    from pii_spark.training import stratified_sample

    df = spark.createDataFrame(
        [(0, "a|b", "c"), (1, "a", "b|c")], "rid long, k string, s string")
    agree = 0
    for frac in (0.1, 0.25, 0.5, 0.75, 0.9):
        kept = {r["rid"] for r in stratified_sample(
            df, {"c": frac, "b|c": frac}, "s", "k", seed=11).collect()}
        agree += (0 in kept) == (1 in kept)
    # independent hashes: the two rows must differ for at least one
    # fraction (lockstep across all five is the aliasing signature)
    assert agree < 5


def test_stratified_sample_numeric_strata_column(spark):
    """A non-string strata column must work (md5 needs an explicit string
    cast — the old concat_ws encoding coerced implicitly, so this was a
    regression risk when the digest encoding landed)."""
    from pii_spark.training import stratified_sample

    df = spark.createDataFrame(
        [(i, f"k{i}", i % 3) for i in range(300)],
        "rid long, k string, s int")
    got = stratified_sample(df, {0: 1.0, 1: 0.5, 2: 0.0}, "s", "k", seed=1)
    by = {r["s"]: r["n"] for r in
          got.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by[0] == 100 and by.get(2) is None and 20 < by[1] < 80


def test_stratified_sample_monotone_in_fraction(spark):
    """Raising a stratum's fraction only ADDS rows (hash thresholds are
    monotone, 'g' keep-all included): growing a mixture weight later must
    extend the previous sample, never resample it."""
    import pandas as pd

    from pii_spark.training import stratified_sample

    pdf = pd.DataFrame(
        [(i, f"k{i}", "web") for i in range(2000)],
        columns=["rid", "doc_key", "tld"])
    df = spark.createDataFrame(pdf)
    prev: set[int] = set()
    for frac in (0.05, 0.2, 0.5, 0.9, 0.9999999, 1.0):
        cur = {r["rid"] for r in stratified_sample(
            df, {"web": frac}, "tld", "doc_key", seed=3)
            .select("rid").collect()}
        assert prev <= cur, f"fraction {frac} lost rows"
        prev = cur
    assert prev == set(range(2000))  # 1.0 keeps everything
