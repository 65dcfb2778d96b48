"""Redaction output stage: pii_core semantics + Spark expression parity."""

from __future__ import annotations

import pytest

from pii_core.labels import PII_TYPES
from pii_core.redact import redact
from pii_core.spans import Span


def test_tag_mode_replaces_pii_with_type_tags():
    text = "Contato de Maria Silva: maria@x.org, processo 123."
    spans = [Span(11, 22, "NOME_PESSOA", 0.9, 2),
             Span(24, 35, "CONTATO", 0.9, 1)]
    assert redact(text, spans) == \
        "Contato de [NOME_PESSOA]: [CONTATO], processo 123."


def test_mask_mode_preserves_length_and_offsets():
    text = "CPF 529.982.247-25 em anexo."
    spans = [Span(4, 18, "DOC_PESSOAL", 1.0, 1)]
    out = redact(text, spans, mode="mask")
    assert out == "CPF ************** em anexo."
    assert len(out) == len(text)
    # unredacted regions keep their original offsets
    assert out[19:] == text[19:]


def test_non_pii_spans_survive():
    text = "Empresa ACME LTDA, CNPJ na base."
    spans = [Span(8, 17, "ORG_JURIDICA", 0.9, 2)]
    assert "ORG_JURIDICA" not in set(PII_TYPES)
    assert redact(text, spans) == text
    assert redact(text, spans, mode="mask") == text


def test_adjacent_and_boundary_spans():
    text = "abcdef"
    spans = [Span(0, 2, "CONTATO", 1.0, 1), Span(2, 4, "NOME_PESSOA", 1.0, 1)]
    assert redact(text, spans, mode="mask") == "****ef"
    assert redact(text, [Span(0, 6, "CONTATO", 1.0, 1)], "mask") == "******"
    assert redact("", []) == ""


def test_overlap_and_bounds_are_hard_errors():
    with pytest.raises(ValueError, match="overlapping"):
        redact("abcdef", [Span(0, 3, "CONTATO", 1.0, 1),
                          Span(2, 5, "NOME_PESSOA", 1.0, 1)])
    with pytest.raises(ValueError, match="outside text"):
        redact("abc", [Span(0, 9, "CONTATO", 1.0, 1)])
    with pytest.raises(ValueError, match="unknown redaction mode"):
        redact("abc", [], mode="blackout")


def test_spark_redactor_refuses_malformed_spans(spark):
    """The JVM splice must mirror pii_core's hard error on malformed span
    arrays: a contained/unsorted span would rewind the cursor and re-emit
    PII interior into 'redacted' text — raise, never mis-splice."""
    from pyspark.sql import functions as F

    import pytest

    from pii_spark.ops.redact import redact_expr
    from pii_spark.schemas import SPAN_STRUCT
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("t", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False)),
    ])
    # SPAN_STRUCT order: (type, start, end, value, conf, n_tokens)
    df = spark.createDataFrame(
        [("abcdefghijklmno",
          [("CONTATO", 0, 10, "abcdefghij", 1.0, 1),
           ("NOME_PESSOA", 2, 4, "cd", 1.0, 1)])], schema)
    with pytest.raises(Exception, match="refusing a mis-splice"):
        df.select(redact_expr(F.col("t"), F.col("spans"), "mask")).collect()
    # out-of-bounds span: same refusal
    df2 = spark.createDataFrame(
        [("abc", [("CONTATO", 0, 9, "x", 1.0, 1)])], schema)
    with pytest.raises(Exception, match="refusing a mis-splice"):
        df2.select(redact_expr(F.col("t"), F.col("spans"), "tag")).collect()


def test_spark_redaction_parity(spark):
    """The JVM aggregate-HOF splice must byte-match pii_core.redact on real
    extraction output, both modes, including pages with zero spans and
    quarantined pages (empty redaction, fail-closed)."""
    from pii_spark.extract import extract_pages
    from pii_spark.ops.redact import redact_results
    from pii_spark.synth import pages_df

    results = extract_pages(pages_df(spark, 60, seed=31),
                            num_partitions=4).cache()
    try:
        for mode in ("tag", "mask"):
            rows = redact_results(results, mode).select(
                "url", "extracted_text", "spans", "error",
                "redacted_text").collect()
            assert rows and any(r["spans"] for r in rows)
            for r in rows:
                if r["error"] is not None:
                    assert r["redacted_text"] == ""
                    continue
                spans = [Span(s["start"], s["end"], s["type"],
                              s["conf"], s["n_tokens"]) for s in r["spans"]]
                assert r["redacted_text"] == redact(
                    r["extracted_text"], spans, mode), (r["url"], mode)
                if mode == "mask":
                    assert len(r["redacted_text"]) == len(r["extracted_text"])
    finally:
        results.unpersist()


def test_redact_null_text_and_null_spans(spark):
    """Nulls from externally-stored tables: null text redacts to null
    (nothing to publish); null spans under non-null text raises with an
    ACCURATE message (the text was never scanned — fail closed), not the
    span-ordering diagnosis."""
    from pii_spark.ops.redact import redact_results

    schema = ("url string, extracted_text string, spans array<struct<"
              "type:string,start:int,end:int,value:string,conf:double,"
              "n_tokens:int>>")
    df = spark.createDataFrame(
        [("a", None, []), ("b", "texto ok", []),
         ("c", "cpf aqui", [{"type": "DOC_PESSOAL", "start": 0, "end": 3,
                             "value": "cpf", "conf": 1.0, "n_tokens": 1}])],
        schema)
    rows = {r["url"]: r["redacted_text"]
            for r in redact_results(df, "tag").collect()}
    assert rows["a"] is None
    assert rows["b"] == "texto ok"
    assert rows["c"] == "[DOC_PESSOAL] aqui"

    df2 = spark.createDataFrame([("d", "texto real", None)], schema)
    with pytest.raises(Exception, match="spans is NULL"):
        redact_results(df2, "tag").collect()


def test_null_span_field_gets_accurate_diagnostic(spark):
    """ADVICE r4, upgraded: a span struct with valid offsets but a NULL
    type was not merely misdiagnosed — the PII `isin` pre-filter yields a
    NULL predicate, F.filter DROPS the element, and the text spliced with
    that span UNREDACTED (silent fail-open, worse than the flagged wrong
    error text). NULL-type spans must now reach the `ok` accumulator and
    be refused with a message naming NULL struct fields."""
    import pytest
    from pyspark.sql import functions as F

    from pii_spark.ops.redact import redact_expr

    schema = ("t string, spans array<struct<"
              "type:string,start:int,end:int,value:string,conf:double,"
              "n_tokens:int>>")
    df = spark.createDataFrame(
        [("abcdef", [{"type": None, "start": 1, "end": 3, "value": "bc",
                      "conf": 1.0, "n_tokens": 1}])], schema)
    for mode in ("tag", "mask"):
        with pytest.raises(Exception, match="NULL fields"):
            df.select(redact_expr(F.col("t"), F.col("spans"), mode)).collect()
