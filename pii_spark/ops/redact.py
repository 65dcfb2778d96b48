"""Redacted-text output stage (JVM-side twin of ``pii_core.redact``).

Builds the publishable masked text from the ``spans`` array the extraction
job already emits — pure builtin higher-order functions, so redaction of a
100 TB results table is one whole-stage-codegen projection: no UDF, no
shuffle, no second pass over the raw pages. The splice is a single
``aggregate`` over the (sorted, non-overlapping) span array with a
``(cursor, acc)`` struct accumulator.

Semantics parity with ``pii_core.redact.redact`` (same modes, same
PII-type gating, non-PII spans untouched) is pinned by
``tests/test_redact.py`` on real extraction output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pii_core.labels import PII_TYPES
from pii_core.redact import MODES


def redact_expr(text: Column, spans: Column, mode: str = "tag") -> Column:
    """Column expression: ``text`` with PII spans replaced per ``mode``
    ("tag" -> ``[TYPE]``, "mask" -> ``*`` x length). ``spans`` must be the
    pipeline's merged/resolved array (sorted, non-overlapping) — malformed
    arrays RAISE at execution, mirroring ``pii_core.redact.redact``'s hard
    error: a mis-splice here would re-emit PII interior into the
    "redacted" text, so fail-open is not an option."""
    if mode not in MODES:
        raise ValueError(f"unknown redaction mode: {mode!r} (use tag|mask)")
    pii_types = list(PII_TYPES)
    # NULL-type spans must REACH the ok-check below, not vanish here: a
    # bare isin() yields NULL for them and F.filter drops NULL-predicate
    # elements, which would splice the text with that span UNREDACTED — a
    # silent fail-open. Keep them in; the ok accumulator refuses them.
    pii = F.filter(spans,
                   lambda s: s["type"].isNull() | s["type"].isin(pii_types))

    # ONE fused pass: the splice accumulator also carries an `ok` flag
    # (the cursor only moves forward, so sortedness + non-overlap +
    # in-bounds reduce to "every span starts at or after the cursor and
    # ends inside the text"); the finish lambda yields NULL instead of a
    # possibly mis-spliced string whenever a check failed (a null struct
    # element null-propagates into ok and lands here too).
    init = F.struct(F.lit(0).alias("pos"), F.lit("").alias("acc"),
                    F.lit(True).alias("ok"))

    def merge(acc: Column, s: Column) -> Column:
        repl = (F.concat(F.lit("["), s["type"], F.lit("]")) if mode == "tag"
                else F.repeat(F.lit("*"), s["end"] - s["start"]))
        return F.struct(
            s["end"].alias("pos"),
            F.concat(
                acc["acc"],
                F.substring(text, acc["pos"] + 1, s["start"] - acc["pos"]),
                repl,
            ).alias("acc"),
            (acc["ok"] & s["type"].isNotNull()
             & (s["start"] >= acc["pos"])
             & (s["end"] >= s["start"])
             & (s["end"] <= F.length(text))).alias("ok"),
        )

    spliced = F.aggregate(
        pii, init, merge,
        lambda acc: F.when(
            acc["ok"],
            F.concat(acc["acc"],
                     F.substring(text, acc["pos"] + 1,
                                 F.length(text) - acc["pos"]))),
    )
    # Null handling is explicit so the failure diagnosis is accurate: a
    # null text redacts to null (nothing to publish); a null spans array
    # under non-null text means the text was never scanned — fail closed,
    # loudly, with a message that does not blame span ordering.
    return (
        F.when(text.isNull(), F.lit(None).cast("string"))
        .when(spans.isNull(), F.raise_error(F.lit(
            "redact_expr: spans is NULL for a non-null text — cannot "
            "assert the text was scanned; filter or repair such rows "
            "before redacting")))
        .when(spliced.isNotNull(), spliced)
        .otherwise(F.raise_error(F.lit(
            "redact_expr: spans array is not sorted/non-overlapping/"
            "in-bounds, or a span struct has NULL fields (requires "
            "merge_and_resolve output) — refusing a mis-splice that "
            "could leak PII")))
    )


def redact_results(results: DataFrame, mode: str = "tag") -> DataFrame:
    """Extraction results + a ``redacted_text`` column. Rows the pipeline
    quarantined (``error`` set) get an EMPTY redaction, never a partially
    scanned text: an unscanned page must not leak through the redactor."""
    redacted = redact_expr(F.col("extracted_text"), F.col("spans"), mode)
    if "error" in results.columns:
        redacted = F.when(F.col("error").isNotNull(), F.lit("")) \
            .otherwise(redacted)
    return results.withColumn("redacted_text", redacted)
