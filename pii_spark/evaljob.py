"""Eval metrics job (reference A4-A7, /root/reference/infer_pii.py:683-1097).

Distributed re-expression of the reference ``eval`` subcommand's metric
accumulators: strict span-level match (set intersection of (start,end,type)
keys — reference infer_pii.py:962-993), document-level binary confusion for
``has_pii`` (infer_pii.py:995-1022), and P/R/F1 (eval_report.py:80-113,
P1 = binary-PII F1 per eval_report.py:403).

All per-doc work is builtin array expressions (array_intersect/size — the
reference's Python set ops, reference O6); only the final tiny reduce
crosses partitions. Per-type metrics come from one explode + groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pii_core.labels import PII_TYPES


def _key_arr(col: str) -> F.Column:
    """spans -> array<string> of 'start:end:type' strict-match keys."""
    return F.array_distinct(
        F.transform(
            F.col(col),
            lambda s: F.concat_ws(":", s.start.cast("string"),
                                  s.end.cast("string"), s.type),
        )
    )


def span_metrics(pred: DataFrame, gold: DataFrame) -> dict:
    """Strict span metrics + binary PII confusion between two frames of
    (url, spans). Returns a plain dict (driver-side arithmetic on ONE
    aggregated row, like the reference's final report step)."""
    pii = list(PII_TYPES)
    j = (
        pred.select("url", F.col("spans").alias("pred_spans"))
        .join(gold.select("url", F.col("spans").alias("gold_spans")), "url", "full")
        .select(
            F.coalesce(_key_arr("pred_spans"), F.array()).alias("pk"),
            F.coalesce(_key_arr("gold_spans"), F.array()).alias("gk"),
            F.coalesce(
                F.exists("pred_spans", lambda s: s.type.isin(pii)), F.lit(False)
            ).alias("pred_pii"),
            F.coalesce(
                F.exists("gold_spans", lambda s: s.type.isin(pii)), F.lit(False)
            ).alias("gold_pii"),
        )
    )
    row = j.agg(
        F.sum(F.size(F.array_intersect("pk", "gk"))).alias("tp"),
        F.sum(F.size("pk")).alias("pred_pos"),
        F.sum(F.size("gk")).alias("true_pos"),
        F.sum((F.col("pred_pii") & F.col("gold_pii")).cast("long")).alias("btp"),
        F.sum((F.col("pred_pii") & ~F.col("gold_pii")).cast("long")).alias("bfp"),
        F.sum((~F.col("pred_pii") & F.col("gold_pii")).cast("long")).alias("bfn"),
        F.sum((~F.col("pred_pii") & ~F.col("gold_pii")).cast("long")).alias("btn"),
        F.count("*").alias("docs"),
    ).collect()[0]

    def prf(tp: int, pp: int, ap: int) -> tuple[float, float, float]:
        p = tp / pp if pp else 0.0
        r = tp / ap if ap else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f

    sp, sr, sf1 = prf(row.tp, row.pred_pos, row.true_pos)
    bp, br, bf1 = prf(row.btp, row.btp + row.bfp, row.btp + row.bfn)
    acc = (row.btp + row.btn) / row.docs if row.docs else 0.0
    return {
        "docs": row.docs,
        "span_strict": {"tp": row.tp, "pred": row.pred_pos, "gold": row.true_pos,
                        "precision": sp, "recall": sr, "f1": sf1},
        "binary_pii": {"tp": row.btp, "fp": row.bfp, "fn": row.bfn, "tn": row.btn,
                       "precision": bp, "recall": br, "f1": bf1,
                       "accuracy": acc},
        "p1": bf1,
    }


def per_type_metrics(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-type strict span tp/pred/gold + PRF as a DataFrame (reference
    infer_pii.py:1058-1072)."""
    def keyed(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select("url", F.explode("spans").alias("s"))
            .select(
                "url",
                F.col("s.type").alias("type"),
                F.concat_ws(":", F.col("s.start").cast("string"),
                            F.col("s.end").cast("string"),
                            F.col("s.type")).alias("k"),
            )
            .dropDuplicates(["url", "k"])
            .withColumn("side", F.lit(side))
        )

    both = keyed(pred, "pred").unionByName(keyed(gold, "gold"))
    counts = (
        both.groupBy("url", "k", "type")
        .agg(
            F.max(F.when(F.col("side") == "pred", 1).otherwise(0)).alias("in_pred"),
            F.max(F.when(F.col("side") == "gold", 1).otherwise(0)).alias("in_gold"),
        )
        .groupBy("type")
        .agg(
            F.sum(F.col("in_pred") * F.col("in_gold")).alias("tp"),
            F.sum("in_pred").alias("pred"),
            F.sum("in_gold").alias("gold"),
        )
    )
    p = F.when(F.col("pred") > 0, F.col("tp") / F.col("pred")).otherwise(0.0)
    r = F.when(F.col("gold") > 0, F.col("tp") / F.col("gold")).otherwise(0.0)
    return counts.select(
        "type", "tp", "pred", "gold",
        p.alias("precision"), r.alias("recall"),
        F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0).alias("f1"),
    ).orderBy("type")


def render_report(metrics: dict, per_type_rows: list | None = None) -> str:
    """Markdown eval report (reference S7, eval_report.py:240-372): headline
    P1, binary confusion, strict span PRF, per-type table."""
    b = metrics["binary_pii"]
    s = metrics["span_strict"]
    lines = [
        "# PII extraction eval report",
        "",
        f"Documents evaluated: **{metrics['docs']}**",
        "",
        f"## P1 (binary has-PII F1): **{metrics['p1']:.4f}**",
        "",
        "## Binary PII confusion",
        "",
        "| | gold + | gold - |",
        "|---|---|---|",
        f"| pred + | {b['tp']} | {b['fp']} |",
        f"| pred - | {b['fn']} | {b['tn']} |",
        "",
        f"precision {b['precision']:.4f} · recall {b['recall']:.4f} · "
        f"f1 {b['f1']:.4f} · accuracy {b['accuracy']:.4f}",
        "",
        "## Strict span match (start, end, type)",
        "",
        f"tp {s['tp']} / pred {s['pred']} / gold {s['gold']} — "
        f"precision {s['precision']:.4f} · recall {s['recall']:.4f} · "
        f"f1 {s['f1']:.4f}",
    ]
    if per_type_rows:
        lines += ["", "## Per-type strict metrics", "",
                  "| type | tp | pred | gold | P | R | F1 |",
                  "|---|---|---|---|---|---|---|"]
        for r in per_type_rows:
            lines.append(
                f"| {r['type']} | {r['tp']} | {r['pred']} | {r['gold']} | "
                f"{r['precision']:.4f} | {r['recall']:.4f} | {r['f1']:.4f} |")
    return "\n".join(lines) + "\n"


def write_report(pred, gold, path: str) -> dict:
    """Full eval job: metrics + per-type + markdown report to ``path``.
    Returns the metrics dict (reference `eval` subcommand shape)."""
    m = span_metrics(pred, gold)
    per_type = [r.asDict() for r in per_type_metrics(pred, gold).collect()]
    with open(path, "w") as f:
        f.write(render_report(m, per_type))
    return m


def token_metrics(pred, gold, text_col: str = "extracted_text") -> dict:
    """Token-level metric accumulators (reference A4,
    infer_pii.py:716-724,919-960): tokenize each document with the shared
    offset tokenizer, label every token by span containment (PII-only view),
    count tp / predicted-positive / gold-positive per doc in a vectorized
    pandas UDF, then one tiny sum.

    pred must carry (url, text_col, spans); gold carries (url, spans).
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    from pii_core.labels import PII_TYPES  # noqa: PLC0415
    from pii_core.tokenizer import WordTokenizer  # noqa: PLC0415

    pii = frozenset(PII_TYPES)

    j = (
        pred.select("url", F.col(text_col).alias("txt"),
                    F.col("spans").alias("ps"))
        .join(gold.select("url", F.col("spans").alias("gs")), "url", "inner")
    )

    def covered(offs, spans) -> list[bool]:
        ivs = sorted((s["start"], s["end"]) for s in spans
                     if s["type"] in pii)
        out, k = [], 0
        for a, b in offs:
            while k < len(ivs) and ivs[k][1] <= a:
                k += 1
            out.append(k < len(ivs) and ivs[k][0] < b)
        return out

    def counts(batches):
        tok = WordTokenizer()
        for pdf in batches:
            rows = []
            for text, p, g in zip(pdf["txt"], pdf["ps"], pdf["gs"]):
                offs = tok.encode(text or "")
                pc = covered(offs, p if p is not None else [])
                gc = covered(offs, g if g is not None else [])
                rows.append({
                    "tp": sum(1 for x, y in zip(pc, gc) if x and y),
                    "pred_pos": sum(pc),
                    "gold_pos": sum(gc),
                    "n_tok": len(offs),
                })
            yield pd.DataFrame(
                rows, columns=["tp", "pred_pos", "gold_pos", "n_tok"])

    row = (
        j.mapInPandas(
            counts, schema="tp long, pred_pos long, gold_pos long, n_tok long")
        .agg(F.sum("tp").alias("tp"),
             F.sum("pred_pos").alias("pred_pos"),
             F.sum("gold_pos").alias("gold_pos"),
             F.sum("n_tok").alias("n_tok"))
        .collect()[0]
    )
    p = row.tp / row.pred_pos if row.pred_pos else 0.0
    r = row.tp / row.gold_pos if row.gold_pos else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": row.tp, "pred_pos": row.pred_pos, "gold_pos": row.gold_pos,
            "n_tokens": row.n_tok, "precision": p, "recall": r, "f1": f1}
