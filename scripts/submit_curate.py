#!/usr/bin/env python
"""spark-submit entrypoint for the corpus-curation + training-mix job.

Usage:
  python scripts/make_pyfiles_zip.py                      # build dist/pii_libs.zip
  spark-submit --master local[8] --py-files dist/pii_libs.zip \
      scripts/submit_curate.py --input <docs_parquet> --output out/curated \
      [--budgets '{"web": 1000000, "books": 250000}' | --budgets @recipe.json] \
      [--host-cap N] [--bench-keys <keys_parquet> | --benchmarks <texts_parquet>] \
      [--write-mix out/mix] [--report out/report]

The input needs (doc_id, text); the mix stage additionally needs source
(and host iff --host-cap). Stage DAGs execute exactly once — the parquet
write — and all counts/exports read the committed files
(pii_spark/curatejob.py holds the orchestration; this file is argv only).
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="docs parquet (doc_id, text[, source, host])")
    ap.add_argument("--output", required=True,
                    help="curate audit frame dir; the mix audit lands at "
                         "<output>.mix")
    ap.add_argument("--overwrite", action="store_true")
    # curation knobs (CurationConfig defaults when omitted)
    ap.add_argument("--min-tokens", type=int, default=30)
    ap.add_argument("--line-dedup-max-doc-freq", type=int, default=None,
                    metavar="K", help="drop lines in > K distinct docs "
                    "(default: stage off)")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--near-dup-jaccard-pm", type=int, default=500,
                    metavar="PM", help="near-dup verify threshold "
                    "(Jaccard x1000); pass -1 to disable the stage")
    # mix knobs (stage runs iff --budgets is given)
    ap.add_argument("--budgets", default=None, metavar="JSON|@FILE",
                    help="per-source token budgets — the recipe itself")
    ap.add_argument("--host-cap", type=int, default=None, metavar="TOK")
    ap.add_argument("--decon-n", type=int, default=13,
                    help="decontamination gram size; pass -1 to disable "
                         "the stage")
    ap.add_argument("--min-hits", type=int, default=1)
    ap.add_argument("--bench-keys", default=None, metavar="DIR",
                    help="persisted benchmark_gram_keys artifact (the "
                         "incremental path)")
    ap.add_argument("--benchmarks", default=None, metavar="DIR",
                    help="benchmark texts parquet (doc_id, text) — grams "
                         "derived inline")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--write-mix", default=None, metavar="DIR",
                    help="also export the kept mix rows")
    ap.add_argument("--report", default=None, metavar="DIR",
                    help="also write mixture_report accounting")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pii_spark.curatejob import run_curation_job
    from pii_spark.curation import CurationConfig, MixConfig

    curation = CurationConfig(
        min_tokens=args.min_tokens,
        line_dedup_max_doc_freq=args.line_dedup_max_doc_freq,
        exact_dedup=not args.no_exact_dedup,
        near_dup_jaccard_pm=(None if args.near_dup_jaccard_pm < 0
                             else args.near_dup_jaccard_pm),
    )
    mix = None
    if args.budgets is not None:
        raw = args.budgets
        if raw.startswith("@"):
            with open(raw[1:]) as f:
                raw = f.read()
        budgets = {k: int(v) for k, v in json.loads(raw).items()}
        mix = MixConfig(
            budgets=budgets,
            decontaminate_n=None if args.decon_n < 0 else args.decon_n,
            decontaminate_min_hits=args.min_hits,
            max_tokens_per_host=args.host_cap,
            seed=args.seed,
        )
    elif args.host_cap is not None or args.bench_keys or args.benchmarks:
        ap.error("--host-cap/--bench-keys/--benchmarks need --budgets "
                 "(the mix stage runs as one DAG)")

    spark = SparkSession.builder.appName("pii-curate").getOrCreate()
    out = run_curation_job(
        spark,
        spark.read.parquet(args.input),
        args.output,
        curation=curation,
        mix=mix,
        bench_keys=(spark.read.parquet(args.bench_keys)
                    if args.bench_keys else None),
        benchmarks=(spark.read.parquet(args.benchmarks)
                    if args.benchmarks else None),
        write_mix_dir=args.write_mix,
        report_dir=args.report,
        overwrite=args.overwrite,
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
