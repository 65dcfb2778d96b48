#!/usr/bin/env python
"""spark-submit entrypoint for the extraction job (north rule: "submitted
via spark-submit --py-files").

Usage:
  python scripts/make_pyfiles_zip.py                       # build dist/pii_libs.zip
  spark-submit --master local[8] --py-files dist/pii_libs.zip \
      scripts/submit_extract.py --input <pages_parquet_dir> \
      --output out/results --lineage out/lineage [--run-id <unique>] [--synth N]

On a cluster the same invocation works with --master yarn/k8s etc.; the zip
ships identical pii_core/pii_spark bytes to every executor, which is what
guarantees byte-identical output regardless of where a document lands.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--synth", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    # run ids must be FRESH per increment (resume.run_incremental rejects
    # reuse); default to a wall-clock-derived id so repeated submissions
    # just work. Pass an explicit id for replayable/audited runs.
    ap.add_argument(
        "--run-id",
        default=None,
        help="unique id for this increment (default: run-<epoch-ms>)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument(
        "--redact", choices=["tag", "mask"], default=None,
        help="also write publishable redacted text ([TYPE] tags or "
             "length-preserving * masks) to <output>.redacted/<run_id>")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pii-extract").getOrCreate()

    from pii_spark.resume import run_incremental
    from pii_spark.synth import pages_df

    if args.synth:
        pages = pages_df(spark, args.synth, seed=42)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input / --synth required")

    run_id = args.run_id
    if run_id is None:
        import time  # noqa: PLC0415

        run_id = f"run-{int(time.time() * 1000)}"

    out = run_incremental(
        spark, pages, args.output, args.lineage, run_id,
        num_partitions=args.partitions,
    )
    if args.redact:
        # one codegen projection over THIS run's committed results — reads
        # back the landed parquet, never re-runs extraction
        from pyspark.sql import functions as F

        from pii_spark.ops.redact import redact_results
        from pii_spark.resume import _committed_schema

        committed = (
            spark.read.schema(_committed_schema()).parquet(args.output)
            .where(F.col("run_id") == run_id)
        )
        rdir = f"{args.output.rstrip('/')}.redacted/{run_id}"
        redact_results(committed, args.redact).select(
            "url", "redacted_text", "should_be_public"
        ).write.mode("error").parquet(rdir)
        out["redacted_dir"] = rdir
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
