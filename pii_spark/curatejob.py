"""Batch curation + training-mix job: the production orchestration around
``curation.curate`` and ``curation.assemble_mix``, structured like the
extraction job (``resume.run_incremental``): ONE execution of each DAG —
the parquet write — with every downstream read (drop-reason counts, the
mix input, the kept export, the report) served from the COMMITTED files,
never by re-running the plan.

The reference engine has no corpus-curation tooling; this is the
submission surface for the LLM-data-pipeline family the engine adds
(``scripts/submit_curate.py`` is the spark-submit wrapper).

Scale notes: the only frames this module itself creates are id-keyed
joins of committed survivors back to the input's (doc_id, source, host)
projection — skinny columns, never a second pass over text the curate DAG
already carried. Output layout:

* ``<output>``           — curate audit frame (doc_id, text, drop_reason)
* ``<output>.mix``       — assemble_mix audit frame (when budgets given)
* ``write_mix_dir``      — kept mix rows only (optional export)
* ``report_dir``         — mixture_report accounting (optional)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pii_spark.curation import CurationConfig, MixConfig, assemble_mix, curate


def _reason_counts(df: DataFrame) -> dict[str, int]:
    return {
        (r["drop_reason"] or "kept"): int(r["n"])
        for r in df.groupBy("drop_reason").agg(F.count("*").alias("n"))
        .collect()
    }


def run_curation_job(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    *,
    curation: CurationConfig | None = None,
    mix: MixConfig | None = None,
    bench_keys: DataFrame | None = None,
    benchmarks: DataFrame | None = None,
    write_mix_dir: str | None = None,
    report_dir: str | None = None,
    overwrite: bool = False,
) -> dict:
    """Run curate (and, when ``mix`` is given, assemble_mix over the
    curate survivors) writing each audit frame exactly once; returns a
    summary dict with per-stage drop-reason counts.

    ``docs`` needs (doc_id, text); the mix stage additionally needs
    ``source`` (the recipe key) and — iff the host cap is enabled —
    ``host``. The mix consumes the CURATED text (line-dedup may have
    rewritten it) joined back to the input's skinny (doc_id, source,
    host) projection.

    Recovery: writes default to ``errorifexists`` so a rerun cannot
    silently clobber committed audit frames; after a crash mid-job
    (e.g. the mix write failed after curate landed) rerun with
    ``overwrite=True`` — curation is deterministic, so the replaced
    frames are byte-equal, and this job intentionally has no
    increment/marker protocol (it is a full-corpus batch; incremental
    crawls go through ``resume.run_incremental`` + the band index).
    """
    if mix is not None:
        missing = [c for c in ("source",) if c not in docs.columns]
        if mix.max_tokens_per_host is not None and "host" not in docs.columns:
            if "url" in docs.columns:
                # the crawl schema carries url, not host — derive the cap
                # key with the same parser the lineage/host stats use so
                # every surface buckets hosts identically
                from pii_spark.ops.urls import host_of  # noqa: PLC0415

                docs = docs.withColumn("host", host_of(F.col("url")))
            else:
                missing.append("host")
        if missing:
            raise ValueError(
                f"mix stage needs input column(s) {missing} (host may be "
                "derived automatically when a url column is present)")
    mode = "overwrite" if overwrite else "errorifexists"

    curated = curate(docs, curation)
    curated.write.mode(mode).parquet(output_dir)
    committed = spark.read.parquet(output_dir)
    out = {
        "curated_dir": output_dir,
        "docs_in": committed.count(),
        "curation": _reason_counts(committed),
    }
    if mix is None:
        return out

    keep_cols = ["doc_id", "source"] + (
        ["host"] if "host" in docs.columns else [])
    mix_input = (
        committed.where(F.col("drop_reason").isNull())
        .select("doc_id", "text")
        .join(docs.select(*keep_cols), "doc_id")
    )
    if "host" not in mix_input.columns:
        mix_input = mix_input.withColumn("host", F.lit(None).cast("string"))
    mixed = assemble_mix(mix_input, mix, bench_keys=bench_keys,
                         benchmarks=benchmarks)
    mix_dir = output_dir.rstrip("/") + ".mix"
    mixed.write.mode(mode).parquet(mix_dir)
    mixed_committed = spark.read.parquet(mix_dir)
    out["mix_dir"] = mix_dir
    out["mix"] = _reason_counts(mixed_committed)

    kept = mixed_committed.where(F.col("drop_reason").isNull())
    if write_mix_dir is not None:
        kept.drop("drop_reason").write.mode(mode).parquet(write_mix_dir)
        out["mix_export_dir"] = write_mix_dir
    if report_dir is not None:
        from pii_spark.ops.mixing import mixture_report  # noqa: PLC0415

        mixture_report(mix_input, kept, mix.budgets) \
            .write.mode(mode).parquet(report_dir)
        out["report_dir"] = report_dir
    return out
