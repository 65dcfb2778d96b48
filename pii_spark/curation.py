"""End-to-end corpus curation: the production DAG a training-data team
runs over a crawl, composed from this engine's operators with an explicit
drop-reason audit trail.

Stage order (each stage sees only survivors of the previous ones, the
order real pipelines use):

1. **line-level boilerplate removal** (optional, ``ops.dedup.line_dedup``)
   — transforms text, drops nothing.
2. **quality gates** — token count + Gopher repetition signals
   (``ops.textstats.repetition_stats`` / ``ngram_repetition_stats``);
   cheap doc-local filters run BEFORE any corpus-wide dedup work.
3. **exact dedup** — whitespace-normalized md5 fingerprint, keep the
   minimum doc id per group.
4. **near dedup** — MinHash+LSH candidates → exact-Jaccard verify →
   connected components → keep each cluster's minimum id
   (``ops.dedup._shingles`` / ``_jaccard_on_candidates`` /
   ``connected_components``: the dedup_lsh_jaccard + dedup_clusters
   composition).

``curate`` returns ONE frame: every input doc id with its (possibly
line-deduped) text and a ``drop_reason`` — null for survivors, else the
FIRST stage that killed it (``too_short`` / ``repetitive`` /
``exact_dup`` / ``near_dup``), or ``null_id`` for rows with no id at all
(un-addressable by any id join: the stage machinery could neither score
nor dedup them — quarantined, not silently lost or passed through).
Nothing silently disappears: the audit is
``groupBy(drop_reason).count()`` away, and the kept corpus is
``where drop_reason is null``. Every stage is shuffle-disciplined by its
underlying operator (hashes and ids move, text moves only doc-locally);
see each operator's own docstring for its 100 TB story.

NOT fully lazy when near-dedup is on: the connected-components loop runs
a driver action per round, so ``curate`` transiently persists three
frames for the loop's duration — the skinny (id, fp) exact-dedup frame
(~0.13x the text footprint, measured), the (id, text) near-dedup
survivors (the verify stage reads the text four times; caching the
exploded shingles instead would pin 3.4x the text), and the verified
pairs — all released before returning (persist keeps lineage, so
executor loss recomputes instead of breaking the frame; the small
id-only loser frames are localCheckpointed so the returned stitch
re-runs the upstream once, not twice). With
``near_dup_jaccard_pm=None`` the returned plan is fully lazy. Cache the
returned frame if you will run several actions over it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pii_spark.ops.decontaminate import contamination
from pii_spark.ops.dedup import (
    _jaccard_on_candidates,
    connected_components,
    line_dedup,
    normalized_fp,
)
from pii_spark.ops.mixing import (
    _check_budgets,
    cap_host_tokens,
    sample_mixture,
)
from pii_spark.ops.textstats import (
    with_dup_line_stats,
    with_ngram_repetition_stats,
)


@dataclass(frozen=True)
class CurationConfig:
    # Gopher-family thresholds (per-mille); None disables a gate
    min_tokens: int | None = 30
    max_dup_line_pm: int | None = 300
    max_top_2gram_char_pm: int | None = 200
    max_dup_5gram_char_pm: int | None = 300
    # line-level boilerplate: drop lines in > this many docs; None = off
    line_dedup_max_doc_freq: int | None = None
    # normalized-fingerprint exact dedup (stage 3)
    exact_dedup: bool = True
    # near-dup verification threshold (Jaccard x1000); None disables stage 4
    near_dup_jaccard_pm: int | None = 500

    def __post_init__(self) -> None:
        for name in ("min_tokens", "max_dup_line_pm",
                     "max_top_2gram_char_pm", "max_dup_5gram_char_pm",
                     "near_dup_jaccard_pm"):
            v = getattr(self, name)
            if v is not None and v < 0:
                raise ValueError(f"{name} must be >= 0, got {v}")
        # matches line_dedup's own bound so a bad value fails at CONFIG
        # time with the same contract, not later inside curate()
        if (self.line_dedup_max_doc_freq is not None
                and self.line_dedup_max_doc_freq < 1):
            raise ValueError(
                f"line_dedup_max_doc_freq must be >= 1, got "
                f"{self.line_dedup_max_doc_freq}")
        # the repetition metrics are per-mille values CAPPED at 1000, so a
        # gate threshold >= 1000 can never fire — reject the dead config
        # instead of silently keeping everything
        for name in ("max_dup_line_pm", "max_top_2gram_char_pm",
                     "max_dup_5gram_char_pm"):
            v = getattr(self, name)
            if v is not None and v >= 1000:
                raise ValueError(
                    f"{name} >= 1000 can never fire (metric is per-mille, "
                    f"capped at 1000); got {v} — use None to disable the "
                    "gate")


def curate(docs: DataFrame, cfg: CurationConfig | None = None,
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text, drop_reason) for every input doc — see module docstring."""
    cfg = cfg or CurationConfig()
    # NULL-id rows are quarantined up front with drop_reason='null_id'
    # (unioned back into the result below): they are un-addressable by
    # every id join in the stage machinery — the ngram-stats INNER join
    # silently dropped them from the OUTPUT (violating the every-input-doc
    # contract), and the dedup stages' loser anti-joins could never drop
    # them (a NULL-id duplicate would always survive).
    null_rows = docs.where(F.col(id_col).isNull()).select(
        F.col(id_col), F.col(text_col).alias("text"),
        F.lit("null_id").alias("drop_reason"))
    docs = docs.where(F.col(id_col).isNotNull())
    d = docs.select(F.col(id_col), F.col(text_col).alias("text"))
    if cfg.line_dedup_max_doc_freq is not None:
        d = line_dedup(d, cfg.line_dedup_max_doc_freq, id_col=id_col,
                       text_col="text")

    # --- stage 2: doc-local quality gates -------------------------------
    # NULL text counts as ZERO tokens, not NULL: size(split(NULL)) is NULL,
    # a NULL n_tok makes every gate predicate NULL (never fires), and a
    # NULL normalized_fp never matches a join key — so a crawl row with no
    # text would sail through every stage and emerge as a keepable survivor
    # (fail-open for a quality gate). As an empty doc it hits the
    # min_tokens gate like any other empty text.
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    sig = d.withColumn(
        "n_tok",
        F.when(F.col("text").isNull(), F.lit(0)).otherwise(F.size(toks)))
    if cfg.max_dup_line_pm is not None:
        # inline narrow projection (docs with no non-blank lines read 0);
        # curate never reads the bigram half of repetition_stats
        sig = with_dup_line_stats(sig, text_col="text") \
            .drop("dup_line_char_pm")
    if (cfg.max_top_2gram_char_pm is not None
            or cfg.max_dup_5gram_char_pm is not None):
        # inline narrow projection, NOT a join back to a stats frame: the
        # old id-join shuffled the corpus TEXT on both sides just to
        # re-attach per-doc arithmetic (measured 206 s of a 227 s pass at
        # sf0.1 before _run_stats made the stats doc-local)
        sig = with_ngram_repetition_stats(sig, top_ns=(2,), dup_ns=(5,),
                                          text_col="text")
    gates = []
    if cfg.min_tokens is not None:
        gates.append((F.col("n_tok") < cfg.min_tokens, "too_short"))
    if cfg.max_dup_line_pm is not None:
        gates.append((F.col("dup_line_pm") > cfg.max_dup_line_pm,
                      "repetitive"))
    if cfg.max_top_2gram_char_pm is not None:
        gates.append((F.col("top_2gram_char_pm")
                      > cfg.max_top_2gram_char_pm, "repetitive"))
    if cfg.max_dup_5gram_char_pm is not None:
        gates.append((F.col("dup_5gram_char_pm")
                      > cfg.max_dup_5gram_char_pm, "repetitive"))
    reason = F.lit(None).cast("string")
    for cond, r in reversed(gates):  # first listed gate wins
        reason = F.when(cond, r).otherwise(reason)

    eager = cfg.near_dup_jaccard_pm is not None
    if eager:
        from pyspark import StorageLevel  # noqa: PLC0415

        # SKINNY (id, drop_reason) localCheckpoint: in eager mode the
        # gate frame is evaluated by three separate jobs (the exact
        # stage's checkpoint, the live2 persist, the final stitch) —
        # uncheckpointed, the gate stats re-ran per job (measured when
        # they were the dominant expression: full DAG 181 s vs 72 s for
        # one gates pass; still ~19 s/pass at sf0.1 after the
        # _run_stats doc-local rewrite, worth running once). Text is
        # NOT pinned: it re-attaches from d by id join, so the
        # checkpoint is two thin columns. With near-dedup off the plan
        # stays fully lazy (same contract as the other eager-section
        # caches).
        reasons = sig.select(id_col, reason.alias("drop_reason")) \
            .localCheckpoint(eager=True)
        tagged = d.join(reasons, id_col).select(
            id_col, "text", "drop_reason")
    else:
        tagged = sig.select(id_col, "text", reason.alias("drop_reason"))
    live = tagged.where(F.col("drop_reason").isNull()).select(id_col, "text")

    # --- stages 3+4: exact then near dedup among quality survivors -------

    # Every transient persist registers here and is released in ONE finally:
    # a failure anywhere in the eager section (the eager localCheckpoint
    # job, plan construction, the CC loop) must not leak cached blocks into
    # a long-lived driver session.
    transient: list[DataFrame] = []
    try:
        # --- stage 3: exact dedup ---------------------------------------
        if cfg.exact_dedup:
            fp = normalized_fp("text")  # the SHARED fingerprint (dedup.py)
            fp_frame = live.select(F.col(id_col), fp.alias("fp"))
            if eager:
                # SKINNY persist: (id, 32-byte fp) caches at ~0.13x the
                # text frame's footprint (measured on the sf0.01 corpus:
                # 0.019 MB vs 0.15 MB for (id, text); exploded shingles
                # would pin 3.4x the text — the WRONG frame to cache), yet
                # still stops the keeper groupBy and the loser join from
                # re-running line-dedup + gates
                fp_frame = fp_frame.persist(StorageLevel.MEMORY_AND_DISK)
                transient.append(fp_frame)
            keeper = fp_frame.groupBy("fp").agg(
                F.min(id_col).alias("keep_id"))
            exact_losers = fp_frame.join(
                keeper, "fp").where(F.col(id_col) != F.col("keep_id")) \
                .select(id_col)
            if eager:
                # small id-only frame, made self-contained so the RETURNED
                # stitch re-executes the upstream once (for tagged), not
                # twice (same localCheckpoint contract as
                # connected_components' result: block loss on a
                # checkpointed frame is not recoverable by lineage —
                # acceptable for id-frames, rejected for corpora)
                exact_losers = exact_losers.localCheckpoint(eager=True)
        else:
            exact_losers = live.limit(0).select(id_col)
        live2 = live.join(exact_losers, id_col, "left_anti")

        # --- stage 4: near dedup ----------------------------------------
        if eager:
            # The connected-components loop runs a driver action per
            # round, so its inputs must not re-execute the upstream DAG
            # every round: PERSIST (not localCheckpoint — persist keeps
            # lineage, so losing an executor's blocks recomputes instead
            # of permanently breaking the frame) live2 once and the
            # verified pairs once. live2 pins (id, text) — the TEXT is
            # required here, the shingle verify reads it four times
            # (cand/card/a/b sides) — and is the floor for this stage:
            # id+text caches ~22x smaller than the exploded shingle frame
            # would (measured above). All caches are released before
            # returning: CC's result is internally localCheckpointed
            # (self-contained), and the returned frame only references
            # tagged/exact_losers/near_losers. This stage is the ONLY
            # eager path in curate(); with near-dedup off the plan stays
            # fully lazy.
            live2_p = live2.persist(StorageLevel.MEMORY_AND_DISK)
            transient.append(live2_p)
            named = live2_p.select(F.col(id_col).alias("doc_id"), "text")
            pairs = (
                _jaccard_on_candidates(named)
                .where(F.col("jac") >= cfg.near_dup_jaccard_pm)
                .select("id_a", "id_b")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            transient.append(pairs)
            comp = connected_components(
                live2_p.select(F.col(id_col).alias("id")), pairs)
            near_losers = comp.where("rep != id").select(
                F.col("id").alias(id_col))
        else:
            near_losers = live2.limit(0).select(id_col)
    finally:
        for p in transient:
            p.unpersist()

    # --- stitch the audit trail back together ---------------------------
    return (
        tagged
        .join(exact_losers.select(
            id_col, F.lit("exact_dup").alias("_r3")), id_col, "left")
        .join(near_losers.select(
            id_col, F.lit("near_dup").alias("_r4")), id_col, "left")
        .select(
            id_col, "text",
            F.coalesce("drop_reason", "_r3", "_r4").alias("drop_reason"),
        )
        .unionByName(null_rows)
    )


@dataclass(frozen=True)
class MixConfig:
    """Knobs for ``assemble_mix`` — the post-curation training-mix plane.

    ``budgets`` is the recipe itself ({source: token budget}; a ``None``
    key budgets the NULL-source bucket). ``decontaminate_n = None``
    disables the decontamination stage (then pass neither benchmarks nor
    bench_keys); ``max_tokens_per_host = None`` disables the host cap.
    """
    budgets: dict[str | None, int]
    decontaminate_n: int | None = 13
    decontaminate_min_hits: int = 1
    max_tokens_per_host: int | None = None
    seed: int = 42

    def __post_init__(self) -> None:
        _check_budgets(self.budgets)
        if self.decontaminate_n is not None and self.decontaminate_n < 1:
            raise ValueError(
                f"decontaminate_n must be >= 1, got {self.decontaminate_n}")
        if self.decontaminate_min_hits < 1:
            raise ValueError(
                f"decontaminate_min_hits must be >= 1, got "
                f"{self.decontaminate_min_hits}")
        if (self.max_tokens_per_host is not None
                and self.max_tokens_per_host < 0):
            raise ValueError(
                f"max_tokens_per_host must be >= 0, got "
                f"{self.max_tokens_per_host}")


def assemble_mix(
    docs: DataFrame,
    cfg: MixConfig,
    *,
    benchmarks: DataFrame | None = None,
    bench_keys: DataFrame | None = None,
    source_col: str = "source",
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    eager: bool = True,
) -> DataFrame:
    """The training-mix DAG that runs AFTER ``curate``: benchmark
    decontamination → per-host token cap → per-source token budgets,
    composed from the ``ops.decontaminate`` / ``ops.mixing`` operators
    with the same single-frame audit contract as ``curate``: every input
    doc id with its text and a ``drop_reason`` — NULL for docs in the
    final mix, else the FIRST stage that killed it (``contaminated`` /
    ``host_capped`` / ``over_budget`` / ``unlisted_source``), or
    ``null_id`` for rows with no id at all (un-addressable by any
    stage's id join — quarantined rather than passed off as kept).

    Stage order is the production order: decontamination first (an
    eval-leaky doc must not consume host or source budget someone else
    could have used), domain balancing within sources next, the recipe
    budgets last (so a budget is met with balanced, clean documents).
    Feed ``where drop_reason is null`` to the tokenizer and
    ``ops.mixing.mixture_report(docs_kept_by_earlier_stages, mix, ...)``
    for the per-source accounting.

    Each stage's shuffle discipline is its operator's own — broadcast
    gram keys, the over-cap-host window prune, the boundary-bucket
    decomposition. The benchmarks/bench_keys pair follows
    ``ops.decontaminate.contamination`` (exactly one when decontamination
    is on, neither when off).

    Eagerness (the ``curate`` id-frame contract): each stage's loser ids
    are ``localCheckpoint(eager=True)``-ed as they are derived — three
    tiny (id, reason) frames. Without this the composition is lazy but
    QUADRATIC: ``sample_mixture`` references its input ~6 times and each
    reference would re-run the upstream anti-join chain INCLUDING the
    decontamination gram explode (measured at sf0.1 replicated 32x:
    the lazy form did not finish in 9 minutes; the checkpointed form
    runs the explode once). With the checkpoints, re-evaluating ``live``
    is one corpus scan plus anti-joins against in-memory id frames.
    Checkpointed id frames are self-contained (block loss is not
    lineage-recoverable — acceptable for ids, rejected for corpora,
    same trade as ``curate``); pass ``eager=False`` to keep the plan
    fully lazy when composing over a tiny or already-persisted corpus.
    """
    if cfg.decontaminate_n is None and (
            benchmarks is not None or bench_keys is not None):
        raise ValueError(
            "decontaminate_n is None but benchmarks/bench_keys was "
            "passed — enable the stage or drop the argument")

    d = docs.select(F.col(id_col), F.col(source_col).alias("__src"),
                    F.col(host_col).alias("__host"),
                    F.col(text_col).alias("text"))

    def _pin(ids: DataFrame) -> DataFrame:
        # skinny (id, reason) frame: checkpoint so downstream stages and
        # the final stitch replay anti-joins against a materialized frame
        # instead of re-running this stage's (and its ancestors') DAG
        return ids.localCheckpoint(eager=True) if eager else ids

    losers: list[DataFrame] = []  # (id, reason) frames, stage order
    live = d
    if cfg.decontaminate_n is not None:
        counts = contamination(
            live, benchmarks, n=cfg.decontaminate_n, id_col=id_col,
            text_col="text", bench_keys=bench_keys)
        dirty = _pin(counts.where(
            F.col("contam_hits") >= cfg.decontaminate_min_hits)
            .select(id_col, F.lit("contaminated").alias("reason")))
        losers.append(dirty)
        live = live.join(dirty.select(id_col), id_col, "left_anti")

    if cfg.max_tokens_per_host is not None:
        _, capped = cap_host_tokens(
            live, cfg.max_tokens_per_host, host_col="__host",
            id_col=id_col, text_col="text", seed=cfg.seed)
        capped_ids = _pin(capped.select(
            id_col, F.lit("host_capped").alias("reason")))
        losers.append(capped_ids)
        live = live.join(capped_ids.select(id_col), id_col, "left_anti")

    _, over = sample_mixture(
        live, cfg.budgets, source_col="__src", id_col=id_col,
        text_col="text", seed=cfg.seed)
    losers.append(_pin(over.select(
        id_col, F.col("drop_reason").alias("reason"))))

    audit = losers[0]
    for l in losers[1:]:
        audit = audit.unionByName(l)
    # NULL-id rows are un-addressable by every stage's id join (the
    # operators keep them and exclude them from budget math) and the
    # stitch join could not label them either — tag them explicitly so
    # an id-less row can never masquerade as a kept mix member
    reason = F.when(F.col(id_col).isNull(), F.lit("null_id")) \
        .otherwise(F.col("reason"))
    return (
        d.join(audit, id_col, "left")
        .select(id_col, F.col("__src").alias(source_col),
                F.col("__host").alias(host_col), "text",
                reason.alias("drop_reason"))
    )
