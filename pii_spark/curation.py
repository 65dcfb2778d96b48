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
``exact_dup`` / ``near_dup``). Nothing silently disappears: the audit is
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

from pii_spark.ops.dedup import (
    _jaccard_on_candidates,
    _shingles,
    connected_components,
    line_dedup,
    normalized_fp,
)
from pii_spark.ops.textstats import dup_line_stats, ngram_repetition_stats


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
        # line-stats-only helper: curate never reads the bigram half of
        # repetition_stats, and the n-gram join below computes its own
        sig = sig.join(
            dup_line_stats(d, id_col=id_col, text_col="text")
            .select(id_col, "dup_line_pm"), id_col, "left") \
            .withColumn("dup_line_pm", F.coalesce("dup_line_pm", F.lit(0)))
    if (cfg.max_top_2gram_char_pm is not None
            or cfg.max_dup_5gram_char_pm is not None):
        sig = sig.join(
            ngram_repetition_stats(d, top_ns=(2,), dup_ns=(5,),
                                   id_col=id_col, text_col="text"),
            id_col)
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
    tagged = sig.select(id_col, "text", reason.alias("drop_reason"))
    live = tagged.where(F.col("drop_reason").isNull()).select(id_col, "text")

    # --- stages 3+4: exact then near dedup among quality survivors -------
    eager = cfg.near_dup_jaccard_pm is not None
    if eager:
        from pyspark import StorageLevel  # noqa: PLC0415

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
            sh = _shingles(
                live2_p.select(F.col(id_col).alias("doc_id"), "text"))
            pairs = (
                _jaccard_on_candidates(sh)
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
    )
