"""Domain-mixing operators — keeping any single host from dominating the
training mix. Web crawls are power-law distributed: a handful of hosts
(forums, wikis, link farms) can contribute an outsized share of tokens,
and corpora built from them over-weight those domains (the C4/Gopher
family caps per-domain contribution for exactly this reason).

``cap_host_tokens`` enforces a per-host token budget with a DETERMINISTIC,
partition-invariant preference order (content-hash of the doc key, the
``train_val_split`` idiom — never ``rand()``), so the same corpus capped
on any cluster size keeps exactly the same documents.

The reference engine has no training-mix tooling; this belongs to the
LLM-data-pipeline family the engine adds (dedup / decontamination /
sampling), not to a reference file.

100 TB shape (skew is the whole point of this operator, so it must not
recreate it):

* Phase 1 reduces the corpus to skinny (host, doc_id, n_tok) rows and
  finds hosts whose TOTAL exceeds the cap — a partial-agg groupBy; text
  never moves.
* Phase 2 ranks only OFFENDING hosts' rows (left_semi prune) with a
  running-sum window. The window shuffles skinny triples of the few
  over-cap hosts, not the corpus; a mega-host with 10^8 docs windows
  ~3 GB of triples, not its terabytes of text.
* The final assembly is an id-only anti-join against the loser set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_host_tokens(
    docs: DataFrame,
    max_tokens_per_host: int,
    *,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped) split of ``docs``: per host, keep documents in
    content-hash order while the running token total stays within
    ``max_tokens_per_host``; the rest land in ``dropped`` with their
    (n_tok, host_cum_tok) counters for the audit trail.

    Semantics (frozen, mirrored by the DuckDB oracle in
    tests/test_mixing.py):

    * tokens = whitespace-separated words; NULL text counts as zero
      tokens (the ``curate`` rule — a NULL must not make predicates
      silently pass);
    * order within a host = ascending ``md5(id:seed)`` — deterministic
      for any partitioning/cluster size, uncorrelated with crawl order;
      ties (same id twice) broken by the id itself so the cumsum is
      well-defined;
    * a document is kept iff its INCLUSIVE running total ``<=`` the cap —
      a doc alone bigger than the cap is dropped (pre-filter such docs if
      you want them regardless);
    * hosts with total tokens within the cap never enter the window —
      their docs are all kept (and the plan never ranks them);
    * NULL host is a host like any other (the cap applies to the
      unparseable-url bucket too — without this, every scheme-less url
      would bypass the cap).
    """
    if max_tokens_per_host < 0:
        raise ValueError(
            f"max_tokens_per_host must be >= 0, got {max_tokens_per_host}")
    toks = F.filter(F.split(text_col, r"\s+"), lambda t: t != "")
    n_tok = F.when(F.col(text_col).isNull(), F.lit(0)) \
        .otherwise(F.size(toks))
    skinny = docs.select(
        F.col(host_col).alias("__h"), F.col(id_col), n_tok.alias("n_tok"))

    over = (
        skinny.groupBy("__h")
        .agg(F.sum("n_tok").alias("__tot"))
        .where(F.col("__tot") > max_tokens_per_host)
        .select("__h")
    )
    # eqNullSafe: a NULL host must match its own group in the semi-join,
    # or every unparseable-url doc would silently bypass the cap. The
    # rename is load-bearing: both sides derive from one lineage, and a
    # same-name condition resolves to the trivially-true '__h == __h'
    # (Spark warns, the prune silently matches EVERYTHING, and the window
    # ranks the whole corpus — the exact skew this operator exists to
    # avoid; the plan gate pins the semi-join stays real).
    over_r = over.withColumnRenamed("__h", "__h_over")
    contested = skinny.join(
        over_r, skinny["__h"].eqNullSafe(over_r["__h_over"]), "left_semi")
    rank_key = F.md5(F.concat(F.col(id_col).cast("string"),
                              F.lit(f":{seed}")))
    w = (
        Window.partitionBy("__h")
        .orderBy(rank_key.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    losers = (
        contested
        .withColumn("host_cum_tok", F.sum("n_tok").over(w))
        .where(F.col("host_cum_tok") > max_tokens_per_host)
        .select(id_col, "n_tok", "host_cum_tok")
    )
    kept = docs.join(losers.select(id_col), id_col, "left_anti")
    dropped = docs.join(losers, id_col)
    return kept, dropped
