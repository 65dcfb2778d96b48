"""Training-data-pipeline operators (dedup / similarity / text stats /
multimodal plumbing) — first-class components beyond the reference's own
inventory, each wired into the oracle-checked registry."""

from __future__ import annotations


def register_all(register) -> None:
    from pii_spark.ops import (
        dedup, mixing, multimodal, similarity, textstats, urls)

    for mod in (textstats, dedup, similarity, multimodal, urls, mixing):
        mod.register_queries(register)
