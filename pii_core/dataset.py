"""Training-dataset construction: chunk documents and slice gold entities
per chunk (reference ``data_preprocessing/build_finetune_jsonl.py``).

Per-document semantics (reference lines cited):
* gold spans from (type, value) annotations — validate, sanitize, migrate,
  expand to literal occurrences, longest-first selection (spans.gold_spans;
  reference build_finetune_jsonl.py:132-192 + spans.py:360-421).
* chunk with the shared smart chunker (chunking.py; coverage invariant —
  union of chunk char ranges covers the text with no gaps — enforced by the
  reference at build_finetune_jsonl.py:238-291 and asserted here).
* interval-intersect each gold span with each chunk (the J4 range join,
  reference build_finetune_jsonl.py:294-314): a span overlapping a chunk
  contributes its SLICED value; (type, value) pairs are deduped per chunk
  (reference 302-314, O5).

Doc-local and deterministic — the Spark job (pii_spark.dataset) maps this
over Arrow batches with no shuffle.
"""

from __future__ import annotations

from pii_core.chunking import build_chunks
from pii_core.pipeline import ExtractConfig
from pii_core.spans import gold_spans
from pii_core.tokenizer import WordTokenizer


def chunked_dataset_rows(
    text: str,
    entities: list[dict],
    cfg: ExtractConfig | None = None,
    tokenizer: WordTokenizer | None = None,
    *,
    row_index: int = 0,
) -> list[dict]:
    """One annotated document → one row per chunk:
    {chunk_index, char_start, char_end, text, entities:[{type, value}]}.
    """
    cfg = cfg or ExtractConfig()
    tokenizer = tokenizer or cfg.make_tokenizer()
    spans = gold_spans(text, entities, row_index=row_index)
    chunks = build_chunks(
        text, tokenizer,
        max_length=cfg.max_length, stride=cfg.stride,
        boundary_backoff=cfg.boundary_backoff,
    )
    # coverage invariant (reference build_finetune_jsonl.py:238-291)
    if text:
        assert chunks[0].char_start <= _first_nonspace(text)
        assert chunks[-1].char_end == len(text)
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt.char_start <= prev.char_end, "char gap between chunks"

    rows: list[dict] = []
    for ch in chunks:
        seen: set[tuple[str, str]] = set()
        ents: list[dict] = []
        for s in spans:
            a, b = max(s.start, ch.char_start), min(s.end, ch.char_end)
            if a >= b:
                continue
            value = text[a:b]
            key = (s.type, value)
            if key in seen:
                continue
            seen.add(key)
            ents.append({"type": s.type, "value": value})
        rows.append({
            "chunk_index": ch.chunk_index,
            "char_start": ch.char_start,
            "char_end": ch.char_end,
            "text": ch.text,
            "entities": ents,
        })
    return rows


def _first_nonspace(text: str) -> int:
    for i, c in enumerate(text):
        if not c.isspace():
            return i
    return len(text)
