"""Token-budget sliding-window chunking with boundary heuristics.

Re-expresses the semantics of reference ``data_preprocessing/chunking.py``
(144-301): sliding window in token space with overlap ``stride``, end-of-chunk
backoff preferring sentence terminators then word boundaries
(chunking.py:94-141), char-start backed up to word start and char-end extended
over separators so the union of chunk char ranges covers the document with no
gaps (chunking.py:243-262), and a re-tokenization shrink loop that guarantees
each chunk fits ``max_length`` (chunking.py:264-285).

Invariants (enforced by the property suite in ``tests/test_chunking.py``,
mirroring the reference's fail-fast checks at build_finetune_jsonl.py:238-291):

* chunks[0].char_start == first non-whitespace position (0 when the
  text does not start with whitespace — char-start backs up to WORD
  start, so leading whitespace stays uncovered, exactly like the
  reference), chunks[-1].char_end == len(text)
* consecutive chunks overlap or touch: next.char_start <= cur.char_end
* every chunk re-tokenizes to <= max_length tokens (with specials)
* chunk.text == text[char_start:char_end]

Chunking is doc-local: in the Spark engine it runs inside one Arrow batch of
``mapInPandas`` and never shuffles.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from pii_core.tokenizer import WordTokenizer


def _encode_arr(tokenizer, text: str) -> np.ndarray:
    """Tokenizer offsets as an (N,2) int64 array: the tokenizer's own
    ``encode_arr`` when it provides one (WordTokenizer's vectorized scan,
    or its subclass-override guard), else the duck-typed ``encode`` list
    converted — adapters and test fakes keep their exact semantics."""
    fn = getattr(tokenizer, "encode_arr", None)
    if fn is not None:
        return fn(text)
    return np.asarray(tokenizer.encode(text), dtype=np.int64).reshape(-1, 2)

# NB: "\n" is unreachable — _trailing_nonspace skips ALL whitespace, so a
# newline can never be the returned char. The reference has the identical
# quirk (_last_non_space_char skips whitespace yet _SENTENCE_END lists
# "\n", chunking.py:24,71-79); kept verbatim for scoring parity.
SENTENCE_ENDS = frozenset({".", "!", "?", "\n"})
WORD_EXTRA = frozenset({"'", "’", "-", "_"})


class ChunkingConfigError(ValueError):
    """A chunker argument combination that can NEVER work — independent of
    the document (stride >= budget, no token budget). Distinct from the
    per-document RuntimeErrors so batch callers can tell "this page is
    pathological, quarantine it" from "this whole job is misconfigured,
    abort it": quarantining a config error would silently fail-close an
    entire corpus (every page an error row, every url then committed as
    done)."""


class Chunk(NamedTuple):
    text: str
    char_start: int
    char_end: int
    chunk_index: int


def _wordish(ch: str) -> bool:
    return ch.isalnum() or ch in WORD_EXTRA


def _boundary_at(text: str, pos: int) -> bool:
    """Cursor position ``pos`` sits between a word char on both sides? Then
    it is NOT a boundary (reference chunking.py:39-47)."""
    if pos <= 0 or pos >= len(text):
        return True
    return not (_wordish(text[pos - 1]) and _wordish(text[pos]))


def _word_start_before(text: str, pos: int) -> int:
    p = min(max(pos, 0), len(text))
    while p > 0 and _wordish(text[p - 1]):
        p -= 1
    return p


def _extend_over_separators(text: str, pos: int, limit: int) -> int:
    p = min(max(pos, 0), len(text))
    lim = min(max(limit, 0), len(text))
    while p < lim and not _wordish(text[p]):
        p += 1
    return p


def _trailing_nonspace(text: str, end: int) -> str | None:
    i = min(end, len(text)) - 1
    while i >= 0 and text[i].isspace():
        i -= 1
    return text[i] if i >= 0 else None


def _score_end_candidates(
    text: str,
    offsets: np.ndarray,
    tentative_end: int,
    hard_min_end: int,
    backoff: int,
) -> int:
    """Choose an end token (exclusive) within ``backoff`` of the tentative end.

    Scoring per reference chunking.py:94-141: sentence terminator = 3, plain
    word boundary = 1, ``score*10 - distance``; falls back to the tentative
    end when nothing qualifies.
    """
    if tentative_end <= hard_min_end or backoff <= 0:
        return tentative_end
    best, best_score = None, -1
    deepest = min(backoff, tentative_end - hard_min_end)
    for d in range(deepest + 1):
        cand = tentative_end - d
        if cand <= hard_min_end:
            break
        cut = int(offsets[cand - 1, 1])
        if not _boundary_at(text, cut):
            continue
        last = _trailing_nonspace(text, cut)
        if last is None:
            continue
        base = 3 if last in SENTENCE_ENDS else 1
        score = base * 10 - d
        if score > best_score:
            best, best_score = cand, score
            if d == 0 and base == 3:
                break
    return best if best is not None else tentative_end


def build_chunks(
    text: str,
    tokenizer: WordTokenizer,
    *,
    max_length: int = 512,
    stride: int = 64,
    boundary_backoff: int = 32,
    hard_split: bool = False,
) -> list[Chunk]:
    """Split ``text`` into overlapping, budget-respecting chunks.

    ``hard_split=False`` (default) preserves reference parity: a window that
    cannot fit the budget even at its hard minimum end (a multi-kB unbroken
    word-char run — the word-start backup pulls in the whole run) raises,
    and the Spark engine quarantines the document fail-closed.
    ``hard_split=True`` is the web-scale recovery mode: such a window is cut
    at exact token boundaries mid-word (no word alignment, no separator
    extension), and the next window starts one token earlier so the no-gap
    coverage invariant still holds. All other documents chunk identically
    in both modes.
    """
    chunks, _ranges, _offsets = _build_chunks(
        text, tokenizer, max_length=max_length, stride=stride,
        boundary_backoff=boundary_backoff, hard_split=hard_split)
    return chunks


def build_chunks_with_offsets(
    text: str,
    tokenizer: WordTokenizer,
    *,
    max_length: int = 512,
    stride: int = 64,
    boundary_backoff: int = 32,
    hard_split: bool = False,
) -> list[tuple[Chunk, np.ndarray]]:
    """``build_chunks`` plus each chunk's LOCAL token offsets as (N,2)
    int64 arrays — exactly the values ``tokenizer.encode(chunk.text)``
    returns (the differential suite pins the equality), without
    re-tokenizing every chunk.

    When the tokenizer declares ``slice_stable`` (see
    ``tokenizer.WordTokenizer``), the chunker's single document-level token
    scan is sliced and shifted per chunk — the per-chunk re-encode that was
    ~60% of all tokenizer work in the extraction hot path disappears.
    Tokenizers without the contract (e.g. a real WordPiece adapter with
    context-dependent continuations) fall back to honest per-chunk
    re-tokenization; output is identical either way.
    """
    chunks, ranges, offsets = _build_chunks(
        text, tokenizer, max_length=max_length, stride=stride,
        boundary_backoff=boundary_backoff, hard_split=hard_split)
    out: list[tuple[Chunk, np.ndarray]] = []
    for ch, rng in zip(chunks, ranges):
        if rng is None:
            out.append((ch, _encode_arr(tokenizer, ch.text)))
        else:
            lo, hi = rng
            # vectorized shift of the document-scan slice (int64 view math)
            out.append((ch, offsets[lo:hi] - np.int64(ch.char_start)))
    return out


def _build_chunks(
    text: str,
    tokenizer: WordTokenizer,
    *,
    max_length: int,
    stride: int,
    boundary_backoff: int,
    hard_split: bool,
) -> tuple[list[Chunk], list[tuple[int, int] | None], list[tuple[int, int]]]:
    """Core chunking loop. Returns (chunks, token_ranges, doc_offsets):
    ``token_ranges[i]`` is the ``[lo, hi)`` slice of ``doc_offsets`` whose
    tokens fall strictly inside chunk i's char range — computed only for
    ``slice_stable`` tokenizers (else None per chunk)."""
    if not isinstance(text, str) or not text:
        return [Chunk("", 0, 0, 0)], [(0, 0)], np.empty((0, 2), np.int64)
    if max_length <= 8:
        raise ChunkingConfigError(f"max_length too small: {max_length}")
    budget = int(max_length) - tokenizer.num_special_tokens
    if budget <= 0:
        raise ChunkingConfigError(
            f"max_length={max_length} leaves no token budget")
    if not (0 <= stride < budget):
        raise ChunkingConfigError(
            f"stride must satisfy 0 <= stride < {budget}; got {stride}")
    step = budget - stride

    offsets = _encode_arr(tokenizer, text)
    n = len(offsets)
    if n == 0 or n <= budget:
        # Whole text fits one window: skip boundary heuristics entirely
        # (reference chunking.py:195-198). The chunk IS the document, so
        # its local offsets are the document offsets for ANY tokenizer.
        return [Chunk(text, 0, len(text), 0)], [(0, n)], offsets

    stable = bool(getattr(tokenizer, "slice_stable", False))
    starts = offsets[:, 0]

    def _lo(a: int) -> int:
        """Index of the first token with char start >= ``a`` (chunk char
        starts never fall inside a token, so this is the chunk's first
        token)."""
        return int(np.searchsorted(starts, a, side="left"))

    def _enc_len(a: int, b: int, e: int) -> int:
        """``encoded_len_with_specials(text[a:b])`` — by arithmetic over the
        document scan when the tokenizer declares slice-stability (the
        tokens of the slice are exactly ``offsets[_lo(a):e]``; every caller
        passes the ``e`` for which no token crosses ``b``), else by honest
        re-tokenization. The differential suite pins the two paths equal."""
        if stable:
            return (e - _lo(a)) + tokenizer.num_special_tokens
        return tokenizer.encoded_len_with_specials(text[a:b])

    chunks: list[Chunk] = []
    ranges: list[tuple[int, int] | None] = []
    start_tok = 0
    idx = 0
    while start_tok < n:
        tentative_end = min(start_tok + budget, n)
        # End may never back off before the next window's start token, or
        # the union would have gaps (reference chunking.py:206-209).
        hard_min_end = max(start_tok + 1, min(tentative_end, start_tok + step))

        if start_tok + step >= n:
            end_tok = tentative_end  # last window must cover the tail
        else:
            end_tok = _score_end_candidates(
                text, offsets, tentative_end, hard_min_end, int(boundary_backoff)
            )
        if end_tok <= start_tok:
            raise RuntimeError(f"chunker made no progress at start_tok={start_tok}")
        if end_tok < hard_min_end:
            raise RuntimeError(
                f"end_tok={end_tok} < hard_min_end={hard_min_end} at start_tok={start_tok}"
            )

        raw_start = int(offsets[start_tok, 0])
        if int(offsets[end_tok - 1, 1]) <= raw_start:
            raise RuntimeError(f"empty char span at start_tok={start_tok}")

        char_start = int(_word_start_before(text, raw_start))

        # Back off tokens while the char end would cut mid-word
        # (continuation subword pieces — reference chunking.py:245-251).
        while end_tok > hard_min_end and not _boundary_at(text, int(offsets[end_tok - 1, 1])):
            end_tok -= 1

        def _char_end_for(e: int) -> int:
            ce = int(offsets[e - 1, 1])
            nxt = int(offsets[e, 0]) if e < n else len(text)
            return int(_extend_over_separators(text, ce, nxt))

        char_end = _char_end_for(end_tok)
        if char_end <= char_start:
            raise RuntimeError(f"invalid span after tightening at start_tok={start_tok}")

        # Word-aligned boundaries can grow token count on re-tokenization;
        # shrink until the chunk fits (reference chunking.py:264-285).
        next_start = start_tok + step
        while _enc_len(char_start, char_end, end_tok) > max_length:
            if end_tok <= hard_min_end:
                if not hard_split:
                    raise RuntimeError(
                        f"chunk exceeds max_length={max_length} at hard minimum end "
                        f"(start_tok={start_tok}); increase max_length or stride"
                    )
                # Hard-split recovery: cut at exact token boundaries, no
                # word-start backup and no separator extension, shrinking
                # from the end until the slice re-tokenizes within budget.
                char_start = raw_start
                end_tok = min(start_tok + budget, n)
                char_end = int(offsets[end_tok - 1, 1])
                while (end_tok > start_tok + 1
                       and _enc_len(char_start, char_end, end_tok)
                       > max_length):
                    end_tok -= 1
                    char_end = int(offsets[end_tok - 1, 1])
                if _enc_len(char_start, char_end, end_tok) > max_length:
                    raise RuntimeError(
                        f"single token exceeds max_length={max_length} "
                        f"at start_tok={start_tok}")
                if end_tok >= n:
                    # last window: cover the (whitespace) tail when it
                    # re-tokenizes within budget, keeping char_end==len(text)
                    ext = _extend_over_separators(text, char_end, len(text))
                    if ext > char_end:
                        if _enc_len(char_start, ext, end_tok) <= max_length:
                            char_end = ext
                        elif end_tok > start_tok + 1:
                            # tokenizers where the tail costs tokens
                            # (byte-level BPE whitespace): shed one token so
                            # one more window covers the tail — never leave
                            # chunks[-1].char_end short of len(text)
                            end_tok -= 1
                            char_end = int(offsets[end_tok - 1, 1])
                        else:
                            raise RuntimeError(
                                f"cannot cover text tail within "
                                f"max_length={max_length} at "
                                f"start_tok={start_tok}")
                # Start the next window one token earlier than this end so
                # the word-start backup there cannot open a coverage gap.
                next_start = max(start_tok + 1, end_tok - 1)
                if next_start == end_tok and end_tok < n:
                    # Degenerate single-token window: the next chunk starts
                    # AT end_tok, so inter-token separators must be covered
                    # here or the no-gap invariant silently breaks. Extend
                    # char_end to the next token's start; fail loudly if the
                    # extension re-tokenizes over budget (byte-level
                    # whitespace costs) rather than leaving a gap.
                    ext = _extend_over_separators(
                        text, char_end, int(offsets[end_tok, 0]))
                    if ext > char_end:
                        if _enc_len(char_start, ext, end_tok) > max_length:
                            raise RuntimeError(
                                f"hard-split degenerated to a single token "
                                f"at start_tok={start_tok} and the "
                                f"separator extension exceeds "
                                f"max_length={max_length}; cannot keep the "
                                f"no-gap invariant")
                        char_end = ext
                break
            end_tok -= 1
            char_end = _char_end_for(end_tok)
            if char_end <= char_start:
                raise RuntimeError(f"invalid span while shrinking at start_tok={start_tok}")

        chunks.append(Chunk(text[char_start:char_end], char_start, char_end, idx))
        ranges.append((_lo(char_start), end_tok) if stable else None)
        idx += 1
        if end_tok >= n:
            break
        start_tok = next_start

    return chunks, ranges, offsets
