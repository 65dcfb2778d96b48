"""Deterministic offset tokenizer.

The reference requires a HuggingFace *fast* tokenizer purely for its
``offset_mapping`` (reference ``infer_pii.py:519-521``, ``chunking.py:163``).
The sandbox has no HF models, so this module provides a dependency-free,
deterministic tokenizer exposing the same contract the chunker needs:

* ``encode(text) -> list[(char_start, char_end)]`` — offsets, no specials;
* ``num_special_tokens`` — budget accounting for [CLS]/[SEP]-style specials;
* ``encoded_len_with_specials(text)`` — re-tokenization length check.

Long word runs are split into fixed-size pieces so continuation pieces start
mid-word, exercising the same boundary machinery WordPiece ``##``-pieces do
(reference ``chunking.py:243-251``). The tokenizer is an injected strategy:
a real WordPiece tokenizer with pinned vocab can be swapped in for production
without touching the chunker.
"""

from __future__ import annotations

import re

import numpy as np

# Codepoint classification tables for the vectorized scan (``encode_arr``):
# built LAZILY from the very regex character classes they replace — one
# single-char regex match per BMP codepoint, so the tables cannot drift from
# the pattern semantics. ~64 KB each, built once per process.
_TABLE_N = 0x10000
_WORD_TABLE: np.ndarray | None = None
_SPACE_TABLE: np.ndarray | None = None


def _class_tables() -> tuple[np.ndarray, np.ndarray]:
    global _WORD_TABLE, _SPACE_TABLE
    if _WORD_TABLE is None:
        wrx = re.compile(r"[\w'’\-]", re.UNICODE)
        srx = re.compile(r"\s", re.UNICODE)
        chars = "".join(map(chr, range(_TABLE_N)))
        w = np.zeros(_TABLE_N, dtype=bool)
        s = np.zeros(_TABLE_N, dtype=bool)
        for m in wrx.finditer(chars):
            w[m.start()] = True
        for m in srx.finditer(chars):
            s[m.start()] = True
        _WORD_TABLE, _SPACE_TABLE = w, s
    return _WORD_TABLE, _SPACE_TABLE

# word chars mirror the chunker's notion: alnum + apostrophe/hyphen/underscore
# (reference chunking.py:19-21,35-36) so names like O'Neil or João-Paulo stay whole.
_TOKEN_RE = re.compile(r"[\w'’\-]+|[^\s\w'’\-]", re.UNICODE)


class WordTokenizer:
    """Whitespace/punctuation tokenizer with char offsets and subword pieces.

    ``slice_stable = True`` declares the SLICE-STABILITY contract the chunker
    may exploit (``chunking.build_chunks_with_offsets``): for any window
    ``[a, b)`` whose ``a`` falls on a token start that is also either a
    word-run start or a piece boundary at a multiple of ``piece_len`` into
    its run, and whose ``b`` satisfies ``last_token_end <= b <
    next_token_start_end`` (never inside a token),

        encode(text[a:b]) == [(s - a, e - a) for (s, e) in encode(text)
                              if s >= a and e <= b]

    This holds here because tokens never cross whitespace/punct boundaries
    and word-run pieces are greedy fixed-width from the run start, so a cut
    at a piece boundary re-pieces the tail identically. A real WordPiece
    adapter (context-dependent ``##`` continuations) must NOT set this flag
    — absent/False routes the chunker to honest re-tokenization.

    The flag is a PROPERTY that self-revokes in subclasses overriding
    ``encode`` or ``encoded_len_with_specials``: the contract is a fact
    about those two methods, so a subclass that changes either (e.g. a
    char-costing byte-BPE stand-in in the test suite) must not inherit the
    claim — it would silently produce wrong chunk boundaries. A subclass
    whose overrides genuinely keep the contract can re-assert it with a
    plain class attribute ``slice_stable = True`` (shadows the property).
    """

    @property
    def slice_stable(self) -> bool:
        cls = type(self)
        return (cls.encode is WordTokenizer.encode
                and cls.encoded_len_with_specials
                is WordTokenizer.encoded_len_with_specials)

    def __init__(self, piece_len: int = 8, num_special_tokens: int = 2):
        if piece_len < 1:
            raise ValueError(f"piece_len must be >= 1, got {piece_len}")
        self.piece_len = int(piece_len)
        self.num_special_tokens = int(num_special_tokens)
        # The {1,piece_len} quantifier makes the regex itself emit long word
        # runs as consecutive greedy pieces — identical output to splitting
        # _TOKEN_RE matches in Python, but the whole scan stays in C.
        self._piece_re = re.compile(
            r"[\w'’\-]{1,%d}|[^\s\w'’\-]" % self.piece_len, re.UNICODE)

    def encode(self, text: str) -> list[tuple[int, int]]:
        """Token char offsets (start inclusive, end exclusive), no specials."""
        return [m.span() for m in self._piece_re.finditer(text)]

    def encode_arr(self, text: str) -> np.ndarray:
        """``encode`` as an (N,2) int64 ndarray — the extraction hot path's
        form (chunker slices are views, downstream aggregation consumes the
        array without per-token Python). For THIS class the scan is pure
        NumPy over a codepoint table built from the same regex classes:
        word-char runs split greedily into ``piece_len`` pieces, non-space
        non-word chars emit single-char tokens, identical to the regex
        ``[\\w'’\\-]{1,piece_len}|[^\\s\\w'’\\-]`` by construction (the
        differential test pins byte equality over unicode corpora).
        Subclasses that override ``encode`` (adapters, test fakes) are
        routed through THEIR ``encode`` — the array form must never
        silently disagree with the list form."""
        if type(self).encode is not WordTokenizer.encode:
            return np.asarray(type(self).encode(self, text),
                              dtype=np.int64).reshape(-1, 2)
        if not text:
            return np.empty((0, 2), dtype=np.int64)
        try:
            cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        except UnicodeEncodeError:  # lone surrogates: regex path is exact
            return np.asarray(self.encode(text),
                              dtype=np.int64).reshape(-1, 2)
        if int(cp.max()) >= _TABLE_N:
            # astral codepoints: python str indexes them as ONE char but
            # the table does not cover them — the regex path stays exact
            return np.asarray(self.encode(text),
                              dtype=np.int64).reshape(-1, 2)
        word_t, space_t = _class_tables()
        w = word_t[cp]
        wi = np.flatnonzero(w)
        if wi.size:
            brk = np.flatnonzero(np.diff(wi) > 1)
            run_s = np.concatenate((wi[:1], wi[brk + 1]))
            run_e = np.concatenate((wi[brk], wi[-1:])) + 1
            lens = run_e - run_s
            pl = self.piece_len
            n_p = (lens + (pl - 1)) // pl
            csum = np.concatenate(([0], np.cumsum(n_p)[:-1]))
            kk = np.arange(int(n_p.sum())) - np.repeat(csum, n_p)
            ps = np.repeat(run_s, n_p) + kk * pl
            pe = np.minimum(ps + pl, np.repeat(run_e, n_p))
        else:
            ps = pe = np.empty(0, dtype=np.int64)
        oi = np.flatnonzero(~w & ~space_t[cp])
        if not oi.size and not ps.size:
            return np.empty((0, 2), dtype=np.int64)
        starts = np.concatenate((ps, oi))
        ends = np.concatenate((pe, oi + 1))
        # word positions and other-char positions are disjoint, so starts
        # are unique and a plain sort merges the two streams exactly
        order = np.argsort(starts)
        return np.stack((starts[order], ends[order]),
                        axis=1).astype(np.int64, copy=False)

    def encoded_len_with_specials(self, text: str) -> int:
        """Token count including specials (mirrors ``_retokenized_length``,
        reference chunking.py:82-91). Counts matches without materializing
        span tuples — this runs once per chunk in the re-tokenization check,
        and the count is all it needs."""
        count = sum(1 for _ in self._piece_re.finditer(text))
        return count + self.num_special_tokens


DEFAULT_TOKENIZER = WordTokenizer()
