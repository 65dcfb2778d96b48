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

    def encoded_len_with_specials(self, text: str) -> int:
        """Token count including specials (mirrors ``_retokenized_length``,
        reference chunking.py:82-91). Counts matches without materializing
        span tuples — this runs once per chunk in the re-tokenization check,
        and the count is all it needs."""
        count = sum(1 for _ in self._piece_re.finditer(text))
        return count + self.num_special_tokens


DEFAULT_TOKENIZER = WordTokenizer()
