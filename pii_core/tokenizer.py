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
    """Whitespace/punctuation tokenizer with char offsets and subword pieces."""

    def __init__(self, piece_len: int = 8, num_special_tokens: int = 2):
        if piece_len < 1:
            raise ValueError(f"piece_len must be >= 1, got {piece_len}")
        self.piece_len = int(piece_len)
        self.num_special_tokens = int(num_special_tokens)

    def encode(self, text: str) -> list[tuple[int, int]]:
        """Token char offsets (start inclusive, end exclusive), no specials."""
        out: list[tuple[int, int]] = []
        plen = self.piece_len
        for m in _TOKEN_RE.finditer(text):
            s, e = m.start(), m.end()
            if e - s <= plen:
                out.append((s, e))
            else:
                for p in range(s, e, plen):
                    out.append((p, min(p + plen, e)))
        return out

    def encoded_len_with_specials(self, text: str) -> int:
        """Token count including specials (mirrors ``_retokenized_length``,
        reference chunking.py:82-91)."""
        return len(self.encode(text)) + self.num_special_tokens


DEFAULT_TOKENIZER = WordTokenizer()
