"""PII redaction: produce a publishable text with PII spans masked.

The reference stops at the document decision (``should_be_public = not any
PII span``, infer_pii.py:553-569) — a document with PII is simply withheld.
Freedom-of-information practice usually wants the stronger output: release
the document WITH the personal data struck out. This module is that output
stage, driven by the same span structs the pipeline already produces.

Modes:

* ``"tag"``  — each PII span becomes ``[TYPE]`` (audit-friendly: reviewers
  see what kind of data was removed and where).
* ``"mask"`` — each PII span becomes ``*`` × span length (layout-preserving:
  char offsets of the surrounding text never move, so downstream span
  references into the ORIGINAL text stay valid for unredacted regions).

Only spans whose type is in ``PII_TYPES`` are redacted — ``ORG_JURIDICA`` /
``DOC_EMPRESA`` are public-body/company identifiers the reference's taxonomy
deliberately excludes from PII (ner_labels.py:361-363), so they survive.

Spans must be the pipeline's merged/resolved output: sorted by (start, end,
type) and non-overlapping (``merge_and_resolve`` guarantees both). Overlap
is a hard error, never a silent mis-splice.
"""

from __future__ import annotations

from pii_core.labels import PII_TYPES
from pii_core.spans import Span

_PII = frozenset(PII_TYPES)
MODES = ("tag", "mask")


def redact(text: str, spans: list[Span], mode: str = "tag") -> str:
    """Redacted text with every PII span replaced per ``mode``."""
    if mode not in MODES:
        raise ValueError(f"unknown redaction mode: {mode!r} (use tag|mask)")
    out: list[str] = []
    pos = 0
    for s in spans:
        if s.type not in _PII:
            continue
        if s.start < pos:
            raise ValueError(
                f"overlapping/unsorted span at {s.start} (cursor {pos}); "
                "redact() requires merge_and_resolve output")
        if not (0 <= s.start <= s.end <= len(text)):
            raise ValueError(f"span [{s.start},{s.end}) outside text "
                             f"of length {len(text)}")
        out.append(text[pos:s.start])
        out.append(f"[{s.type}]" if mode == "tag"
                   else "*" * (s.end - s.start))
        pos = s.end
    out.append(text[pos:])
    return "".join(out)
