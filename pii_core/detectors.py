"""Compiled-regex PII detectors with checksum validation. [NORTH-ONLY]

The north rule adds a deterministic detector stage the reference does not
have: "compiled-regex detectors with checksum validation for CPF, CNPJ, CEP,
RG, phone and email spans" (BASELINE.json north_star). Detected spans are
typed with the reference taxonomy (labels.py) and flow into the same
filter/merge/resolve algebra as NER spans.

Checksums:
* CPF  — mod-11 over the first 9 digits for digit 10, first 10 for digit 11;
  all-equal-digit CPFs rejected (standard Receita Federal rule).
* CNPJ — weighted mod-11 with weights 5..2,9..2 / 6..2,9..2.

Everything compiles once at import; matching is offered both per-string and
vectorized over a pandas Series (Arrow batch) for the Spark engine — no
per-row Python at the DataFrame level.
"""

from __future__ import annotations

import re

from pii_core.spans import Span

# --- checksums -------------------------------------------------------------


def cpf_checksum_ok(digits: str) -> bool:
    """Validate an 11-digit CPF string (digits only)."""
    if len(digits) != 11 or not digits.isdigit() or len(set(digits)) == 1:
        return False
    nums = [int(c) for c in digits]
    for pos in (9, 10):
        acc = sum(d * w for d, w in zip(nums[:pos], range(pos + 1, 1, -1)))
        check = (acc * 10) % 11
        if check == 10:
            check = 0
        if check != nums[pos]:
            return False
    return True


def cnpj_checksum_ok(digits: str) -> bool:
    """Validate a 14-digit CNPJ string (digits only)."""
    if len(digits) != 14 or not digits.isdigit() or len(set(digits)) == 1:
        return False
    nums = [int(c) for c in digits]
    for pos, weights in ((12, (5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)),
                         (13, (6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2))):
        acc = sum(d * w for d, w in zip(nums[:pos], weights))
        rem = acc % 11
        check = 0 if rem < 2 else 11 - rem
        if check != nums[pos]:
            return False
    return True


def _digits(s: str) -> str:
    return "".join(c for c in s if c.isdigit())


# --- detector table ---------------------------------------------------------
# (name, taxonomy type, compiled regex, validator(match_text) -> bool)
# Patterns avoid lookbehind so an equivalent subset runs in RE2 (DuckDB oracle).

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")
CPF_RE = re.compile(r"\b\d{3}\.\d{3}\.\d{3}-\d{2}\b|\b\d{11}\b")
CNPJ_RE = re.compile(r"\b\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}\b|\b\d{14}\b")
CEP_RE = re.compile(r"\b\d{5}-\d{3}\b")
RG_RE = re.compile(r"\b\d{1,2}\.\d{3}\.\d{3}-[0-9Xx]\b")
PHONE_RE = re.compile(r"\(\d{2}\)\s?(?:9\s?)?\d{4,5}[-\s]?\d{4}\b")

DETECTORS: list[tuple[str, str, re.Pattern[str], object]] = [
    ("cpf", "DOC_PESSOAL", CPF_RE, lambda m: cpf_checksum_ok(_digits(m))),
    ("cnpj", "DOC_EMPRESA", CNPJ_RE, lambda m: cnpj_checksum_ok(_digits(m))),
    ("rg", "DOC_PESSOAL", RG_RE, lambda m: True),
    ("cep", "ENDERECO", CEP_RE, lambda m: True),
    ("email", "CONTATO", EMAIL_RE, lambda m: True),
    ("phone", "CONTATO", PHONE_RE, lambda m: len(_digits(m)) >= 8),
]

DETECTOR_CONF = 1.0


def detect_spans(text: str) -> list[Span]:
    """All validated detector matches as scored spans (conf=1.0).

    n_tokens approximates the match's word-token count so min-token filters
    behave sensibly. Overlaps across detectors (e.g. a bare 11-digit CPF
    inside a phone number) are healed downstream by merge_and_resolve.
    """
    if not text:
        return []
    found: list[Span] = []
    for _name, typ, rx, ok in DETECTORS:
        for m in rx.finditer(text):
            if not ok(m.group(0)):  # type: ignore[operator]
                continue
            ntok = max(1, len(m.group(0).split()))
            found.append(Span(m.start(), m.end(), typ, DETECTOR_CONF, ntok))
    found.sort(key=lambda s: (s.start, s.end, s.type))
    return found


def count_matches(text: str) -> dict[str, int]:
    """Validated match count per detector name (lineage / quick stats)."""
    out: dict[str, int] = {}
    for name, _typ, rx, ok in DETECTORS:
        out[name] = sum(1 for m in rx.finditer(text or "") if ok(m.group(0)))  # type: ignore[operator]
    return out
