"""PDF text extraction (layout parse). [NORTH-ONLY]

The north rule's main-content stage covers "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; the reference has no PDF handling, so —
like html_extract — this spec is defined here from the public PDF 1.7
standard (ISO 32000-1: content streams, text-showing operators, string
syntax) and FROZEN by golden tests in tests/test_pdf_extract.py.

Pure stdlib (re + zlib), covering the well-formed simple-font subset:

1. ``pdf_to_text``: input must start with ``%PDF-``; anything else (or any
   parse failure) yields "" — never raises. The PIPELINE uses
   ``pdf_to_text_strict`` instead, which raises ``UnsupportedPdfError``
   whenever text coverage cannot be asserted (unreadable streams, or
   streams present but zero text) so such pages QUARANTINE fail-closed —
   a silent "" would flow to spans=[] and should_be_public=True,
   publishing a document whose content was never actually scanned.
2. Content streams are the ``stream``...``endstream`` payloads whose decoded
   bytes contain a ``BT`` text block. ``/FlateDecode`` streams are inflated
   with zlib; unfiltered streams are used raw; any other filter (DCT, LZW,
   ...) is skipped.
3. Inside content streams, text accumulates from the text-showing operators
   in stream order (the PDF's layout order):
     - ``(string) Tj``  — append
     - ``(string) '`` / ``(string) "``— newline, then append
     - ``[(a) -120 (b)] TJ``          — append elements concatenated
     - ``Td`` / ``TD`` / ``T*``       — newline
     - ``BT`` / ``ET``                — block start / end
4. Literal strings decode PDF escapes (\\n \\r \\t \\b \\f \\( \\) \\\\,
   1-3 digit octal, line continuations); ``<hex>`` strings decode hex pairs
   (odd length zero-padded). Bytes map to text via latin-1 — byte-preserving
   and deterministic. (No ToUnicode CMap handling: composite-font PDFs fall
   outside the frozen subset and extract as "" or garbage that downstream
   detectors simply won't match; never an exception.)
5. Normalization mirrors html_extract: within a block, lines are
   whitespace-collapsed and stripped, empty lines dropped, joined with
   "\\n"; non-empty blocks join with "\\n\\n".
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n")
# the real object header is "N G obj" — matching a bare "obj" substring
# would hit the tail of name tokens like /XObject inside the stream dict
_OBJ_HDR_RE = re.compile(rb"\d+\s+\d+\s+obj\b")
_WS_RUN = re.compile(r"\s+")


class UnsupportedPdfError(RuntimeError):
    """Raised by ``pdf_to_text_strict`` when a PDF's text coverage cannot
    be asserted: at least one content stream was unreadable (unsupported
    filter, corrupt compression, missing endstream), or the document has
    streams but yielded no text at all (image-only / composite-font).
    The extraction pipeline quarantines such pages instead of letting an
    empty extraction mark them publishable."""

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}

# operators that matter; everything else in a content stream is ignored
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_streams(data: bytes, counters: list[int] | None = None):
    """Yield decoded candidate content streams (those containing b"BT").

    ``counters`` (optional two-slot list) accumulates [streams_seen,
    streams_unreadable] so the strict entry point can tell "no text
    because there is none" from "no text because we could not read it"."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if m is None:
            return
        if counters is not None:
            counters[0] += 1
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            if counters is not None:
                counters[1] += 1  # truncated: stream body unreadable
            return
        pos = end + 9
        # The object header window carries the stream dict (nested dicts
        # and all — token presence is what we test, not dict structure).
        # The header is located by the LAST "N G obj" token before the
        # stream: a substring rfind(b"obj") would match the tail of name
        # tokens like /XObject inside the dict and truncate the window
        # past /Filter, silently treating a compressed stream as raw.
        win_lo = max(0, m.start() - 2048)
        win = data[win_lo:m.start()]
        head = win
        for hm in _OBJ_HDR_RE.finditer(win):
            head = win[hm.end():]
        raw = data[start:end]
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except Exception:
                # writers commonly put an EOL before `endstream` that is not
                # part of the stream data (/Length covers the exact bytes)
                try:
                    raw = zlib.decompress(raw.rstrip(b"\r\n"))
                except Exception:
                    if counters is not None:
                        counters[1] += 1
                    continue
        elif b"/Filter" in head:
            if counters is not None:
                counters[1] += 1
            continue  # unsupported filter
        if b"BT" in raw:
            yield raw


def _literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at data[i] == '(' — returns
    (decoded text, index after the closing paren). Handles nesting and
    escapes per ISO 32000-1 §7.3.4.2."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal, 1-3 digits
                oct_digits = [e - 0x30]
                i += 1
                while (i < n and len(oct_digits) < 3
                       and 0x30 <= data[i] <= 0x37):
                    oct_digits.append(data[i] - 0x30)
                    i += 1
                code = 0
                for d in oct_digits:
                    code = code * 8 + d
                out.append(chr(code & 0xFF))
                continue
            if e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
                continue
            out.append(_ESCAPES.get(e, chr(e)))
            i += 1
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if not depth:
                i += 1
                break
        if depth:
            out.append(chr(c))
        i += 1
    return "".join(out), i


def _hex_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse <hex...> starting at data[i] == '<'."""
    j = data.find(b">", i + 1)
    if j < 0:
        return "", len(data)
    hx = bytes(ch for ch in data[i + 1:j]
               if ch in b"0123456789abcdefABCDEF")
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


def _stream_text(content: bytes) -> list[list[str]]:
    """Scan one decoded content stream → list of blocks, each a list of
    line strings (pre-normalization)."""
    blocks: list[list[str]] = []
    cur_lines: list[str] = []
    cur: list[str] = []
    in_text = False
    strings: list[str] = []  # strings seen since the last operator
    i, n = 0, len(content)

    def endline():
        txt = "".join(cur)
        if txt:
            cur_lines.append(txt)
        cur.clear()

    def endblock():
        endline()
        if cur_lines:
            blocks.append(list(cur_lines))
        cur_lines.clear()

    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _literal_string(content, i)
            strings.append(s)
            continue
        if c == 0x3C:  # <
            if i + 1 < n and content[i + 1] == 0x3C:  # << dict — skip token
                i += 2
                continue
            s, i = _hex_string(content, i)
            strings.append(s)
            continue
        m = _OP_RE.match(content, i)
        if m is None:
            i += 1
            continue
        op = m.group()
        i = m.end()
        if op == b"BT":
            endblock()
            in_text = True
            strings.clear()
        elif op == b"ET":
            endblock()
            in_text = False
            strings.clear()
        elif not in_text:
            strings.clear()
        elif op == b"Tj" or op == b"TJ":
            cur.extend(strings)
            strings.clear()
        elif op == b"'" or op == b'"':
            endline()
            cur.extend(strings)
            strings.clear()
        elif op in (b"Td", b"TD", b"T*"):
            endline()
            strings.clear()
        else:
            strings.clear()
    endblock()
    return blocks


def _pdf_text_counted(pdf: bytes) -> tuple[str, int, int]:
    """(text, streams_seen, streams_unreadable) for %PDF- prefixed bytes.
    Internal parse errors surface to the caller."""
    counters = [0, 0]
    out_blocks: list[str] = []
    for content in _content_streams(pdf, counters):
        for block in _stream_text(content):
            lines = [_WS_RUN.sub(" ", ln).strip() for ln in block]
            lines = [ln for ln in lines if ln]
            if lines:
                out_blocks.append("\n".join(lines))
    return "\n\n".join(out_blocks), counters[0], counters[1]


def _coerce_pdf(pdf: bytes | str | None) -> bytes | None:
    if pdf is None:
        return None
    if isinstance(pdf, str):
        pdf = pdf.encode("latin-1", errors="replace")
    else:
        pdf = bytes(pdf)
    return pdf if pdf.startswith(b"%PDF-") else None


def pdf_to_text(pdf: bytes | str | None) -> str:
    """Extract text from PDF bytes per the frozen spec above. Returns ""
    for non-PDF/malformed input; never raises. For pipeline use prefer
    ``pdf_to_text_strict`` — this lenient form cannot distinguish "no
    text" from "unreadable text"."""
    data = _coerce_pdf(pdf)
    if data is None:
        return ""
    try:
        return _pdf_text_counted(data)[0]
    except Exception:
        return ""


def pdf_to_text_strict(pdf: bytes | str | None) -> str:
    """``pdf_to_text`` that REFUSES to vouch for what it could not read:
    raises ``UnsupportedPdfError`` when any content stream is unreadable
    (unsupported filter, corrupt compression, truncation, parse failure)
    or when streams exist but no text came out (image-only or
    composite-font documents — their content may hold PII this engine
    cannot see). Non-PDF / empty input still returns "" (the payload
    sniff routes those to the HTML path anyway)."""
    data = _coerce_pdf(pdf)
    if data is None:
        return ""
    try:
        text, n_streams, n_bad = _pdf_text_counted(data)
    except Exception as e:
        raise UnsupportedPdfError(
            f"PDF parse failed ({type(e).__name__}: {e}) — text coverage "
            "cannot be asserted") from e
    if n_bad:
        raise UnsupportedPdfError(
            f"{n_bad}/{n_streams} content streams unreadable (unsupported "
            "filter, corrupt compression or truncation) — quarantining "
            "beats publishing unscanned content")
    if n_streams and not text:
        raise UnsupportedPdfError(
            f"{n_streams} content streams but no extractable text "
            "(image-only or composite-font PDF) — cannot assert the "
            "document is PII-free")
    return text


def looks_like_pdf(payload: bytes | str | None) -> bool:
    """Cheap payload sniff used by the pipeline to route pdf vs html."""
    if payload is None:
        return False
    if isinstance(payload, str):
        return payload.startswith("%PDF-")
    return bytes(payload[:5]) == b"%PDF-"
