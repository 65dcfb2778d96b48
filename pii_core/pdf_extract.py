"""PDF text extraction (layout parse). [NORTH-ONLY]

The north rule's main-content stage covers "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; the reference has no PDF handling, so —
like html_extract — this spec is defined here from the public PDF 1.7
standard (ISO 32000-1: content streams, text-showing operators, string
syntax) and FROZEN by golden tests in tests/test_pdf_extract.py.

Pure stdlib (re + zlib), covering the well-formed simple-font subset:

1. Input must start with ``%PDF-``; anything else (or any parse failure)
   yields "" — never raises (the Spark pipeline quarantines, fail-closed).
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
_WS_RUN = re.compile(r"\s+")

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}

# operators that matter; everything else in a content stream is ignored
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_streams(data: bytes):
    """Yield decoded candidate content streams (those containing b"BT")."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if m is None:
            return
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            return
        pos = end + 9
        # the object header window carries the stream dict (nested dicts and
        # all — token presence is what we test, not dict structure)
        head_lo = data.rfind(b"obj", max(0, m.start() - 2048), m.start())
        head = data[head_lo if head_lo >= 0 else max(0, m.start() - 2048):
                    m.start()]
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
                    continue
        elif b"/Filter" in head:
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


def pdf_to_text(pdf: bytes | str | None) -> str:
    """Extract text from PDF bytes per the frozen spec above. Returns ""
    for non-PDF/malformed input; never raises."""
    if pdf is None:
        return ""
    if isinstance(pdf, str):
        pdf = pdf.encode("latin-1", errors="replace")
    else:
        pdf = bytes(pdf)
    if not pdf.startswith(b"%PDF-"):
        return ""
    out_blocks: list[str] = []
    try:
        for content in _content_streams(pdf):
            for block in _stream_text(content):
                lines = [_WS_RUN.sub(" ", ln).strip() for ln in block]
                lines = [ln for ln in lines if ln]
                if lines:
                    out_blocks.append("\n".join(lines))
    except Exception:
        return ""
    return "\n\n".join(out_blocks)


def looks_like_pdf(payload: bytes | str | None) -> bool:
    """Cheap payload sniff used by the pipeline to route pdf vs html."""
    if payload is None:
        return False
    if isinstance(payload, str):
        return payload.startswith("%PDF-")
    return bytes(payload[:5]) == b"%PDF-"
