"""PDF text extraction — golden tests freezing the [NORTH-ONLY] spec
(pii_core/pdf_extract.py) so extracted text per document is deterministic."""

from __future__ import annotations

import zlib

from hypothesis import given, settings, strategies as st

from pii_core.pdf_extract import looks_like_pdf, pdf_to_text
from pii_core.pipeline import extract_page


def mk_pdf(*contents: bytes, compress: bool = True, filt: bytes = b"") -> bytes:
    """Minimal syntactically-plausible PDF wrapping content streams."""
    parts = [b"%PDF-1.4\n"]
    for i, content in enumerate(contents):
        body = zlib.compress(content) if compress else content
        f = filt or (b"/Filter /FlateDecode " if compress else b"")
        parts.append(
            b"%d 0 obj\n<< /Length %d %s>>\nstream\n" % (i + 1, len(body), f)
            + body + b"\nendstream\nendobj\n")
    parts.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(parts)


def test_simple_tj():
    pdf = mk_pdf(b"BT /F1 12 Tf (Processo 12345 com CPF 529.982.247-25) Tj ET")
    assert pdf_to_text(pdf) == "Processo 12345 com CPF 529.982.247-25"


def test_uncompressed_stream():
    pdf = mk_pdf(b"BT (texto sem compressao aqui) Tj ET", compress=False)
    assert pdf_to_text(pdf) == "texto sem compressao aqui"


def test_tj_array_concatenates_elements():
    pdf = mk_pdf(b"BT [(Con) -120 (ta) 80 (to:) ] TJ ( x@y.org) Tj ET")
    assert pdf_to_text(pdf) == "Contato: x@y.org"


def test_td_and_quote_are_line_breaks():
    pdf = mk_pdf(b"BT (linha um) Tj 0 -14 Td (linha dois) Tj T* (tres) Tj ET"
                 b" BT (novo bloco) Tj (continua) ' ET")
    assert pdf_to_text(pdf) == (
        "linha um\nlinha dois\ntres\n\nnovo bloco\ncontinua")


def test_escapes_octal_and_hex_strings():
    pdf = mk_pdf(rb"BT (par\(ent\)eses \\ barra \110i) Tj "
                 b"<4f6c61> Tj ET")
    assert pdf_to_text(pdf) == "par(ent)eses \\ barra HiOla"


def test_escaped_newline_continuation():
    pdf = mk_pdf(b"BT (quebra\\\nsem espaco) Tj ET")
    assert pdf_to_text(pdf) == "quebrasem espaco"


def test_unsupported_filter_and_imageish_streams_skipped():
    good = b"BT (conteudo legivel permanece) Tj ET"
    pdf = mk_pdf(b"\xff\xd8\xff binary image junk (not text)",
                 good, compress=False)
    # first stream has no BT -> skipped; second extracted
    assert pdf_to_text(pdf) == "conteudo legivel permanece"
    lzw = mk_pdf(b"garbage", compress=False, filt=b"/Filter /LZWDecode ")
    assert pdf_to_text(lzw) == ""


def test_non_pdf_and_malformed_inputs():
    assert pdf_to_text(None) == ""
    assert pdf_to_text(b"") == ""
    assert pdf_to_text(b"<html><p>not a pdf</p></html>") == ""
    assert pdf_to_text(b"%PDF-1.4\ngarbage without streams") == ""
    truncated = mk_pdf(b"BT (x) Tj ET")[:40]
    assert isinstance(pdf_to_text(truncated), str)


def test_sniffing():
    assert looks_like_pdf(b"%PDF-1.7\n...")
    assert looks_like_pdf("%PDF-1.4")
    assert not looks_like_pdf(b"<html>")
    assert not looks_like_pdf(None)


def test_extract_page_routes_pdf_payloads():
    content = (b"BT (Requerimento de acesso. Contato: maria@example.com) Tj "
               b"0 -14 Td (CPF 529.982.247-25 em anexo.) Tj ET")
    rec = extract_page("u", mk_pdf(content), None)
    assert "maria@example.com" in rec["extracted_text"]
    types = {s["type"] for s in rec["spans"]}
    assert "CONTATO" in types and "DOC_PESSOAL" in types
    assert rec["should_be_public"] is False
    # html payloads still route to the html extractor
    rec2 = extract_page("u2", b"<body><p>Texto html longo o suficiente para "
                        b"ser mantido aqui.</p></body>", None)
    assert rec2["extracted_text"].startswith("Texto html")


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_never_raises_on_pdf_prefixed_garbage(b):
    out = pdf_to_text(b"%PDF-" + b)
    assert isinstance(out, str)
    assert pdf_to_text(b"%PDF-" + b) == out  # deterministic
