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


# =========================================================================
# Mutation fuzz: corrupted real-world-shaped PDFs (HTML fuzz suite twin)
# =========================================================================
# Wild crawls carry truncated downloads, proxy-mangled bytes, and spliced
# responses. Each VALID synthetic PDF is hit with seeded mutations
# (truncate, byte flips, slice deletion/duplication, garbage splice) and
# the frozen-spec contract is asserted: pdf_to_text NEVER raises, is
# deterministic, and the full pipeline (extract_page_batch) either returns
# a well-formed record or quarantines that page as an Exception — a
# corrupt PDF must never abort the batch.

def _mutations(data: bytes, seed: int) -> list[bytes]:
    import random

    rng = random.Random(seed)
    n = len(data)
    ba = bytearray(data)
    for _ in range(rng.randint(1, 8)):  # random byte flips
        ba[rng.randrange(n)] = rng.randrange(256)
    cut_a, cut_b = sorted(rng.randrange(n) for _ in range(2))
    return [
        data[: rng.randrange(1, n)],                       # truncation
        bytes(ba),                                         # byte flips
        data[:cut_a] + data[cut_b:],                       # slice deleted
        data[:cut_b] + data[cut_a:cut_b] + data[cut_b:],   # slice doubled
        data[:cut_a] + bytes(rng.randrange(256) for _ in range(40))
        + data[cut_a:],                                    # garbage splice
        data + data[: cut_a or 1],                         # trailing junk
    ]


def test_fuzz_mutated_pdfs_never_raise_and_never_poison_the_batch():
    from pii_core.pipeline import extract_page_batch
    from pii_spark.synth import gen_pdf_page

    base = [gen_pdf_page(i, seed=13)["html"] for i in range(12)]
    base.append(mk_pdf(
        b"BT (Processo 98765 com CPF 529.982.247-25) Tj ET",
        b"BT [(Con) -120 (tato:) ] TJ ( x@y.org) Tj 0 -14 Td (fim) Tj ET",
    ))
    mutants: list[bytes] = []
    for seed, pdf in enumerate(base * 16):
        mutants.extend(_mutations(pdf, seed))
    assert len(mutants) >= 1000

    for m in mutants:
        out = pdf_to_text(m)  # must never raise
        assert isinstance(out, str)
        assert pdf_to_text(m) == out  # deterministic

    # the mutants ride through the batched pipeline alongside a healthy
    # page; every element must be a record or a quarantined Exception, and
    # the healthy neighbor must come out intact
    healthy = ("ok", mk_pdf(b"BT (Contato: maria@example.com) Tj ET"), None)
    rows = [(f"m{i}", m, None) for i, m in enumerate(mutants[:200])]
    rows.insert(50, healthy)
    recs = extract_page_batch(rows)
    assert len(recs) == len(rows)
    for (url, _h, _t), rec in zip(rows, recs):
        assert isinstance(rec, (dict, Exception)), url
        if isinstance(rec, dict):
            assert set(rec) >= {"url", "extracted_text", "spans",
                                "should_be_public"}
    ok = recs[50]
    assert isinstance(ok, dict) and "maria@example.com" in ok["extracted_text"]
    assert ok["should_be_public"] is False


def test_xobject_name_in_dict_does_not_break_filter_detection():
    """Regression: the object-header window is located by the real
    'N G obj' token — a bare rfind(b"obj") matched the tail of name
    tokens like /Name /Xobject inside the stream dict, truncating the
    window past /Filter /FlateDecode so the compressed stream was scanned
    raw and its text silently discarded."""
    content = b"BT (CPF 529.982.247-25 escondido em xobject) Tj ET"
    body = zlib.compress(content)
    pdf = (b"%PDF-1.4\n"
           + (b"1 0 obj\n<< /Length %d /Filter /FlateDecode "
              b"/Name /Xobject >>\nstream\n" % len(body))
           + body + b"\nendstream\nendobj\ntrailer\n%%EOF\n")
    assert "529.982.247-25" in pdf_to_text(pdf)


def test_strict_pdf_quarantines_unscannable_documents():
    """Fail-closed contract: a PDF whose text coverage cannot be asserted
    must QUARANTINE in the pipeline (error row), never flow to spans=[] /
    should_be_public=True — the lenient pdf_to_text stays ''-returning
    for report/debug use."""
    import pytest as _pytest

    from pii_core.pdf_extract import UnsupportedPdfError, pdf_to_text_strict
    from pii_core.pipeline import extract_page_batch

    lzw = mk_pdf(b"BT (segredo ilegivel) Tj ET", compress=False,
                 filt=b"/Filter /LZWDecode ")
    imageish = mk_pdf(b"\x00\x01rasterbytes\x02", compress=True)
    fine = mk_pdf(b"BT (Contato: maria@example.com) Tj ET")
    empty_doc = b"%PDF-1.4\ntrailer\n<< >>\n%%EOF\n"  # no streams at all

    assert pdf_to_text(lzw) == ""                      # lenient unchanged
    with _pytest.raises(UnsupportedPdfError, match="unreadable"):
        pdf_to_text_strict(lzw)
    with _pytest.raises(UnsupportedPdfError, match="no extractable text"):
        pdf_to_text_strict(imageish)
    assert pdf_to_text_strict(empty_doc) == ""         # genuinely empty: ok
    assert "maria@example.com" in pdf_to_text_strict(fine)

    recs = extract_page_batch([("a", lzw, None), ("b", fine, None),
                               ("c", imageish, None)])
    assert isinstance(recs[0], UnsupportedPdfError)
    assert isinstance(recs[2], UnsupportedPdfError)
    assert isinstance(recs[1], dict)
    assert recs[1]["should_be_public"] is False
