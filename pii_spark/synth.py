"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Generates the engine's primary input table ``(url, warc_ts, html, text,
lang)`` at any scale from a fixed seed — no wall clock, no network, no
external data. Pages are UTF-8 HTML with nav/header/footer/ads boilerplate
wrapped around a main-content region whose paragraphs embed PII values with
*computed-valid* CPF/CNPJ check digits (plus deliberately broken ones), CEPs,
phones, emails, names, addresses and process ids, so detector + NER + span
algebra all get real work.

Edge docs per FIXTURES.md: empty html; empty main content; text shorter than
one chunk window; text needing 3+ overlapping chunks; the same value twice;
a value that is a numeric substring of another value.

``gen_page(i, seed)`` is a pure function of (seed, i) — independent of
iteration order — so distributed generation at any partitioning produces
identical rows. Page sizes follow a heavy-tailed length distribution so
partition skew is realistic; the salted repartition in ``extract.py`` exists
to defeat exactly that.
"""

from __future__ import annotations

import datetime as _dt
import random
from collections.abc import Iterator

_FIRST = ["Ana", "Bruno", "Carla", "Diego", "Elisa", "Fabio", "Gustavo",
          "Helena", "Igor", "Julia", "Karina", "Lucas", "Marina", "Nelson",
          "Otavio", "Paula", "Rafael", "Sofia", "Thiago", "Vera"]
_LAST = ["Silva", "Souza", "Oliveira", "Pereira", "Costa", "Rodrigues",
         "Almeida", "Nascimento", "Lima", "Araujo", "Fernandes", "Carvalho"]
_STREETS = ["Rua das Flores", "Avenida Paulista", "Travessa do Comercio",
            "Alameda Santos", "Rua Quinze de Novembro", "Avenida Brasil"]
_WORDS = ("processo administrativo requerimento protocolo resposta prazo "
          "documento informacao solicitacao atendimento publico transparencia "
          "orgao municipio estado analise parecer decisao recurso arquivo "
          "sistema registro dados cadastro servidor cidadao lei acesso").split()
_LANGS = ["pt", "pt", "pt", "pt", "pt", "pt", "pt", "pt", "en", "es"]

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)


def _cpf(rng: random.Random, valid: bool = True) -> str:
    digs = [rng.randrange(10) for _ in range(9)]
    if len(set(digs)) == 1:
        digs[0] = (digs[0] + 1) % 10
    for pos in (9, 10):
        acc = sum(d * w for d, w in zip(digs, range(pos + 1, 1, -1)))
        check = (acc * 10) % 11
        digs.append(0 if check == 10 else check)
    if not valid:
        digs[10] = (digs[10] + 1 + rng.randrange(9)) % 10
    s = "".join(map(str, digs))
    if rng.randrange(2):
        return f"{s[:3]}.{s[3:6]}.{s[6:9]}-{s[9:]}"
    return s


def _cnpj(rng: random.Random, valid: bool = True) -> str:
    digs = [rng.randrange(10) for _ in range(12)]
    for weights in ((5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2),
                    (6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)):
        acc = sum(d * w for d, w in zip(digs, weights))
        rem = acc % 11
        digs.append(0 if rem < 2 else 11 - rem)
    if not valid:
        digs[13] = (digs[13] + 1 + rng.randrange(9)) % 10
    s = "".join(map(str, digs))
    if rng.randrange(2):
        return f"{s[:2]}.{s[2:5]}.{s[5:8]}/{s[8:12]}-{s[12:]}"
    return s


def _pii_fragment(rng: random.Random) -> str:
    name = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
    kind = rng.randrange(8)
    if kind == 0:
        return f"O requerente {name} portador do CPF {_cpf(rng)} solicitou acesso."
    if kind == 1:
        return (f"Contato: {name.split()[0].lower()}.{rng.randrange(999)}"
                f"@exemplo.com.br ou telefone ({rng.randrange(11, 99)}) "
                f"9{rng.randrange(1000, 9999)}-{rng.randrange(1000, 9999)}.")
    if kind == 2:
        return (f"Endereco: {rng.choice(_STREETS)}, {rng.randrange(1, 2000)}, "
                f"CEP {rng.randrange(10000, 99999)}-{rng.randrange(100, 999):03d}.")
    if kind == 3:
        return (f"A empresa registrada sob CNPJ {_cnpj(rng)} respondeu "
                f"ao protocolo.")
    if kind == 4:  # broken check digit — detector must reject
        return f"Numero informado {_cpf(rng, valid=False)} nao confere."
    if kind == 5:
        return (f"Sr. {name}, nascido em {rng.randrange(1, 28):02d}/"
                f"{rng.randrange(1, 12):02d}/{rng.randrange(1950, 2005)}, "
                f"registrou o pedido.")
    if kind == 6:
        return (f"Processo SEI n. {rng.randrange(10000, 99999)}-"
                f"{rng.randrange(100000, 999999)}/{rng.randrange(2015, 2025)}-"
                f"{rng.randrange(10, 99)} em tramite.")
    return (f"Veiculo placa "
            f"{''.join(rng.choice('ABCDEFGHIJKLMNOPQRSTUVWXYZ') for _ in range(3))}"
            f"-{rng.randrange(1000, 9999)} de {name}.")


def _plain_sentence(rng: random.Random, n: int = 12) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _paragraphs(rng: random.Random, n_paras: int, pii_rate: float) -> list[str]:
    paras = []
    for _ in range(n_paras):
        sents = [_plain_sentence(rng, rng.randrange(6, 18))
                 for _ in range(rng.randrange(2, 6))]
        if rng.random() < pii_rate:
            sents.insert(rng.randrange(len(sents) + 1), _pii_fragment(rng))
        paras.append(" ".join(sents))
    return paras


_BOILER = """<nav class="navbar"><ul><li><a href="/">Home</a></li>
<li><a href="/sobre">Sobre</a></li><li><a href="/contato">Contato</a></li></ul></nav>
<header><h1>Portal da Transparencia</h1></header>
<div class="sidebar"><a href="/x1">Link um</a> <a href="/x2">Link dois</a>
<a href="/x3">Link tres</a> <a href="/x4">Link quatro</a></div>
<div class="ads banner">Compre agora! Oferta imperdivel por tempo limitado.</div>"""

_FOOTER = """<footer><p>Copyright 2025 - Todos os direitos reservados.
<a href="/privacidade">Privacidade</a> <a href="/termos">Termos</a></p></footer>
<script>var tracker = init("analytics");</script>"""


def _page_html(rng: random.Random, paras: list[str], title: str) -> str:
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    return (f"<html><head><title>{title}</title><style>.x{{color:red}}</style>"
            f"</head><body>{_BOILER}\n<main><article><h2>{title}</h2>\n{body}"
            f"</article></main>\n{_FOOTER}</body></html>")


def gen_page(i: int, seed: int = 42, pii_rate: float = 0.45,
             skew: bool = True) -> dict:
    """Record i — a pure function of (seed, i)."""
    rng = random.Random((seed << 24) ^ i)
    title = _plain_sentence(rng, 4).rstrip(".")
    # heavy tail: ~70% short, ~25% medium, ~5% long (3+ overlapping chunks)
    roll = rng.random() if skew else 0.5
    if roll < 0.70:
        n_paras = rng.randrange(1, 4)
    elif roll < 0.95:
        n_paras = rng.randrange(4, 12)
    else:
        n_paras = rng.randrange(30, 90)
    paras = _paragraphs(rng, n_paras, pii_rate)

    # FIXTURES.md edge docs, pinned at fixed residues
    if i % 211 == 3:
        paras = []  # empty main content
    elif i % 211 == 4:
        v = _cpf(rng)
        paras = [f"Dois registros do mesmo CPF {v} e novamente {v} aqui."]
    elif i % 211 == 5:
        # BARE digits, deterministically: the edge is "one value is a
        # numeric substring of another", which needs the unformatted
        # 14-digit run every time (_cnpj formats randomly)
        c = "".join(ch for ch in _cnpj(rng, valid=True) if ch.isdigit())
        paras = [f"Documento composto {c} contem subsequencias numericas."]

    html = "" if i % 211 == 6 else _page_html(rng, paras, title)
    ts = _EPOCH + _dt.timedelta(seconds=(i * 37) % 31_536_000)
    return {
        "url": f"https://site-{i % 97:02d}.example.gov.br/doc/{seed}/{i}",
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": None,
        "lang": _LANGS[i % len(_LANGS)],
    }


def _page_pdf(paras: list[str], title: str) -> bytes:
    """Minimal PDF 1.4: one FlateDecode content stream, title + one Tj line
    per paragraph (the pdf_extract frozen subset)."""
    import zlib  # noqa: PLC0415

    def esc(s: str) -> str:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)"))

    ops = [f"({esc(title)}) Tj"]
    ops += [f"T* ({esc(p)}) Tj" for p in paras]
    content = ("BT /F1 12 Tf " + " ".join(ops) + " ET").encode(
        "latin-1", errors="replace")
    body = zlib.compress(content)
    return (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + body
            + b"\nendstream\nendobj\ntrailer\n<< >>\n%%EOF\n")


def gen_pdf_page(i: int, seed: int = 42, pii_rate: float = 0.45) -> dict:
    """PDF-payload record i — pure function of (seed, i), same row schema as
    gen_page (the payload column carries pdf bytes; extract_page sniffs the
    %PDF- magic)."""
    rng = random.Random(((seed << 24) ^ i) + 0x9E3779B9)
    title = _plain_sentence(rng, 4).rstrip(".")
    paras = _paragraphs(rng, rng.randrange(1, 8), pii_rate)
    title_opt = title
    if i % 97 == 7:
        # TRULY textless pdf (no title either): streams exist but no text
        # comes out, so the strict pipeline QUARANTINES it — the corpus
        # must exercise that fail-closed branch, not just comment about it
        paras, title_opt = [], ""
    ts = _EPOCH + _dt.timedelta(seconds=(i * 53) % 31_536_000)
    return {
        "url": f"https://site-{i % 97:02d}.example.gov.br/pdf/{seed}/{i}",
        "warc_ts": ts,
        "html": _page_pdf(paras, title_opt),
        "text": None,
        "lang": _LANGS[i % len(_LANGS)],
    }


def pdf_pages_df(spark, n: int, seed: int = 42,
                 num_partitions: int | None = None):
    """Distributed deterministic PDF corpus (same contract as pages_df)."""
    return _gen_df(spark, gen_pdf_page, n, seed, num_partitions)


def gen_pages(n: int, seed: int = 42, pii_rate: float = 0.45,
              skew: bool = True) -> Iterator[dict]:
    for i in range(n):
        yield gen_page(i, seed=seed, pii_rate=pii_rate, skew=skew)


def gen_giant_page(i: int = 0, seed: int = 42,
                   target_bytes: int = 12_000_000) -> dict:
    """A deterministic pathological multi-MB page (giant-page straggler
    fixture): a real page whose body paragraphs are repeated until the
    encoded HTML exceeds ``target_bytes``. Shape matches gen_page so it can
    be unioned into any pages frame."""
    rng = random.Random((seed << 24) ^ (0x61A47 + i))
    title = _plain_sentence(rng, 4).rstrip(".")
    paras = _paragraphs(rng, 8, 0.45)
    body_bytes = max(1, len("\n".join(f"<p>{p}</p>"
                                      for p in paras).encode("utf-8")))
    reps = max(1, target_bytes // body_bytes + 1)
    html = _page_html(rng, paras * reps, title)
    while len(html.encode("utf-8")) <= target_bytes:
        reps *= 2
        html = _page_html(rng, paras * reps, title)
    ts = _EPOCH + _dt.timedelta(seconds=(i * 37) % 31_536_000)
    return {
        "url": f"https://giant-{i:02d}.example.gov.br/doc/{seed}/giant",
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": None,
        "lang": _LANGS[i % len(_LANGS)],
    }


def _gen_df(spark, gen, n: int, seed: int,
            num_partitions: int | None):
    """Shared scaffolding for the deterministic corpora: parallelize
    indices, build each record executor-side (record i depends only on
    (seed, i)). Scales to any n with no driver memory pressure — at 10^12
    rows this is the same code, just more index partitions."""
    from pii_spark.schemas import PAGES_SCHEMA

    num_partitions = num_partitions or max(
        2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions)

    def as_row(i: int):
        r = gen(i, seed=seed)
        return (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])

    return spark.createDataFrame(rdd.map(as_row), PAGES_SCHEMA)


def pages_df(spark, n: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed deterministic page corpus (see _gen_df)."""
    return _gen_df(spark, gen_page, n, seed, num_partitions)


def write_pages(spark, out_dir: str, n: int, seed: int = 42) -> None:
    """Materialize a corpus to parquet (bench input)."""
    pages_df(spark, n, seed=seed).write.mode("overwrite").parquet(out_dir)


def clustered_embeddings_pdf(n: int, dim: int = 64, n_clusters: int = 16,
                             seed: int = 101, spread: float = 0.35):
    """Deterministic CLUSTERED unit embeddings — the realistic
    text-embedding regime (near-uniform vectors, as in the sf tables'
    embeddings, are the adversarial regime for hashing ANN).

    Each point = unit cluster center + ``spread`` × unit noise, renormalized,
    so same-cluster cosine ≈ 1/(1+spread²) ≈ 0.89 at the default — about
    what sentence embeddings of near-duplicate web text score. Returns a
    pandas frame (vec_id, embedding: list[float], cluster_id); callers
    createDataFrame it for Spark-side ANN gates."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cid = np.arange(n) % n_clusters
    g = rng.normal(0, 1, (n, dim))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    pts = centers[cid] + spread * g
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(float).tolist() for row in pts],
        "cluster_id": cid.astype(np.int64),
    })
