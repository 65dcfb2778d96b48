"""Synthetic corpus generator: determinism, edge docs, PII presence."""

from __future__ import annotations

from pii_core.detectors import cpf_checksum_ok
from pii_spark.synth import _cpf, gen_page, gen_pages
import random


def test_pure_function_of_seed_and_index():
    a = [gen_page(i, seed=5) for i in range(50)]
    b = [gen_page(i, seed=5) for i in range(50)]
    assert a == b
    c = gen_page(7, seed=6)
    assert c != a[7]


def test_unique_urls_and_schema():
    pages = list(gen_pages(300, seed=3))
    urls = [p["url"] for p in pages]
    assert len(set(urls)) == 300
    for p in pages[:10]:
        assert set(p) == {"url", "warc_ts", "html", "text", "lang"}
        assert isinstance(p["html"], bytes)


def test_edge_docs_present():
    pages = list(gen_pages(220, seed=3))
    assert pages[6]["html"] == b""          # empty html at i%211==6
    assert b"novamente" in pages[4]["html"]  # duplicated value doc


def test_generated_cpfs_validate():
    rng = random.Random(0)
    for _ in range(50):
        digits = "".join(ch for ch in _cpf(rng, valid=True) if ch.isdigit())
        assert cpf_checksum_ok(digits)
        bad = "".join(ch for ch in _cpf(rng, valid=False) if ch.isdigit())
        assert not cpf_checksum_ok(bad)


def test_skew_has_heavy_tail():
    sizes = [len(p["html"]) for p in gen_pages(400, seed=11)]
    sizes.sort()
    assert sizes[-1] > 8 * sizes[len(sizes) // 2]  # long docs >> median
