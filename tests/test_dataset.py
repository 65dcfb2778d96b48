"""Training-dataset build: chunk + entity slicing (reference
build_finetune_jsonl semantics), pure and distributed."""

from __future__ import annotations

import pytest

from pii_core.dataset import chunked_dataset_rows
from pii_core.pipeline import ExtractConfig

SMALL = ExtractConfig(max_length=24, stride=4, boundary_backoff=4)


def test_single_chunk_doc_keeps_entities():
    text = "O requerente Bruno Silva mora na Rua das Flores, 10."
    ents = [{"type": "NOME_PESSOA", "value": "Bruno Silva"}]
    rows = chunked_dataset_rows(text, ents)
    assert len(rows) == 1
    assert rows[0]["text"] == text
    assert rows[0]["entities"] == [{"type": "NOME_PESSOA", "value": "Bruno Silva"}]


def test_multi_chunk_slices_and_covers():
    words = " ".join(f"palavra{i}" for i in range(120))
    text = f"{words} Bruno Silva aparece aqui. {words}"
    ents = [{"type": "NOME_PESSOA", "value": "Bruno Silva"}]
    rows = chunked_dataset_rows(text, ents, SMALL)
    assert len(rows) > 3
    # coverage: union of chunk ranges == whole text, no gaps
    assert rows[0]["char_start"] <= 0 or text[:rows[0]["char_start"]].strip() == ""
    assert rows[-1]["char_end"] == len(text)
    for a, b in zip(rows, rows[1:]):
        assert b["char_start"] <= a["char_end"]
    # every emitted entity value is literally inside its chunk text
    hits = 0
    for r in rows:
        for e in r["entities"]:
            assert e["value"] in r["text"]
            hits += 1
    assert hits >= 1  # the name landed in at least one chunk


def test_entity_straddling_chunk_boundary_is_sliced():
    """A value that straddles a boundary appears SLICED in both chunks
    (reference build_finetune_jsonl.py:294-314)."""
    words = " ".join(f"w{i}" for i in range(200))
    text = f"{words} NomeComposto Extenso {words}"
    ents = [{"type": "NOME_PESSOA", "value": "NomeComposto Extenso"}]
    rows = chunked_dataset_rows(text, ents, SMALL)
    vals = [e["value"] for r in rows for e in r["entities"]]
    assert vals, "entity lost entirely"
    joined = "".join(vals)
    assert "NomeComposto" in joined


def test_invalid_annotations_raise():
    with pytest.raises(ValueError):
        chunked_dataset_rows("texto", [{"type": "NOPE", "value": "texto"}])
    with pytest.raises(ValueError):
        chunked_dataset_rows("texto", [{"type": "NOME_PESSOA", "value": "ausente"}])


def test_spark_build_chunked_dataset(spark):
    from pii_spark.dataset import build_chunked_dataset

    rows = [
        ("d1", "O requerente Bruno Silva mora na Rua das Flores, 10.",
         [("NOME_PESSOA", "Bruno Silva")]),
        ("d2", "sem entidades aqui", []),
        ("d3", "anotacao quebrada", [("NOME_PESSOA", "inexistente")]),
    ]
    schema = ("doc_key string, text string, "
              "entities array<struct<type:string,value:string>>")
    df = spark.createDataFrame(rows, schema)
    out = {(r["doc_key"], r["chunk_index"]): r
           for r in build_chunked_dataset(df).collect()}
    d1 = out[("d1", 0)]
    assert d1["error"] is None
    assert [e.asDict() for e in d1["entities"]] == [
        {"type": "NOME_PESSOA", "value": "Bruno Silva"}]
    assert out[("d2", 0)]["entities"] == []
    assert out[("d3", 0)]["error"] is not None  # quarantined, job survived

    # parity: Spark rows == pii_core rows for d1
    local = chunked_dataset_rows(rows[0][1],
                                 [{"type": "NOME_PESSOA", "value": "Bruno Silva"}])
    assert d1["text"] == local[0]["text"]
    assert d1["char_start"] == local[0]["char_start"]


def test_build_chunked_dataset_custom_key_col_and_null_entity(spark):
    """Regressions: (a) a non-default key_col must work (the UDF reads the
    renamed doc_key column, not the caller's name); (b) a NULL struct
    element inside the entities array quarantines THAT row with error set
    instead of aborting the whole job."""
    from pii_core.pipeline import ExtractConfig
    from pii_spark.dataset import build_chunked_dataset

    rows = [
        ("u1", "texto com table aqui dentro",
         [{"type": "QUASI_IDENTIFICADOR", "value": "table"}]),
        ("u2", "mais texto limpo sem anotacao", []),
        ("u3", "linha com anotacao quebrada", [None]),  # null element
    ]
    schema = ("url string, text string, entities "
              "array<struct<type:string,value:string>>")
    df = spark.createDataFrame(rows, schema)
    out = build_chunked_dataset(
        df, ExtractConfig(max_length=64, stride=16, boundary_backoff=8),
        key_col="url").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["doc_key"], []).append(r)
    assert set(by_key) == {"u1", "u2", "u3"}
    assert all(r["error"] is None for r in by_key["u1"] + by_key["u2"])
    assert by_key["u1"][0]["entities"]  # annotation sliced into its chunk
    assert len(by_key["u3"]) == 1 and by_key["u3"][0]["error"] is not None
