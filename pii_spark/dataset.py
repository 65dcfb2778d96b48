"""Distributed training-dataset build (reference
``data_preprocessing/build_finetune_jsonl.py`` as a Spark job).

annotated (doc_id|url, text, entities array<struct<type,value>>)
  -> mapInPandas(pii_core.dataset.chunked_dataset_rows)     doc-local, no shuffle
  -> chunks (doc key, chunk_index, char_start, char_end, text, entities)

Malformed annotations (reference hard-errors: unknown type, value not in
text, build_finetune_jsonl.py:132-192) quarantine in place with ``error``
set, mirroring the extraction job's fail-closed policy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pii_core.pipeline import ExtractConfig

CHUNKS_SCHEMA = T.StructType([
    T.StructField("doc_key", T.StringType(), False),
    T.StructField("chunk_index", T.IntegerType(), False),
    T.StructField("char_start", T.IntegerType(), False),
    T.StructField("char_end", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("entities", T.ArrayType(T.StructType([
        T.StructField("type", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
    ]), False), False),
    T.StructField("error", T.StringType(), True),
])


def build_chunked_dataset(
    annotated: DataFrame,
    cfg: ExtractConfig | None = None,
    key_col: str = "doc_key",
) -> DataFrame:
    """annotated (key_col, text, entities) -> per-chunk training rows."""
    cfg = cfg or ExtractConfig()

    from pii_core.dataset import chunked_dataset_rows

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tokenizer = cfg.make_tokenizer()
        for pdf in batches:
            out = {c: [] for c in ("doc_key", "chunk_index", "char_start",
                                    "char_end", "text", "entities", "error")}
            # the projection below renames key_col to doc_key, so batches
            # always arrive with that name regardless of the caller's column
            for key, text, ents in zip(pdf["doc_key"], pdf["text"],
                                       pdf["entities"]):
                try:
                    # entity normalization INSIDE the try: a null struct
                    # element in the array (schema containsNull) must
                    # quarantine this row, not abort the whole job
                    ents_list = [
                        {"type": e["type"], "value": e["value"]}
                        for e in (ents if ents is not None else [])
                    ]
                    rows = chunked_dataset_rows(
                        text or "", ents_list, cfg, tokenizer)
                    err = None
                except Exception as e:  # noqa: BLE001 — quarantine
                    rows = [{"chunk_index": 0, "char_start": 0,
                             "char_end": 0, "text": "", "entities": []}]
                    err = f"{type(e).__name__}: {e}"[:500]
                for r in rows:
                    out["doc_key"].append(str(key))
                    out["chunk_index"].append(r["chunk_index"])
                    out["char_start"].append(r["char_start"])
                    out["char_end"].append(r["char_end"])
                    out["text"].append(r["text"])
                    out["entities"].append(r["entities"])
                    out["error"].append(err)
            yield pd.DataFrame(out)

    cols = annotated.selectExpr(f"{key_col} AS doc_key", "text", "entities")
    return cols.mapInPandas(run, schema=CHUNKS_SCHEMA)
