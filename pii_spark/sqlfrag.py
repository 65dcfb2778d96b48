"""Dialect-shared SQL fragments.

The driver cross-checks every query against DuckDB. Deterministic *data
construction* (augmenting the word-soup ``documents`` table with synthetic
PII candidates) must be identical on both engines, so those expressions are
emitted ONCE here in the common Spark-SQL ∩ DuckDB dialect (||, CASE, CAST AS
STRING, lpad, substr, %, repeat) and used verbatim on both sides — parity by
construction. The *operators under test* (regex detection, checksum
validation, HOF span filters, windows) are then implemented independently:
DataFrame API / pandas-UDF-over-pii_core on the Spark side, plain SQL on the
DuckDB side, so the comparison genuinely cross-validates two implementations.
"""

from __future__ import annotations

# --- deterministic CPF candidate from doc_id (valid check digits) ----------


def cpf_base9(expr: str = "doc_id") -> str:
    return f"lpad(CAST(({expr} * 7919) % 1000000000 AS STRING), 9, '0')"


def _digit(base: str, i: int) -> str:
    return f"CAST(substr({base}, {i}, 1) AS INT)"


def cpf_valid_sql(expr: str = "doc_id") -> str:
    """SQL producing an 11-digit CPF with *valid* mod-11 check digits,
    a pure function of ``expr`` (same digits on both engines)."""
    b = cpf_base9(expr)
    s1 = " + ".join(f"{_digit(b, i + 1)} * {10 - i}" for i in range(9))
    c1 = f"(CASE WHEN (({s1}) * 10) % 11 = 10 THEN 0 ELSE (({s1}) * 10) % 11 END)"
    s2 = " + ".join(f"{_digit(b, i + 1)} * {11 - i}" for i in range(9))
    s2 = f"{s2} + {c1} * 2"
    c2 = f"(CASE WHEN (({s2}) * 10) % 11 = 10 THEN 0 ELSE (({s2}) * 10) % 11 END)"
    return f"({b} || CAST({c1} AS STRING) || CAST({c2} AS STRING))"


def cpf_candidate_sql(expr: str = "doc_id") -> str:
    """Valid CPF, except every 3rd doc gets its last digit corrupted (+5 mod
    10) so checksum validation has real negatives."""
    v = cpf_valid_sql(expr)
    return (
        f"(CASE WHEN {expr} % 3 = 0 THEN substr({v}, 1, 10) || "
        f"CAST((CAST(substr({v}, 11, 1) AS INT) + 5) % 10 AS STRING) "
        f"ELSE {v} END)"
    )


# --- deterministic CNPJ candidate ------------------------------------------


def cnpj_base12(expr: str = "doc_id") -> str:
    return f"lpad(CAST(({expr} * 104729) % 1000000000000 AS STRING), 12, '0')"


def cnpj_valid_sql(expr: str = "doc_id") -> str:
    b = cnpj_base12(expr)
    w1 = (5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)
    s1 = " + ".join(f"{_digit(b, i + 1)} * {w}" for i, w in enumerate(w1))
    c1 = f"(CASE WHEN ({s1}) % 11 < 2 THEN 0 ELSE 11 - (({s1}) % 11) END)"
    w2 = (6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3)
    s2 = " + ".join(f"{_digit(b, i + 1)} * {w}" for i, w in enumerate(w2))
    s2 = f"{s2} + {c1} * 2"
    c2 = f"(CASE WHEN ({s2}) % 11 < 2 THEN 0 ELSE 11 - (({s2}) % 11) END)"
    return f"({b} || CAST({c1} AS STRING) || CAST({c2} AS STRING))"


def cnpj_candidate_sql(expr: str = "doc_id") -> str:
    v = cnpj_valid_sql(expr)
    return (
        f"(CASE WHEN {expr} % 4 = 0 THEN substr({v}, 1, 13) || "
        f"CAST((CAST(substr({v}, 14, 1) AS INT) + 3) % 10 AS STRING) "
        f"ELSE {v} END)"
    )


# --- augmented document text -------------------------------------------------
# documents.text is digit-free word soup; this suffix deterministically embeds
# detector targets: always an email, phone on even ids, CEP on ids % 3 = 0,
# and the CPF candidate above (valid on 2/3 of docs).


def aug_text_sql() -> str:
    email = "' Contato: user' || CAST(doc_id AS STRING) || '@ex' || CAST(doc_id % 7 AS STRING) || '.com.br'"
    phone = ("(CASE WHEN doc_id % 2 = 0 THEN ' tel (1' || CAST(doc_id % 9 AS STRING) "
             "|| ') 9' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || '-' || "
             "lpad(CAST((doc_id * 7) % 10000 AS STRING), 4, '0') ELSE '' END)")
    cep = ("(CASE WHEN doc_id % 3 = 0 THEN ' CEP ' || "
           "lpad(CAST((doc_id * 13) % 90000 + 10000 AS STRING), 5, '0') || '-' || "
           "lpad(CAST(doc_id % 1000 AS STRING), 3, '0') ELSE '' END)")
    cpf = f"' CPF ' || {cpf_candidate_sql('doc_id')}"
    return f"(text || {email} || {phone} || {cep} || {cpf} || ' fim.')"


# --- regex patterns in the Spark-Java ∩ RE2 (DuckDB) common subset ----------

EMAIL_PAT = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\(\d{2}\) 9\d{3,4}-\d{4}"
# \b on both ends: without them the pattern matches a SUBSTRING of every
# synthetic phone number ("9NNNN-NNNN" contains "NNNNN-NNN"), so n_cep
# counted phones. \b is in the Spark-Java / RE2 common subset.
CEP_PAT = r"\b\d{5}-\d{3}\b"
