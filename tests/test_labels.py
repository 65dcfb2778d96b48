"""Taxonomy, sanitization and validation — CORRETO/ERRADO examples lifted from
the reference's embedded docstrings (ner_labels.py:281-356)."""

import pytest

from pii_core.labels import (
    ENTITY_TYPES,
    NON_PII_TYPES,
    PII_TYPES,
    TYPE_PRIORITY,
    bio_label_space,
    label_maps,
    sanitize_value,
    validate_value,
)


def test_taxonomy_shape():
    assert len(ENTITY_TYPES) == 13
    assert set(NON_PII_TYPES) == {"ORG_JURIDICA", "DOC_EMPRESA"}
    assert len(PII_TYPES) == 11
    assert set(TYPE_PRIORITY) == set(ENTITY_TYPES)
    labels = bio_label_space()
    assert len(labels) == 27 and labels[0] == "O"
    l2i, i2l = label_maps()
    assert l2i["O"] == 0 and i2l[1].startswith("B-")


@pytest.mark.parametrize("typ,raw,clean", [
    ("ID_PROCESSUAL", "SEI nº 123456/2023", "123456/2023"),
    ("ID_PROCESSUAL", "Processo 123456", "123456"),
    ("ID_PROCESSUAL", "Protocolo SEI 123456", "123456"),
    ("DOC_PESSOAL", "CPF: 529.982.247-25", "529.982.247-25"),
    ("DADO_FINANCEIRO", "Agência 0850", "0850"),
    ("DADO_FINANCEIRO", "chave Pix 11999887766", "11999887766"),
    ("ID_VEICULO", "placa ABC-1234", "ABC-1234"),
    ("DOC_EMPRESA", "CNPJ: 25.598.301/0001-68", "25.598.301/0001-68"),
    ("CONTATO", "e-mail: maria@x.com", "maria@x.com"),
])
def test_sanitize_strips_prefixes(typ, raw, clean):
    text = f"contexto {raw} e {clean} fim"
    assert sanitize_value(typ, raw, text) == clean


def test_sanitize_keeps_value_when_clean_not_in_text():
    # cleaned value must be a literal substring, else keep the original
    assert sanitize_value("ID_PROCESSUAL", "SEI nº 99", "texto sem o numero") == "SEI nº 99"


def test_sanitize_idempotent():
    text = "x 123456/2023 y SEI nº 123456/2023"
    once = sanitize_value("ID_PROCESSUAL", "SEI nº 123456/2023", text)
    assert sanitize_value("ID_PROCESSUAL", once, text) == once


def test_sanitize_unknown_type_passthrough():
    assert sanitize_value("DADO_SAUDE", "laudo de X", "laudo de X") == "laudo de X"


GOOD = [
    ("CONTATO", "maria.silva@gov.br"),
    ("CONTATO", "(61) 99999-8888"),
    ("DATA_NASC", "01/02/1990"),
    ("DOC_PESSOAL", "529.982.247-25"),
    ("DOC_PROFISSIONAL", "CRM-DF 12345"),
    ("ID_PROCESSUAL", "123456/2023"),
    ("ID_PROCESSUAL", "85-SES/DF"),
    ("ID_VEICULO", "ABC-1234"),
    ("ID_VEICULO", "ABC1D23"),
    ("DOC_EMPRESA", "25.598.301/0001-68"),
    ("DOC_EMPRESA", "110.042.490.114"),
    ("DADO_FINANCEIRO", "44921-X"),
    ("DADO_FINANCEIRO", "pix@banco.com"),
    ("ORG_JURIDICA", "Secretaria de Estado de Saúde"),
    ("ORG_JURIDICA", "Detran"),
    ("ORG_JURIDICA", "CGU"),
    ("ORG_JURIDICA", "5ª DP"),
    ("ENDERECO", "Rua das Flores, 123"),
    ("ENDERECO", "SQN 410 Bloco A apto 101"),
    ("DADO_SAUDE", "laudo de epilepsia"),
    ("NOME_PESSOA", "Maria Clara Santos"),
    ("QUASI_IDENTIFICADOR", "motorista da linha 805.6 às 07h15"),
]

BAD = [
    ("CONTATO", "maria @x.com"),          # whitespace in email
    ("CONTATO", "maria@x"),               # no domain dot
    ("CONTATO", "maria@x.com."),          # trailing punctuation
    ("CONTATO", "1234567"),               # phone < 8 digits
    ("DATA_NASC", "primeiro de maio"),    # no numeric date
    ("DOC_PESSOAL", "CPF"),               # type only, no id
    ("DOC_PESSOAL", "cpf: 12345678901"),  # label prefix
    ("DOC_PROFISSIONAL", "OAB"),          # < 3 digits
    ("ID_PROCESSUAL", "Processo 123456"), # verbose prefix
    ("ID_VEICULO", "carro azul"),
    ("DOC_EMPRESA", "CNPJ 123"),          # letters + few digits
    ("DOC_EMPRESA", "12 345 678"),        # whitespace
    ("DADO_FINANCEIRO", "Agência 0850"),  # verbose prefix
    ("ORG_JURIDICA", "URGENTE"),          # boilerplate
    ("ORG_JURIDICA", "GPS"),              # acronym denylist
    ("ORG_JURIDICA", "SILVA"),            # surname denylist
    ("ORG_JURIDICA", "25.598.301/0001-68"),  # CNPJ
    ("ORG_JURIDICA", "Secretário de Estado"),  # job title
    ("ENDERECO", "Rua das Flores"),       # no number
    ("ENDERECO", "casa 123"),             # no marker
    ("DADO_SAUDE", "laudo"),              # generic standalone
    ("NOME_PESSOA", "Maria 123"),         # digits
    ("QUASI_IDENTIFICADOR", "o motorista"),  # < 3 words
]


@pytest.mark.parametrize("typ,value", GOOD)
def test_validate_accepts(typ, value):
    assert validate_value(typ, value) is None, (typ, value)


@pytest.mark.parametrize("typ,value", BAD)
def test_validate_rejects(typ, value):
    assert validate_value(typ, value) is not None, (typ, value)


def test_validate_generic_rules():
    assert validate_value("CONTATO", " padded ") is not None
    assert validate_value("CONTATO", "a\nb") is not None
    assert validate_value("CONTATO", "x" * 221) is not None
    assert validate_value("WHATEVER", "x") is not None
