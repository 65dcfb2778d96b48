"""Entity-label taxonomy, value sanitization and value-format validation.

Re-expresses the semantics of the reference taxonomy module
(``/root/reference/ner_labels.py``):

* 13-type taxonomy with stable ordering   (ner_labels.py:198-276,359)
* PII subset excludes ORG_JURIDICA / DOC_EMPRESA (ner_labels.py:361-363)
* type-priority map for conflict resolution     (ner_labels.py:368-382)
* prefix-strip sanitization, idempotent         (ner_labels.py:91-192)
* per-type value-format validation predicates   (ner_labels.py:437-701)

All rules are data-driven tables + small predicates; no reference code is
copied — the tables are the *behavior* being matched.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Taxonomy (ner_labels.py:198-276,359-363).  Order is load-bearing: it fixes
# the BIO label-id space shared by training and decoding.
# ---------------------------------------------------------------------------

ENTITY_TYPES: tuple[str, ...] = (
    "NOME_PESSOA",
    "DOC_PESSOAL",
    "DATA_NASC",
    "CONTATO",
    "ENDERECO",
    "DOC_PROFISSIONAL",
    "ID_PROCESSUAL",
    "ID_VEICULO",
    "ORG_JURIDICA",
    "DADO_SAUDE",
    "DADO_FINANCEIRO",
    "DOC_EMPRESA",
    "QUASI_IDENTIFICADOR",
)

NON_PII_TYPES: tuple[str, ...] = ("ORG_JURIDICA", "DOC_EMPRESA")
PII_TYPES: tuple[str, ...] = tuple(t for t in ENTITY_TYPES if t not in NON_PII_TYPES)

# Lower number = higher priority when one literal value carries several types
# (ner_labels.py:368-382).
TYPE_PRIORITY: dict[str, int] = {
    "DOC_PESSOAL": 0,
    "DOC_PROFISSIONAL": 1,
    "DOC_EMPRESA": 2,
    "CONTATO": 3,
    "DATA_NASC": 4,
    "ENDERECO": 5,
    "NOME_PESSOA": 6,
    "DADO_FINANCEIRO": 7,
    "ID_PROCESSUAL": 8,
    "ID_VEICULO": 9,
    "DADO_SAUDE": 10,
    "ORG_JURIDICA": 11,
    "QUASI_IDENTIFICADOR": 12,
}

assert set(TYPE_PRIORITY) == set(ENTITY_TYPES)


def bio_label_space() -> list[str]:
    """``["O", "B-T1", "I-T1", ...]`` — 27 classes (decoding.py:29-38)."""
    out = ["O"]
    for t in ENTITY_TYPES:
        out.append(f"B-{t}")
        out.append(f"I-{t}")
    return out


def label_maps() -> tuple[dict[str, int], dict[int, str]]:
    space = bio_label_space()
    l2i = {lab: i for i, lab in enumerate(space)}
    return l2i, {i: lab for lab, i in l2i.items()}


# ---------------------------------------------------------------------------
# Value sanitization: strip descriptive label prefixes ("CPF:", "SEI nº", …)
# while requiring the result to remain a literal substring of the text
# (ner_labels.py:91-192).
# ---------------------------------------------------------------------------

def _rx(*pats: str) -> list[re.Pattern[str]]:
    return [re.compile(p, re.IGNORECASE) for p in pats]


STRIP_PREFIXES: dict[str, list[re.Pattern[str]]] = {
    "ID_PROCESSUAL": _rx(
        r"^processo(?:\s+sei)?(?:\s+n[º°.]*)?\s*",
        r"^sei(?:\s+n[º°.]*)?\s*",
        r"^protocolo(?:\s+n[º°.]*)?\s*",
        r"^edital(?:\s+n[º°.]*)?\s*",
        r"^portaria(?:\s+n[º°.]*)?\s*",
        r"^boletim(?:\s+de\s+ocorrência)?(?:\s+n[º°.]*)?\s*",
        r"^auto(?:\s+de\s+infração)?(?:\s+n[º°.]*)?\s*",
        r"^matrícula(?:\s+n[º°.]*)?\s*",
        r"^inscrição(?:\s+imobiliária)?(?:\s+n[º°.]*)?\s*",
        r"^n[º°.]+\s*",
    ),
    "DOC_PROFISSIONAL": _rx(
        r"^matrícula(?:\s+n[º°.]*)?\s*",
        r"^mat\.?\s*",
        r"^rgp(?:\s+n[º°.]*)?\s*",
        r"^registro(?:\s+profissional)?(?:\s+n[º°.]*)?\s*",
        r"^inscrição(?:\s+n[º°.]*)?\s*",
    ),
    "DADO_FINANCEIRO": _rx(
        r"^agência\s*",
        r"^agencia\s*",
        r"^ag\.\s*",
        r"^conta(?:\s+corrente|\s+poupança)?(?:\s+n[º°.]*)?\s*",
        r"^chave(?:\s+pix)?(?::)?\s*",
        r"^pix(?::)?\s*",
        r"^banco(?:\s+do\s+brasil|\s+itaú)?\s+(?:agência|ag\.?)\s*",
    ),
    "ID_VEICULO": _rx(r"^placa(?::)?\s*", r"^renavam(?::)?\s*", r"^chassi(?::)?\s*"),
    "DOC_PESSOAL": _rx(
        r"^cpf(?::)?\s*",
        r"^rg(?::)?\s*",
        r"^cnh(?::)?\s*",
        r"^título(?:\s+de\s+eleitor)?(?::)?\s*",
    ),
    "DOC_EMPRESA": _rx(
        r"^cnpj(?::)?\s*",
        r"^inscri[cç][aã]o\s+estadual(?::)?\s*",
        r"^inscri[cç][aã]o\s+municipal(?::)?\s*",
        r"^i[.\s-]*e[.\s-]*(?::)?\s*",
        r"^i[.\s-]*m[.\s-]*(?::)?\s*",
        r"^isento(?::)?\s*",
    ),
    "CONTATO": _rx(
        r"^tel(?:efone)?(?::)?\s*",
        r"^cel(?:ular)?(?::)?\s*",
        r"^e-?mail(?::)?\s*",
        r"^whatsapp(?::)?\s*",
    ),
    "ORG_JURIDICA": _rx(
        r"^raz[aã]o\s+social(?::)?\s*",
        r"^empresa(?::)?\s*",
        r"^órg[aã]o(?::)?\s*",
        r"^org[aã]o(?::)?\s*",
    ),
}


def sanitize_value(entity_type: str, value: str, text: str) -> str:
    """Iteratively strip label prefixes; keep only if result stays in ``text``.

    Idempotent; returns the original value when stripping would leave a value
    that is empty or no longer a literal substring (ner_labels.py:154-192).
    """
    pats = STRIP_PREFIXES.get(entity_type)
    if not pats:
        return value
    cur = value
    progressed = True
    while progressed:
        progressed = False
        for p in pats:
            nxt = p.sub("", cur)
            if nxt != cur:
                cur = nxt
                progressed = True
        trimmed = cur.strip(" :.-,")
        if trimmed != cur:
            cur = trimmed
            progressed = True
    if cur and cur != value and cur in text:
        return cur
    return value


# ---------------------------------------------------------------------------
# Value-format validation (ner_labels.py:437-701).  validate_value returns an
# error string (None == valid) instead of raising, so it can be applied
# vectorized over Arrow batches and routed to a quarantine column.
# ---------------------------------------------------------------------------

CNPJ_SHAPE = re.compile(r"^\d{2}\.?\d{3}\.?\d{3}/?\d{4}-?\d{2}$")

ORG_ACRONYM_DENY = {
    "gps", "pdf", "csv", "cid", "ppp", "ctps", "ipva", "gta", "sei", "sisreg",
}
ORG_SURNAME_DENY = {
    "silva", "souza", "sousa", "oliveira", "santos", "pereira", "ferreira",
    "rodrigues", "albuquerque", "alencar", "viana", "meireles", "mendonça",
    "mendonca", "camargo", "holanda", "arruda", "castro", "medeiros",
    "magalhães", "magalhaes",
}
ORG_GENERIC_DENY = {
    "urgente", "obrigado", "obrigada", "desde", "muito", "preciso", "quero",
    "saber", "solicito", "detalhadas", "reforma", "portal", "transporte",
    "animais", "profissionais", "pagamento", "deste", "regional",
}

_DATE_SHAPE = re.compile(r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b")
_PLATE_OLD = re.compile(r"[A-Z]{3}-?\d{4}")
_PLATE_MERCOSUL = re.compile(r"[A-Z]{3}-?\d[A-Z]\d{2}")
_IDISH = re.compile(r"[0-9][0-9.\-/]{5,}")
_ORG_TITLE = re.compile(
    r"\b(secret[aá]rio|diretor|presidente|procurador|delegado|ju[ií]z|"
    r"desembargador|governador|prefeito|vereador|senador|deputado|ministro|"
    r"sr\.?|sra\.?|dr\.?|dra\.?|ilustr[ií]ssimo|ilustrissima|senhor|senhora)\b",
    re.IGNORECASE,
)
_ADDR_MARKER = re.compile(
    r"\b(rua|r\.|avenida|av\.|alameda|travessa|quadra|qd|q\.d\.|bloco|bl|lote|lt|"
    r"conjunto|conj|setor|cep|sqs|sqn|shdf|sh|crn|cln|l3|eixo|apto|apartamento|"
    r"estrada|rodovia|br-|mg-|sp-|go-|df-|pr-|rj-|ba-|rs-|sc-|mt-|ms-|pa-|am-|"
    r"ce-|pe-|ma-|fazenda|sítio|sitio|chácara|chacara|gleba|núcleo rural|"
    r"nucleo rural|assentamento|km)",
    re.IGNORECASE,
)


def _ndigits(s: str) -> int:
    return sum(c.isdigit() for c in s)


def _nletters(s: str) -> int:
    return sum(c.isalpha() for c in s)


def validate_value(entity_type: str, value: str) -> str | None:  # noqa: C901
    """Per-type accept/reject rule; returns an error message or None (valid)."""
    if entity_type not in ENTITY_TYPES:
        return f"unknown entity_type: {entity_type!r}"
    if not isinstance(value, str) or not value:
        return "value must be a non-empty string"
    if value != value.strip():
        return "value has leading/trailing whitespace"
    if "\n" in value or "\r" in value:
        return "value contains newline"
    if len(value) > 220:
        return "value too long"

    low = value.casefold()
    digits = _ndigits(value)
    letters = _nletters(value)

    if entity_type == "CONTATO":
        if "@" in value:
            if any(c.isspace() for c in value):
                return "email contains whitespace"
            if value.count("@") != 1:
                return "email must contain a single '@'"
            if "." not in value.rsplit("@", 1)[-1]:
                return "email missing domain dot"
            if value.endswith((".", ",", ";", ":", ")", "]")):
                return "email ends with punctuation"
            return None
        return None if digits >= 8 else "phone needs >= 8 digits"

    if entity_type == "DATA_NASC":
        return None if _DATE_SHAPE.search(value) else "needs numeric dd/mm/aaaa date"

    if entity_type == "ID_PROCESSUAL":
        bad = ("processo", "sei ", "sei-", "protocolo", "edital", "portaria",
               "boletim", "auto de", "matrícula", "inscrição", "nº ", "n° ", "n. ")
        if low.startswith(bad):
            return "starts with verbose prefix"
        structured = bool(re.search(r"[\-./]", value)) or letters >= 2
        if digits >= 4 or (digits >= 2 and structured):
            return None
        return "needs >=4 digits or >=2 digits with structure"

    if entity_type == "ID_VEICULO":
        v = value.strip()
        if _PLATE_OLD.fullmatch(v) or _PLATE_MERCOSUL.fullmatch(v):
            return None
        return None if digits in (9, 10, 11) else "not plate/RENAVAM shaped"

    if entity_type == "DOC_PROFISSIONAL":
        return None if digits >= 3 else "needs >= 3 digits"

    if entity_type == "DOC_EMPRESA":
        if digits < 6:
            return "needs >= 6 digits"
        if any(c.isspace() for c in value):
            return "must not contain whitespace"
        if letters > 0:
            return "must not contain letters"
        if CNPJ_SHAPE.fullmatch(value.strip()):
            return None
        return None if _IDISH.fullmatch(value.strip()) else "not identifier-shaped"

    if entity_type == "DADO_FINANCEIRO":
        bad = ("agência", "agencia", "ag.", "conta", "chave pix", "pix:", "pix ",
               "banco do brasil", "banco itaú")
        if low.startswith(bad):
            return "starts with verbose prefix"
        if "@" in value:
            return None
        seps = bool(re.search(r"[\-./]", value))
        if digits < 4 or (digits < 6 and not seps and letters == 0):
            return "needs >= 4 digits (identifier-like)"
        return None

    if entity_type == "DOC_PESSOAL":
        if digits < 4:
            return "needs an identifier (>= 4 digits)"
        if any(s in low for s in ("digital", "novo", "novos", "segunda via", "2a via", "2ª via")):
            return "contains issuance adjectives"
        if any(s in low for s in ("cpf:", "rg:", "cnh:", "pis:", "pasep:", "nit:")):
            return "contains label prefix"
        return None

    if entity_type == "ORG_JURIDICA":
        stripped = value.strip()
        low_s = stripped.casefold()
        if low_s in ORG_GENERIC_DENY:
            return "boilerplate token, not an org"
        if "cnpj" in low:
            return "contains 'CNPJ'; use DOC_EMPRESA"
        if CNPJ_SHAPE.fullmatch(stripped):
            return "is a CNPJ; use DOC_EMPRESA"
        if digits >= 6 and letters == 0:
            return "numeric identifier; use DOC_EMPRESA"
        if _ORG_TITLE.search(low):
            return "person job title/honorific"
        words = stripped.split()
        acronym = (stripped == stripped.upper() and letters >= 2
                   and len(stripped) <= 18 and " " not in stripped)
        if acronym:
            if low_s in ORG_ACRONYM_DENY:
                return "known non-org acronym"
            if low_s in ORG_SURNAME_DENY:
                return "common surname, likely person"
        if len(words) == 1 and letters >= 2:
            if low_s in ORG_ACRONYM_DENY:
                return "known non-org token"
            if low_s in ORG_SURNAME_DENY:
                return "common surname, likely person"
            return None
        multiword = len(words) >= 2 and letters >= 2
        numbered = bool(re.fullmatch(r"\d+[ªº]?\s*[A-Za-z]{2,}", stripped))
        if acronym or multiword or numbered:
            return None
        return "not a plausible org name/acronym"

    if entity_type == "ENDERECO":
        if digits == 0:
            return "needs a number/lote/CEP"
        return None if _ADDR_MARKER.search(low) else "missing address marker"

    if entity_type == "DADO_SAUDE":
        banned = {"laudo", "atestado", "prontuário", "prontuario"}
        return "too generic standalone" if low.strip() in banned else None

    if entity_type == "NOME_PESSOA":
        if digits > 0:
            return "must not contain digits"
        honorific = any(s in low for s in (" sr", " sra", " dr", " dra", "senhor", "senhora"))
        if honorific and len(value.split()) <= 2:
            return "honorific-only span"
        return None

    if entity_type == "QUASI_IDENTIFICADOR":
        if len(value.split()) < 3:
            return "needs function + context (>= 3 words)"
        return None if len(value) >= 15 else "needs >= 15 chars"

    return None
