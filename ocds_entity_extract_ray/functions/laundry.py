"""Deterministic name-normalization ("laundry") functions.

Re-implements, from observed call-site contracts only, the semantics the
reference pulls from its un-vendored ``company-laundry`` git dependency
(see /root/reference/package.json:17 and call sites in
/root/reference/lib/extract.js — e.g. ``isCompany`` at extract.js:28,
``companyType`` at extract.js:732, ``simpleName`` at extract.js:419,
``launder`` at extract.js:451, ``cleanCountry`` at extract.js:418).

All functions are pure and deterministic: same input bytes -> same output,
under any parallelism. They feed the canonical entity keys used by the
salted groupby-aggregate, so determinism here is a correctness requirement.
"""

from __future__ import annotations

import functools
import re
import unicodedata

_WS_RE = re.compile(r"\s+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")
_PUNCT_RE = re.compile(r"[\"'´`’.,;:()\[\]#*&/\\]+")


def remove_diacritics(s: str) -> str:
    """Strip combining marks (NFD decomposition), like the ``diacritics``
    npm package used at /root/reference/lib/extract.js:1."""
    return "".join(
        c for c in unicodedata.normalize("NFD", s) if not unicodedata.combining(c)
    )


@functools.lru_cache(maxsize=65536)
def simple_name(s: str | None) -> str:
    """Slugify: lowercase, diacritics removed, non-alphanumeric runs -> '-',
    trimmed. Contract of ``laundry.simpleName`` (extract.js:419,530,755,883)."""
    if s is None:
        return ""
    t = remove_diacritics(str(s)).lower()
    t = _NON_ALNUM_RE.sub("-", t).strip("-")
    return t


@functools.lru_cache(maxsize=65536)
def launder(s: str | None) -> str:
    """Canonical display normalization: uppercase, diacritics removed,
    punctuation stripped, whitespace collapsed.
    Contract of ``laundry.launder`` (extract.js:451,906,972)."""
    if s is None:
        return ""
    t = remove_diacritics(str(s)).upper()
    t = _PUNCT_RE.sub("", t)
    t = _WS_RE.sub(" ", t).strip()
    return t


# --- company legal-form detection -------------------------------------------
# Ordered: first match wins; patterns run on launder(name) (uppercased,
# punctuation stripped, whitespace collapsed).
_COMPANY_TYPE_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    (slug, re.compile(pat))
    for slug, pat in [
        ("sab-de-cv", r"\bS ?A ?B DE C ?V\b"),
        ("sapi-de-cv", r"\bS ?A ?P ?I DE C ?V\b"),
        ("sa-de-cv", r"\bS ?A DE C ?V\b"),
        ("s-de-rl-de-cv", r"\bS DE R ?L DE C ?V\b"),
        ("s-de-rl", r"\bS DE R ?L\b"),
        ("sc-de-rl", r"\bS ?C DE R ?L\b"),
        ("sas-de-cv", r"\bS ?A ?S DE C ?V\b"),
        ("sapi", r"\bS ?A ?P ?I\b"),
        ("sab", r"\bS ?A ?B\b"),
        ("sas", r"\bS ?A ?S\b"),
        ("sa", r"\bS ?A\b$"),
        ("sc", r"\bS ?C\b$"),
        ("ac", r"\bA ?C\b$"),
        ("scl", r"\bS ?C ?L\b$"),
        ("llc", r"\bL ?L ?C\b"),
        ("inc", r"\bINC\b"),
        ("ltd", r"\bLTD\b"),
        ("corp", r"\bCORP\b"),
        ("plc", r"\bPLC\b"),
        ("gmbh", r"\bGMBH\b"),
        ("srl", r"\bS ?R ?L\b"),
        ("spa", r"\bS ?P ?A\b$"),
        ("bv", r"\bB ?V\b$"),
        ("ag", r"\bA ?G\b$"),
    ]
]

# Spanish/English sector words that mark an organization name even without a
# legal suffix (heuristic arm of ``laundry.isCompany``).
_COMPANY_KEYWORDS = {
    "COMPANY", "CORPORATION", "GRUPO", "GROUP", "CONSTRUCTORA", "CONSTRUCCIONES",
    "COMERCIALIZADORA", "DISTRIBUIDORA", "SERVICIOS", "LABORATORIOS",
    "FARMACEUTICA", "FARMACIA", "INDUSTRIAS", "INDUSTRIAL", "TECNOLOGIA",
    "TECNOLOGIAS", "SISTEMAS", "SOLUCIONES", "CONSULTORES", "CONSULTORIA",
    "INGENIERIA", "EDITORIAL", "TRANSPORTES", "MATERIALES", "EQUIPOS",
    "SUMINISTROS", "PROVEEDORA", "OPERADORA", "INMOBILIARIA", "PRODUCTOS",
    "MEDICA", "MEDICOS", "HOSPITALARIA", "QUIMICA", "ELECTRICA", "LIMITADA",
}


@functools.lru_cache(maxsize=65536)
def company_type(name: str | None) -> str:
    """Legal-form slug of a company name, '' if none.
    Contract of ``laundry.companyType`` (extract.js:732): non-empty result
    becomes the company's ``subclassification``."""
    if not name:
        return ""
    t = launder(name)
    for slug, pat in _COMPANY_TYPE_PATTERNS:
        if pat.search(t):
            return slug
    return ""


@functools.lru_cache(maxsize=65536)
def is_company(name: str | None) -> bool:
    """Heuristic company-vs-person classifier, fallback arm of the
    classification cascade (extract.js:28). True iff the name carries a legal
    suffix or a sector keyword."""
    if not name:
        return False
    if company_type(name) != "":
        return True
    toks = set(launder(name).split(" "))
    return bool(toks & _COMPANY_KEYWORDS)


# --- country cleaning -------------------------------------------------------
# Name/variant -> ISO-3166-1 alpha-2, keyed by simple_name of the variant.
_COUNTRY_TO_ISO2 = {
    "mexico": "MX", "estados-unidos-mexicanos": "MX",
    "estados-unidos": "US", "united-states": "US",
    "estados-unidos-de-america": "US", "united-states-of-america": "US", "usa": "US",
    "espana": "ES", "spain": "ES",
    "canada": "CA", "brasil": "BR", "brazil": "BR",
    "argentina": "AR", "chile": "CL", "colombia": "CO", "peru": "PE",
    "guatemala": "GT", "costa-rica": "CR", "panama": "PA", "cuba": "CU",
    "el-salvador": "SV", "uruguay": "UY", "venezuela": "VE", "ecuador": "EC",
    "republica-dominicana": "DO", "puerto-rico": "PR",
    "francia": "FR", "france": "FR", "alemania": "DE", "germany": "DE",
    "reino-unido": "GB", "united-kingdom": "GB", "gran-bretana": "GB",
    "italia": "IT", "italy": "IT", "japon": "JP", "japan": "JP",
    "china": "CN", "india": "IN", "corea": "KR", "republica-de-corea": "KR",
    "paises-bajos": "NL", "netherlands": "NL", "holanda": "NL",
    "suiza": "CH", "switzerland": "CH", "suecia": "SE", "sweden": "SE",
    "belgica": "BE", "belgium": "BE", "austria": "AT", "portugal": "PT",
    "dinamarca": "DK", "denmark": "DK", "noruega": "NO", "norway": "NO",
    "finlandia": "FI", "finland": "FI", "irlanda": "IE", "ireland": "IE",
    "polonia": "PL", "poland": "PL", "rusia": "RU", "russia": "RU",
    "israel": "IL", "turquia": "TR", "turkey": "TR", "australia": "AU",
    "nueva-zelanda": "NZ", "new-zealand": "NZ", "sudafrica": "ZA",
    "singapur": "SG", "singapore": "SG", "hong-kong": "HK", "taiwan": "TW",
}


@functools.lru_cache(maxsize=65536)
def clean_country(name: str | None) -> str:
    """Country name or variant -> ISO-2 code.
    Contract of ``laundry.cleanCountry`` (extract.js:418,529,754,899,944).
    A 2-char input is treated as an already-clean code (uppercased). Unknown
    longer names fall back to the trimmed uppercase input (deterministic,
    keeps distinct unknowns distinct)."""
    if not name:
        return ""
    t = str(name).strip()
    if len(t) == 2:
        return t.upper()
    iso = _COUNTRY_TO_ISO2.get(simple_name(t))
    return iso if iso is not None else t.upper()


def collapse_ws(s: str) -> str:
    """Whitespace collapse used when keying classifier-list names
    (/root/reference/lib/classify.js:19)."""
    return _WS_RE.sub(" ", s)
