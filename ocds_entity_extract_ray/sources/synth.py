"""Deterministic synthetic corpus (FIXTURES.md F1-F4).

Every artifact is a pure function of (seed, index): the same seed produces
identical bytes on any machine, any process, any parallelism — required
because the generator runs sharded inside Ray tasks and the oracle must see
the exact same records. No wall clock, no global RNG.

Two materializations of the same record stream:
- ``ocds_records``: struct-typed Parquet mirroring the reference's input
  (SURVEY §1.1; /root/reference/index.js:85-86);
- ``pages``: Common-Crawl-style web pages (url, warc_ts, html, text, lang)
  per BASELINE.json input_hint, where the html embeds the record as an
  application/ld+json block (the structured-data extraction path) plus
  rendered visible text.

Entity-name choice is Zipf-skewed so head entities exercise the combiner's
skew handling (SURVEY §4 / §7.4.3).
"""

from __future__ import annotations

import datetime
import json
import random

import pyarrow as pa

SEED = 42

# --- pools (fixed, derived from the reference's geographic tables) -----------

_MX_STATES = [
    ("Jalisco", ["Guadalajara", "Zapopan", "Tlaquepaque"]),
    ("Nuevo León", ["Monterrey", "San Pedro Garza García"]),
    ("Ciudad de México", ["Benito Juárez", "Coyoacán", "Tlalpan"]),
    ("Estado de México", ["Toluca", "Naucalpan"]),
    ("Veracruz", ["Xalapa", "Veracruz"]),
    ("Puebla", ["Puebla", "Cholula"]),
    ("Coahuila", ["Saltillo", "Torreón"]),
    ("Michoacán", ["Morelia", "Uruapan"]),
    ("Yucatán", ["Mérida", "Valladolid"]),
    ("Sonora", ["Hermosillo", "Nogales"]),
]

_FOREIGN = [("US", None), ("ES", None), ("Estados Unidos", None), ("España", None), ("CO", None)]

_INST_STEMS = [
    "Secretaría de Salud", "Instituto Mexicano del Seguro Social",
    "Secretaría de Educación Pública", "Hospital General", "Universidad Autónoma",
    "Comisión Federal de Electricidad", "Instituto Nacional Electoral",
    "Secretaría de Hacienda", "Ayuntamiento", "Servicios de Salud",
    "Instituto de Transparencia", "Secretaría de Obras Públicas",
    "Dirección de Adquisiciones", "Centro Médico Nacional", "Colegio de Bachilleres",
]

_COMPANY_STEMS = [
    "COMERCIALIZADORA DEL NORTE", "DISTRIBUIDORA MEDICA OMEGA",
    "CONSTRUCTORA DEL VALLE", "LABORATORIOS DELTA", "GRUPO FARMACEUTICO AZTECA",
    "SERVICIOS INTEGRALES DEL GOLFO", "TECNOLOGIAS AVANZADAS DEL SUR",
    "SUMINISTROS HOSPITALARIOS MX", "EQUIPOS Y MATERIALES DEL CENTRO",
    "OPERADORA LOGISTICA DEL PACIFICO",
]
_COMPANY_SUFFIXES = ["S.A. DE C.V.", "S. DE R.L. DE C.V.", "S.A.P.I. DE C.V.", "S.A."]

_FIRST_NAMES = ["JUAN", "MARIA", "JOSE", "ANA", "LUIS", "CARMEN", "PEDRO", "LUCIA",
                "MIGUEL", "SOFIA", "JORGE", "ELENA"]
_LAST_NAMES = ["PEREZ", "GARCIA", "LOPEZ", "HERNANDEZ", "MARTINEZ", "RODRIGUEZ",
               "SANCHEZ", "RAMIREZ", "TORRES", "FLORES", "MORALES", "ORTIZ"]

_PRODUCT_WORDS = ["PARACETAMOL", "GASA ESTERIL", "JERINGA", "GUANTES DE NITRILO",
                  "SOLUCION SALINA", "IBUPROFENO", "CATETER", "VENDA ELASTICA",
                  "ALCOHOL ETILICO", "MASCARILLA QUIRURGICA", "SUTURA", "TERMOMETRO"]

N_INSTITUTIONS = 120
N_PARENTS = 15
N_COMPANIES = 200
N_PERSONS = 150
N_CONTACTS = 60
N_PRODUCTS = 100
N_CONFLICTS = 6  # ids sighted as both company and institution (A6 cases)


def _zipf_index(rng: random.Random, n: int, alpha: float = 1.2) -> int:
    """Zipf-skewed index in [0, n): head entities get most sightings."""
    while True:
        k = int(rng.paretovariate(alpha)) - 1
        if k < n:
            return k


def _institution(idx: int) -> dict:
    rng = random.Random(f"{SEED}:inst:{idx}")
    stem = _INST_STEMS[idx % len(_INST_STEMS)]
    state, cities = _MX_STATES[idx % len(_MX_STATES)]
    name = f"{stem} de {state}" if idx >= len(_INST_STEMS) else stem
    gov_level = rng.choice(["city", "region", "country", None])
    return {
        "id": f"inst-{idx:04d}",
        "name": name,
        "initials": "".join(w[0] for w in name.split()[:4]).upper(),
        "state": state,
        "locality": cities[idx % len(cities)],
        "govLevel": gov_level,
        "parent_idx": (idx % N_PARENTS) if rng.random() < 0.6 else None,
        "contact_idx": (idx % N_CONTACTS) if rng.random() < 0.5 else None,
        "classification": rng.choice([None, "dependencia-federal", "organismo-autonomo"]),
    }


def _parent(idx: int) -> dict:
    stem = _INST_STEMS[idx % len(_INST_STEMS)]
    return {"id": f"parent-{idx:03d}", "name": f"{stem} Federal", "initials": f"PF{idx}"}


def _company(idx: int) -> dict:
    rng = random.Random(f"{SEED}:comp:{idx}")
    stem = _COMPANY_STEMS[idx % len(_COMPANY_STEMS)]
    suffix = _COMPANY_SUFFIXES[idx % len(_COMPANY_SUFFIXES)]
    name = f"{stem} {idx // len(_COMPANY_STEMS)} {suffix}" if idx >= len(_COMPANY_STEMS) else f"{stem} {suffix}"
    country = _FOREIGN[idx % len(_FOREIGN)][0] if rng.random() < 0.1 else None
    return {
        "id": f"comp-{idx:04d}",
        "name": name,
        "rfc": f"RFC{idx:06d}XX",
        "country": country,
        "details_type": "company" if rng.random() < 0.5 else None,
    }


def _person(idx: int) -> dict:
    rng = random.Random(f"{SEED}:pers:{idx}")
    name = f"{_FIRST_NAMES[idx % len(_FIRST_NAMES)]} {_LAST_NAMES[(idx * 7) % len(_LAST_NAMES)]} {_LAST_NAMES[(idx * 13 + 5) % len(_LAST_NAMES)]}"
    return {"id": f"pers-{idx:04d}", "name": name,
            "curp": f"CURP{idx:06d}" if rng.random() < 0.7 else None}


def _contact(idx: int) -> dict:
    name = f"{_FIRST_NAMES[(idx * 3) % len(_FIRST_NAMES)]} {_LAST_NAMES[(idx * 5) % len(_LAST_NAMES)]}"
    return {"id": f"func-{idx:04d}", "name": name}


@__import__("functools").lru_cache(maxsize=1)
def _catalog_cached() -> tuple:
    return tuple(_build_product_catalog())


def product_catalog() -> list[dict]:
    """FIXTURES F3: the broadcast cbmei-style product index."""
    return [dict(p) for p in _catalog_cached()]


def _build_product_catalog() -> list[dict]:
    out = []
    for idx in range(N_PRODUCTS):
        word = _PRODUCT_WORDS[idx % len(_PRODUCT_WORDS)]
        out.append(
            {
                "id": f"{idx % 9 + 1:03d}.{idx % 7:03d}.{idx:04d}.{idx % 89:02d}",
                "name": word,
                "description": f"{word} GRADO MEDICO PRESENTACION {idx}",
                "source": [{"id": "cbmei"}],
            }
        )
    return out


def product_index() -> dict:
    return {p["id"]: p for p in product_catalog()}


def classifier_csv() -> str:
    """FIXTURES F4: override list — a few names forced to a class."""
    rows = []
    for idx in range(0, 10):
        rows.append(f'"{_company(idx)["name"]}",company')
    for idx in range(0, 10):
        rows.append(f'"{_person(idx)["name"]}",person')
    return "\n".join(rows) + "\n"


def record_order_key(i: int) -> str:
    return f"ocds-{i:09d}"


def make_record(i: int) -> dict:
    """Pure function of the record index: one OCDS-style record."""
    rng = random.Random(f"{SEED}:rec:{i}")
    ocid = record_order_key(i)
    is_purchase = rng.random() < 0.45
    source = [{"id": "comprasimss" if is_purchase else "contratacionesabiertas"}]

    inst = _institution(_zipf_index(rng, N_INSTITUTIONS))
    conflict = rng.random() < (N_CONFLICTS / 1000.0)

    buyer_party: dict = {
        "id": inst["id"],
        "name": inst["name"],
        "roles": ["buyer"],
        "details": {"type": "institution"},
        "identifier": {"id": f"MX-INAI-{inst['id']}", "scheme": "MX-INAI"},
    }
    if inst["classification"] is not None and rng.random() < 0.5:
        buyer_party["details"]["classification"] = inst["classification"]
    if inst["govLevel"] is not None:
        buyer_party["details"]["govLevel"] = inst["govLevel"]
        buyer_party["address"] = {
            "countryName": "México",
            "region": inst["state"],
            "locality": inst["locality"],
        }
    elif rng.random() < 0.5:
        buyer_party["address"] = {"countryName": "México", "region": inst["state"]}
    if rng.random() < 0.3:
        buyer_party["initials"] = inst["initials"]
    if inst["parent_idx"] is not None:
        par = _parent(inst["parent_idx"])
        buyer_party["memberOf"] = [
            {"id": par["id"], "name": par["name"], "initials": par["initials"]}
        ]
    if inst["contact_idx"] is not None:
        c = _contact(inst["contact_idx"])
        buyer_party["contactPoint"] = {"id": c["id"], "name": c["name"]}

    # corner-case variants exercising less-traveled reference paths
    # (SURVEY §1.1 dynamic-schema corners; deterministic by index)
    corner = i % 41
    if corner == 0 and buyer_party.get("details", {}).get("govLevel"):
        # top-level govLevel wins over details.govLevel (extract.js:415)
        buyer_party["govLevel"] = buyer_party["details"].pop("govLevel")
    elif corner == 1:
        # memberOf pointing at the party itself -> parent skipped (extract.js:334)
        buyer_party["memberOf"] = [{"id": inst["id"], "name": inst["name"]}]
    elif corner == 2:
        # memberOf with empty id -> parent skipped (extract.js:334)
        buyer_party["memberOf"] = [{"id": "", "name": "Sin Padre"}]
    elif corner == 3:
        # address-driven areas WITHOUT govLevel incl. locality (extract.js:940-981)
        buyer_party["details"].pop("govLevel", None)
        buyer_party["address"] = {
            "countryName": "México",
            "region": inst["state"],
            "locality": inst["locality"],
        }
    elif corner == 4 and buyer_party.get("details", {}).get("govLevel"):
        # non-MX institution with govLevel region -> slugged region id path
        buyer_party["details"]["govLevel"] = "region"
        buyer_party["address"] = {"countryName": "US", "region": "New Mexico"}
    elif corner == 5:
        # funder-first role on the buyer -> subclass 'banco' + funder counters
        buyer_party["roles"] = ["funder", "buyer"]

    parties = [buyer_party]
    supplier_ids = []
    n_sup = rng.randint(1, 3)
    for _ in range(n_sup):
        if rng.random() < 0.7:
            comp = _company(_zipf_index(rng, N_COMPANIES))
            sp: dict = {
                "id": comp["id"],
                "name": comp["name"],
                "roles": ["supplier"],
                "details": {},
                "identifier": {"id": comp["rfc"], "scheme": "MX-RFC"},
            }
            if comp["details_type"] is not None:
                sp["details"]["type"] = comp["details_type"]
            if comp["country"] is not None:
                sp["address"] = {"countryName": comp["country"]}
            if rng.random() < 0.2:
                sp["additionalIdentifiers"] = [
                    {"id": f"ALT-{comp['id']}", "scheme": "MX-ALT"}
                ]
        else:
            pers = _person(_zipf_index(rng, N_PERSONS))
            sp = {
                "id": pers["id"],
                "name": pers["name"],
                "roles": ["supplier"],
                "details": {},
            }
            if pers["curp"] is not None:
                sp["identifier"] = {"id": pers["curp"], "scheme": "MX-CURP"}
        parties.append(sp)
        supplier_ids.append(sp["id"])

    if conflict:
        # A6: an id previously used as a company appears as an institution
        comp = _company(_zipf_index(rng, N_COMPANIES))
        parties.append(
            {
                "id": comp["id"],
                "name": comp["name"],
                "roles": ["buyer"],
                "details": {"type": "institution"},
            }
        )

    if rng.random() < 0.15:
        funder = _institution(_zipf_index(rng, N_INSTITUTIONS))
        parties.append(
            {
                "id": "fund-" + funder["id"],
                "name": "Banco " + funder["name"],
                "roles": ["funder"],
                "details": {"type": "institution"},
            }
        )

    base_day = datetime.date(2017, 1, 1) + datetime.timedelta(days=i % 1400)
    contracts = []
    n_con = rng.randint(1, 2)
    catalog = _catalog_cached()  # built once per process, read-only here
    for ci in range(n_con):
        contract: dict = {
            "id": f"{ocid}-con-{ci}",
            "value": {"amount": round(rng.uniform(1e4, 5e6), 2)},
            "period": {"startDate": f"{base_day.isoformat()}T00:00:00Z"},
        }
        if is_purchase:
            contract_items = []
            for _ in range(rng.randint(1, 4)):
                prod = catalog[_zipf_index(rng, N_PRODUCTS)]
                raw_id = prod["id"] if rng.random() < 0.6 else prod["id"].replace(".", "") + "00"
                qty = float(rng.randint(1, 500))
                unit_amount = round(rng.uniform(5, 2000), 2)
                over = round(rng.uniform(-50, 150), 2) if rng.random() < 0.4 else 0
                contract_items.append(
                    {
                        "id": raw_id,
                        "description": prod["description"],
                        "quantity": qty,
                        "valueMxIMSS": round(unit_amount * qty, 2),
                        "classification": {"description": prod["name"]},
                        "unit": {
                            "value": {
                                "amount": unit_amount,
                                "amountOverpriceMxIMSS": over,
                                "valueAverageMxIMSS": round(unit_amount * rng.uniform(0.8, 1.2), 2),
                            }
                        },
                    }
                )
            contract["items"] = contract_items
        contracts.append(contract)

    awards = []
    if not is_purchase:
        for sid in supplier_ids:
            awards.append(
                {
                    "value": {"amount": round(rng.uniform(1e4, 2e6), 2)},
                    "suppliers": [{"id": sid}],
                }
            )

    release_date = f"{base_day.isoformat()}T12:00:00Z"
    release_contracts = [
        {"id": c["id"], **({"items": c["items"]} if "items" in c else {})}
        for c in contracts
    ]
    releases = [
        {
            "date": release_date,
            "parties": parties,
            "contracts": release_contracts,
            "source": source,
            "sourceRun": [{"id": f"run-{i % 20:03d}"}],
        }
    ]
    if corner == 6:
        # a second, EARLIER release carrying only the buyer (first-seen date
        # min, extract.js:271-290) plus an extra source for the union paths
        earlier = (base_day - datetime.timedelta(days=30)).isoformat()
        releases.insert(
            0,
            {
                "date": f"{earlier}T09:00:00Z",
                "parties": [buyer_party],
                "contracts": [],
                "source": source + [{"id": "portal-alterno"}],
                "sourceRun": [{"id": f"run-alt-{i % 7}"}],
            },
        )
    elif corner == 7:
        # a release WITHOUT a date (mergeDates null-skip divergence, SURVEY §7.4)
        releases.append(
            {
                "parties": [buyer_party],
                "contracts": [],
                "source": source,
                "sourceRun": [{"id": "run-undated"}],
            }
        )

    cr: dict = {"ocid": ocid, "source": source, "parties": parties, "contracts": contracts}
    if awards:
        cr["awards"] = awards
    return {"ocid": ocid, "compiledRelease": cr, "releases": releases}


# --- page rendering (input_hint shape) ---------------------------------------

_PAGE_TEMPLATE = """<!DOCTYPE html>
<html lang="{lang}"><head>
<meta charset="utf-8">
<title>Contrataci&oacute;n {ocid}</title>
<style>body {{ font-family: sans-serif; }}</style>
<script type="application/ld+json">{jsonld}</script>
</head><body>
<!-- crawl snapshot -->
<h1>Proceso de contrataci&oacute;n {ocid}</h1>
<p>Comprador: <b>{buyer}</b></p>
<ul>{supplier_lis}</ul>
<p>Monto total: {amount} MXN &mdash; fecha {date}</p>
<script>var tracker = "ignored";</script>
</body></html>"""


def render_page(i: int, record: dict) -> dict:
    """Record -> Common-Crawl-style page row. html embeds the record as
    JSON-LD; ``text`` is left empty — the pipeline recomputes it from html
    (byte-identity invariant, FIXTURES F1)."""
    cr = record["compiledRelease"]
    rng = random.Random(f"{SEED}:page:{i}")
    buyer = cr["parties"][0]["name"]
    suppliers = [p["name"] for p in cr["parties"][1:] if "supplier" in (p.get("roles") or [])]
    amount = sum((c.get("value") or {}).get("amount", 0) for c in cr.get("contracts") or [])
    lang = "es" if rng.random() < 0.9 else "en"
    html = _PAGE_TEMPLATE.format(
        lang=lang,
        ocid=record["ocid"],
        jsonld=json.dumps(record, ensure_ascii=False, sort_keys=True),
        buyer=buyer,
        supplier_lis="".join(f"<li>Proveedor: {s}</li>" for s in suppliers),
        amount=f"{amount:.2f}",
        date=record["releases"][0]["date"],
    )
    ts = datetime.datetime(2021, 1, 1) + datetime.timedelta(seconds=i * 37 % 31_536_000)
    return {
        "url": f"https://contrataciones.example.mx/{record['ocid']}",
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": "",
        "lang": lang,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_batch(lo: int, hi: int) -> pa.Table:
    rows = [render_page(i, make_record(i)) for i in range(lo, hi)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def records_struct_batch(lo: int, hi: int) -> pa.Table:
    """FIXTURES F2 struct-typed materialization: fully nested Arrow schema
    (nullable everywhere); absent dict fields become struct nulls and are
    restored by ocds_schema.strip_nones on read."""
    from .ocds_schema import OCDS_RECORDS_SCHEMA

    rows = [make_record(i) for i in range(lo, hi)]
    return pa.Table.from_pylist(rows, schema=OCDS_RECORDS_SCHEMA)


def records_json_batch(lo: int, hi: int) -> pa.Table:
    """ocds_records materialization: (ocid, record_json). JSON (not deep
    structs) keeps absent-vs-null semantics identical to the reference's
    dynamic documents (SURVEY §1.1 'every access is guarded')."""
    rows = []
    for i in range(lo, hi):
        rec = make_record(i)
        rows.append({"ocid": rec["ocid"], "record_json": json.dumps(rec, ensure_ascii=False, sort_keys=True)})
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("ocid", pa.string()), ("record_json", pa.string())])
    )
