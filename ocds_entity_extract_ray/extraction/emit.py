"""Per-record mention emission: the reference's extractEntities re-expressed
as a PURE function record -> list[state], with no global accumulator.

Each helper cites the reference logic it re-expresses (file:line into
/root/reference/). All cross-record behavior (create-if-absent, upsert
merges, first-writer-wins, dedup) moves into the state algebra
(extraction/state.py) + the downstream groupby; everything here is
intra-record (SURVEY.md §2.2 J3: provenance joins are intra-row, no
shuffle).

Sighting ordering: every emitted state carries sortkeys [order_key, seq]
where order_key is the record's stable id (url / ocid) and seq is the
emission index within the record. The sequential oracle iterates records
sorted by order_key, so "min sortkey" in the merged state equals the
reference's dict-insertion ("first seen") order deterministically.
"""

from __future__ import annotations

from ..functions.classify import classify_party
from ..functions.geo import (
    get_country_name,
    get_other_state_names,
    get_state_id,
)
from ..functions.laundry import clean_country, company_type, launder, simple_name
from ..functions.products import get_product_id, strip_dots
from .state import (
    add_set_member,
    add_sum,
    new_state,
    set_first,
    set_last,
    set_max,
    set_min,
)

# --- intra-record helpers (SURVEY §2.2 M5-M13) ------------------------------


def is_purchase(sources) -> bool:
    """Any source id == 'comprasimss' (extract.js:181-187)."""
    return any((s or {}).get("id") == "comprasimss" for s in (sources or []))


def get_party_sources(party: dict, releases) -> tuple[list, list]:
    """Union of release.source / release.sourceRun over releases containing
    the party, dedup by id, first-seen order (extract.js:657-688)."""
    sources: list = []
    source_runs: list = []
    seen_s: set = set()
    seen_r: set = set()
    pid = party.get("id")
    for release in releases or []:
        if any((rp or {}).get("id") == pid for rp in release.get("parties") or []):
            for source in release.get("source") or []:
                sid = (source or {}).get("id")
                if sid not in seen_s:
                    seen_s.add(sid)
                    sources.append(dict(source))  # full object (extract.js:670)
            for run in release.get("sourceRun") or []:
                rid = (run or {}).get("id")
                if rid not in seen_r:
                    seen_r.add(rid)
                    source_runs.append(dict(run))  # full object (extract.js:680)
    return sources, source_runs


def get_product_sources(product_id, releases) -> list:
    """Union of release.source over releases whose contract items contain the
    raw item id (extract.js:155-179)."""
    sources: list = []
    seen: set = set()
    for release in releases or []:
        hit = False
        for contract in release.get("contracts") or []:
            for item in contract.get("items") or []:
                if item.get("id") == product_id:
                    hit = True
        if hit:
            for source in release.get("source") or []:
                sid = (source or {}).get("id")
                if sid not in seen:
                    seen.add(sid)
                    sources.append(dict(source))  # full object (extract.js:169)
    return sources


def get_earliest_entity_date(entity_id, releases) -> str | None:
    """Min release.date over releases where the id matches a party, its
    memberOf[0] or its contactPoint (extract.js:271-290). Dates are uniform
    ISO-8601 strings, so lexicographic min == time min."""
    date = None
    for r in releases or []:
        rdate = r.get("date")
        if rdate is None:
            continue
        for p in r.get("parties") or []:
            member_of = p.get("memberOf")
            contact = p.get("contactPoint")
            if (
                p.get("id") == entity_id
                or (member_of and (member_of[0] or {}).get("id") == entity_id)
                or (contact and contact.get("id") == entity_id)
            ):
                if date is None or rdate < date:
                    date = rdate
    return date


def get_buyer_contracts(entity_id, releases) -> list:
    """Contract ids of releases in which the party appears (extract.js:610-619)."""
    out = []
    for release in releases or []:
        if any((p or {}).get("id") == entity_id for p in release.get("parties") or []):
            for contract in release.get("contracts") or []:
                out.append(contract.get("id"))
    return out


def get_supplier_contract_summary(entity_id, cr) -> tuple[int, float]:
    """Count + sum award.value.amount over awards naming the supplier
    (extract.js:1346-1362)."""
    count, amount = 0, 0.0
    for award in cr.get("awards") or []:
        for supplier in award.get("suppliers") or []:
            if supplier.get("id") == entity_id:
                count += 1
                amount += float(((award.get("value") or {}).get("amount")) or 0.0)
    return count, amount


def get_buyer_contract_summary(entity_id, contract_ids, cr) -> tuple[int, float]:
    """Count + sum contract.value.amount over buyer contracts (extract.js:1364-1378)."""
    count, amount = 0, 0.0
    cids = set(contract_ids)
    for contract in cr.get("contracts") or []:
        if contract.get("id") in cids:
            count += 1
            amount += float(((contract.get("value") or {}).get("amount")) or 0.0)
    return count, amount


def get_contract_item_summary(cr, item_keys: set) -> tuple[int, float]:
    """Purchase variant: count items matching extracted products by
    dot-stripped id; itemless contracts count whole (extract.js:1294-1317)."""
    count, amount = 0, 0.0
    for contract in cr.get("contracts") or []:
        items = contract.get("items")
        if items is not None:
            for item in items:
                if strip_dots(item.get("id")) in item_keys:
                    count += 1
                    amount += float(item.get("valueMxIMSS") or 0.0)
        else:
            count += 1
            amount += float(((contract.get("value") or {}).get("amount")) or 0.0)
    return count, amount


def get_buyer_contract_item_summary(cr, contract_ids, item_keys: set) -> tuple[int, float]:
    """Same, restricted to buyer contracts (extract.js:1319-1344)."""
    count, amount = 0, 0.0
    cids = set(contract_ids)
    for contract in cr.get("contracts") or []:
        if contract.get("id") not in cids:
            continue
        items = contract.get("items")
        if items is not None:
            for item in items:
                if strip_dots(item.get("id")) in item_keys:
                    count += 1
                    amount += float(item.get("valueMxIMSS") or 0.0)
        else:
            count += 1
            amount += float(((contract.get("value") or {}).get("amount")) or 0.0)
    return count, amount


def _source_ids(sources) -> list:
    """Creation-time snapshots keep the FULL source objects (the reference
    Object.assigns the collected objects onto the doc; only later
    mergeMetadata additions are stripped to {id}, extract.js:699)."""
    return [dict(s) if s else {} for s in sources or []]


# --- emission ---------------------------------------------------------------


class _Emitter:
    def __init__(self, order_key: str):
        self.order_key = order_key
        self.seq = 0
        self.states: list[dict] = []

    def sk(self, pre: int = 0) -> list:
        """Next sortkey; pre=-1 ranks just before the sighting (used for
        cbmei base sources, which the reference places before merged ones)."""
        self.seq += 1
        return [self.order_key, self.seq, pre]

    def emit(self, st: dict) -> None:
        self.states.append(st)


def emit_record(
    record: dict,
    order_key: str,
    classifier_list: dict | None,
    product_index: dict,
) -> list[dict]:
    """One record -> mergeable entity/membership/product states.

    record = {"compiledRelease": {...}, "releases": [...]} (SURVEY §1.1).
    """
    cr = record.get("compiledRelease") or {}
    releases = record.get("releases") or []
    em = _Emitter(order_key)

    item_keys = _emit_items(em, cr, releases, product_index)

    for party in cr.get("parties") or []:
        sources, source_runs = get_party_sources(party, releases)
        metadata = {"source": sources, "sourceRun": source_runs}
        cls = classify_party(party, classifier_list)
        if cls == "institution":
            _emit_institution(em, cr, releases, party, metadata, item_keys)
        elif cls == "company":
            _emit_company(em, cr, releases, party, metadata, item_keys)
        else:
            _emit_person(em, cr, releases, party, metadata, item_keys)

    return em.states


def _party_identifiers(party: dict) -> list:
    """identifier + additionalIdentifiers (extract.js:630-643,739-745)."""
    ids = []
    if party.get("identifier") is not None:
        ids.append(party["identifier"])
    for extra in party.get("additionalIdentifiers") or []:
        ids.append(extra)
    return ids


def _ident_key(ident: dict) -> list:
    return [ident.get("id"), ident.get("scheme")]


def _emit_items(em: _Emitter, cr, releases, product_index: dict) -> set:
    """Product mention emission (extract.js:39-106 extractItems).
    Returns the record's dot-stripped extracted-product-id set used by the
    item summaries."""
    item_keys: set = set()
    for contract in cr.get("contracts") or []:
        for item in contract.get("items") or []:
            prod_id = get_product_id(item.get("id"))
            if not prod_id:
                continue
            base = product_index.get(prod_id)
            st = new_state("products", prod_id)
            sk = em.sk()

            if base is not None:
                payload = {k: v for k, v in base.items() if k != "_id" and k != "source"}
                # base catalog sources rank just before this sighting
                # (creation starts from the cbmei doc, extract.js:110-115)
                for s in base.get("source") or []:
                    add_set_member(st, "source", s.get("id"), [em.order_key, sk[1], -1], dict(s))
            else:
                payload = {"id": item.get("id"), "description": item.get("description")}
                cls_desc = (item.get("classification") or {}).get("description")
                if cls_desc is not None:
                    payload["name"] = cls_desc
            set_first(st, "create", sk, payload)

            for s in get_product_sources(item.get("id"), releases):
                add_set_member(st, "source", s.get("id"), em.sk(), s)

            unit_value = ((item.get("unit") or {}).get("value")) or None
            qty = float(item.get("quantity") or 0.0)
            add_sum(st, "purchase_count", 1)
            add_sum(st, "purchase_amount", float(item.get("valueMxIMSS") or 0.0))
            add_sum(st, "purchase_quantity", qty)
            if unit_value is not None and unit_value.get("amount") is not None:
                # avgUnitPrice decomposes to sum(price*qty)/sum(qty) (A2);
                # exact vs the running mean at extract.js:62-66 when every
                # item carries unit.value (documented divergence otherwise).
                add_sum(st, "price_qty", float(unit_value["amount"]) * qty)
                add_sum(st, "qty_with_unit", qty)
            over = (unit_value or {}).get("amountOverpriceMxIMSS")
            if over is not None and over != 0:
                over = float(over)
                add_sum(st, "amount_over_all", over)
                if over > 0:
                    add_sum(st, "amount_over_with_overcost", over)
                avg = (unit_value or {}).get("valueAverageMxIMSS")
                if avg:
                    add_sum(st, "quantity_lost_all", over / float(avg))
                    if over > 0:
                        add_sum(st, "quantity_lost_with_overcost", over / float(avg))

            start = (contract.get("period") or {}).get("startDate")
            set_min(st, "first_purchase_date", start)
            set_max(st, "last_purchase_date", start)

            em.emit(st)
            item_keys.add(strip_dots(payload.get("id")))
    return item_keys


def _emit_person(em, cr, releases, party, metadata, item_keys) -> None:
    """handlePerson (extract.js:197-226)."""
    st = new_state("persons", party.get("id") or "")
    sk = em.sk()
    payload = {
        "name": party.get("name"),
        "area": _default_person_area(em, party, metadata),
        "source": _source_ids(metadata["source"]),
        "sourceRun": _source_ids(metadata["sourceRun"]),
    }
    set_first(st, "create", sk, payload)
    add_set_member(st, "other_names", party.get("name") or "", sk, {"name": party.get("name")})
    for ident in _party_identifiers(party):
        add_set_member(st, "identifiers", _ident_key(ident), em.sk(), ident)
    add_set_member(st, "classification", "proveedor", em.sk(), "proveedor")
    for s in metadata["source"]:
        add_set_member(st, "source", s.get("id"), em.sk(), s)
    set_min(st, "date", get_earliest_entity_date(party.get("id"), releases))

    if is_purchase(cr.get("source")):
        count, amount = get_contract_item_summary(cr, item_keys)
        add_sum(st, "purchase_count.supplier", count)
        add_sum(st, "purchase_amount.supplier", amount)
    else:
        count, amount = get_supplier_contract_summary(party.get("id"), cr)
        add_sum(st, "contract_count.supplier", count)
        add_sum(st, "contract_amount.supplier", amount)
    em.emit(st)


def _default_person_area(em, party, metadata) -> list:
    """createPerson area + lazy counter-less country (extract.js:1262-1285)."""
    country_id, country_name = "mx", "México"
    address = party.get("address") or {}
    if address.get("countryName") is not None:
        code = clean_country(address["countryName"])
        country_id = simple_name(code)
        country_name = get_country_name(address["countryName"])
        _emit_bare_country(em, country_id, country_name, metadata)
    return [{"id": country_id, "name": country_name, "classification": ["country"]}]


def _emit_bare_country(em, country_id, country_name, metadata) -> None:
    """Side-effect country WITHOUT counters (createPerson extract.js:1270-1278,
    createCompany extract.js:761-769): becomes an area state whose
    counters_init flag stays False — counters appear only if an institution
    path later credits the area (extract.js:581-607 lazy init)."""
    st = new_state("areas", country_id)
    payload = {
        "name": country_name,
        "classification": ["country"],
        "source": _source_ids(metadata["source"]),
        "sourceRun": _source_ids(metadata["sourceRun"]),
    }
    set_first(st, "create", em.sk(), payload)
    em.emit(st)


def _emit_company(em, cr, releases, party, metadata, item_keys) -> None:
    """handleCompany + createCompany (extract.js:228-269,704-783)."""
    st = new_state("orgs", party.get("id") or "")
    sk = em.sk()

    country_id, country_name = "mx", "México"
    address = party.get("address") or {}
    if address.get("countryName") is not None:
        raw = address["countryName"]
        code = clean_country(raw)
        country_id = simple_name(code)
        country_name = get_country_name(raw) if len(raw) == 2 else raw
        _emit_bare_country(em, country_id, country_name, metadata)

    payload = {
        "name": party.get("name"),
        "class": "company",
        "subclassification": None,
        "area": [{"id": country_id, "name": country_name, "classification": ["country"]}],
        "source": _source_ids(metadata["source"]),
        "sourceRun": _source_ids(metadata["sourceRun"]),
    }
    ctype = company_type(party.get("name"))
    if ctype:
        payload["subclassification"] = [ctype]
    set_first(st, "any_create", sk, payload)

    add_set_member(st, "other_names", party.get("name") or "", sk, {"name": party.get("name")})
    for ident in _party_identifiers(party):
        add_set_member(st, "identifiers", _ident_key(ident), em.sk(), ident)
    for s in metadata["source"]:
        add_set_member(st, "source", s.get("id"), em.sk(), s)
    set_min(st, "date", get_earliest_entity_date(party.get("id"), releases))

    if is_purchase(cr.get("source")):
        count, amount = get_contract_item_summary(cr, item_keys)
        add_sum(st, "purchase_count.supplier", count)
        add_sum(st, "purchase_amount.supplier", amount)
    else:
        count, amount = get_supplier_contract_summary(party.get("id"), cr)
        add_sum(st, "contract_count.supplier", count)
        add_sum(st, "contract_amount.supplier", amount)
    em.emit(st)


def _institution_create_payload(party: dict, metadata) -> dict:
    """createInstitution rendered context-free (extract.js:831-989)."""
    payload: dict = {
        "name": party.get("name"),
        "class": "institution",
        "source": _source_ids(metadata["source"]),
        "sourceRun": _source_ids(metadata["sourceRun"]),
    }
    details = party.get("details") or {}
    roles = party.get("roles") or []
    member_of = party.get("memberOf")
    if roles and roles[0] == "funder":
        subclass = "banco"
    elif party.get("details") is not None and details.get("classification") is not None:
        subclass = details["classification"]
    elif member_of is not None:
        payload["parent_id"] = (member_of[0] or {}).get("id")
        subclass = "unidad-compradora"
    else:
        subclass = "dependencia"
    payload["subclassification"] = [subclass]

    identifiers = _party_identifiers(party)
    if party.get("initials") is not None:
        identifiers.append(
            {"id": simple_name(party["initials"]), "legalName": party["initials"]}
        )
    payload["identifiers"] = identifiers

    contact = party.get("contactPoint")
    if contact is not None:
        payload["contact_details"] = [{"type": "contactPoint", "value": contact.get("name")}]

    gov_level = party.get("govLevel")
    if gov_level is None:
        gov_level = details.get("govLevel")

    address = party.get("address") or {}
    if gov_level is not None:
        area = []
        country_code = clean_country(address.get("countryName"))
        country_name = get_country_name(address.get("countryName"))
        region_id = get_state_id(address, country_code)
        if gov_level == "city":
            area.append(
                {
                    "id": region_id + "-" + simple_name(launder(address.get("locality"))),
                    "name": address.get("locality"),
                    "classification": ["city"],
                    "parent_id": region_id,
                    "parent": address.get("region"),
                }
            )
        if gov_level in ("city", "region"):
            state_obj = {
                "id": region_id,
                "name": address.get("region"),
                "classification": ["region"],
                "parent_id": simple_name(country_code),
                "parent": country_code,
            }
            aliases = get_other_state_names(address.get("region"))
            if aliases:
                state_obj["other_names"] = [{"name": a} for a in aliases]
            area.append(state_obj)
        if gov_level in ("city", "region", "country"):
            area.append(
                {
                    "id": simple_name(country_code),
                    "name": country_name,
                    "classification": ["country"],
                }
            )
        payload["area"] = area
        payload["govLevel"] = gov_level
    elif party.get("address") is not None:
        area = []
        country_code = ""
        region_id = ""
        if address.get("countryName") is not None:
            country_code = clean_country(address["countryName"])
            area.append(
                {
                    "id": simple_name(country_code),
                    "name": get_country_name(address["countryName"]),
                    "classification": ["country"],
                }
            )
        if address.get("region") is not None:
            region_id = get_state_id(address, country_code)
            state_obj = {
                "id": region_id,
                "name": address.get("region"),
                "classification": ["region"],
                "parent_id": simple_name(country_code),
                "parent": country_code,
            }
            aliases = get_other_state_names(address.get("region"))
            if aliases:
                state_obj["other_names"] = [{"name": a} for a in aliases]
            area.append(state_obj)
        if address.get("locality") is not None:
            area.append(
                {
                    "id": region_id + "-" + simple_name(launder(address.get("locality"))),
                    "name": address.get("locality"),
                    "classification": ["city"],
                    "parent_id": region_id,
                    "parent": address.get("region"),
                }
            )
        payload["area"] = area
    return payload


def _membership_state(em, mid: str, payload: dict) -> None:
    """Membership = first-writer-wins doc keyed by the deterministic edge id
    (A7 dedup; create-if-absent at extract.js:359-365 etc.)."""
    st = new_state("memberships", mid)
    set_first(st, "create", em.sk(), dict(payload, id=mid))
    em.emit(st)


def _emit_area_with_counters(
    em, area_id: str, payload: dict, count_field: str, summary
) -> None:
    """Institution-path area sighting: creation WITH zeroed counters
    (createCountry/createState) + area-counter credit (extract.js:581-607)."""
    st = new_state("areas", area_id)
    set_first(st, "create", em.sk(), dict(payload, with_counters=True))
    add_sum(st, count_field + "_count.area", summary[0])
    add_sum(st, count_field + "_amount.area", summary[1])
    em.emit(st)


def _emit_institution(em, cr, releases, party, metadata, item_keys) -> None:
    """handleInstitution (extract.js:303-608): the institution itself, its
    parent, the contact person, areas, and all six membership types."""
    inst_id = party.get("id") or ""
    details = party.get("details") or {}
    address = party.get("address") or {}

    st = new_state("orgs", inst_id)
    sk = em.sk()
    inst_payload = _institution_create_payload(party, metadata)
    set_first(st, "inst_create", sk, inst_payload)
    set_first(st, "any_create", sk, inst_payload)
    st["flags"]["inst_seen"] = True
    add_set_member(st, "other_names", party.get("name") or "", sk, {"name": party.get("name")})
    for s in metadata["source"]:
        add_set_member(st, "source", s.get("id"), em.sk(), s)
    set_min(st, "date", get_earliest_entity_date(inst_id, releases))

    # parent institution (extract.js:330-366)
    parent_id = None
    parent_payload = None
    member_of = party.get("memberOf")
    if member_of and (member_of[0] or {}).get("id") not in ("", None) and member_of[0]["id"] != inst_id:
        parent_id = member_of[0]["id"]
        parent_party = {
            "id": parent_id,
            "name": member_of[0].get("name"),
            "govLevel": details.get("govLevel"),
            "address": party.get("address"),
        }
        if member_of[0].get("initials") is not None:
            parent_party["initials"] = member_of[0]["initials"]
        pst = new_state("orgs", parent_id)
        psk = em.sk()
        parent_payload = _institution_create_payload(parent_party, metadata)
        set_first(pst, "inst_create", psk, parent_payload)
        set_first(pst, "any_create", psk, parent_payload)
        pst["flags"]["inst_seen"] = True
        add_set_member(pst, "other_names", member_of[0].get("name") or "", psk, {"name": member_of[0].get("name")})
        for s in metadata["source"]:
            add_set_member(pst, "source", s.get("id"), em.sk(), s)
        set_min(pst, "date", get_earliest_entity_date(parent_id, releases))
        em.emit(pst)

        if inst_id != "" and parent_id != "":
            _membership_state(
                em,
                inst_id + "_" + parent_id,
                {
                    "role": "Unidad Compradora",
                    "organization_id": inst_id,
                    "organization_name": inst_payload["name"],
                    "organization_class": "institution",
                    "organization_subclass": inst_payload["subclassification"][0],
                    "parent_id": parent_id,
                    "parent_name": parent_payload["name"],
                    "parent_class": "institution",
                    "parent_subclass": parent_payload["subclassification"][0],
                    "source": _source_ids(metadata["source"]),
                    "sourceRun": _source_ids(metadata["sourceRun"]),
                },
            )

    # contact person (extract.js:368-392)
    contact = party.get("contactPoint")
    encargado_id = None
    if contact is not None:
        encargado_id = contact.get("id")
        cst = new_state("persons", encargado_id or "")
        csk = em.sk()
        set_first(
            cst,
            "create",
            csk,
            {
                "name": contact.get("name"),
                "area": [{"id": "mx", "name": "México", "classification": ["country"]}],
                "source": _source_ids(metadata["source"]),
                "sourceRun": _source_ids(metadata["sourceRun"]),
            },
        )
        # found-case only unions the 'funcionario' type (extract.js:380) — no
        # other_names / identifiers / source contributions from this kind.
        add_set_member(cst, "classification", "funcionario", em.sk(), "funcionario")
        set_min(cst, "date", get_earliest_entity_date(encargado_id, releases))
        em.emit(cst)

        _membership_state(
            em,
            str(encargado_id) + "_" + inst_id,
            {
                "role": "Punto de Contacto",
                "person_id": encargado_id,
                "person_name": contact.get("name"),
                "parent_id": inst_id,
                "parent_name": inst_payload["name"],
                "parent_class": "institution",
                "parent_subclass": inst_payload["subclassification"][0],
                "source": _source_ids(metadata["source"]),
                "sourceRun": _source_ids(metadata["sourceRun"]),
            },
        )

    # areas (extract.js:394-543)
    gov_level = party.get("govLevel")
    if gov_level is None:
        gov_level = details.get("govLevel")

    country_id = state_id = municipality_id = None
    country_name = state_name = municipality_name = None
    if gov_level is not None:
        country_code = clean_country(address.get("countryName"))
        country_id = simple_name(country_code)
        country_name = address.get("countryName")

        if gov_level in ("city", "region"):
            state_id = get_state_id(address, country_code)
            state_name = address.get("region")
        if gov_level == "city":
            municipality_id = state_id + "-" + simple_name(launder(address.get("locality")))
            municipality_name = address.get("locality")

            _membership_state(
                em,
                country_id + "_" + state_id,
                _area_membership_payload(
                    "Estado", state_id, state_name, "state", country_id, country_name, "country", metadata
                ),
            )
            _membership_state(
                em,
                municipality_id + "_" + state_id,
                _area_membership_payload(
                    "Municipio", municipality_id, municipality_name, "city", state_id, state_name, "state", metadata
                ),
            )
            _membership_state(
                em,
                inst_id + "_" + municipality_id,
                _org_area_membership_payload(
                    "Pertenece a Municipio", inst_id, inst_payload, municipality_id, municipality_name, "city", metadata
                ),
            )
            if parent_id is not None:
                _membership_state(
                    em,
                    parent_id + "_" + municipality_id,
                    _org_area_membership_payload(
                        "Pertenece a Municipio", parent_id, parent_payload, municipality_id, municipality_name, "city", metadata
                    ),
                )
        elif gov_level == "region":
            _membership_state(
                em,
                country_id + "_" + state_id,
                _area_membership_payload(
                    "Estado", state_id, state_name, "state", country_id, country_name, "country", metadata
                ),
            )
            _membership_state(
                em,
                inst_id + "_" + state_id,
                _org_area_membership_payload(
                    "Pertenece a Estado", inst_id, inst_payload, state_id, state_name, "state", metadata
                ),
            )
            if parent_id is not None:
                _membership_state(
                    em,
                    parent_id + "_" + state_id,
                    _org_area_membership_payload(
                        "Pertenece a Estado", parent_id, parent_payload, state_id, state_name, "state", metadata
                    ),
                )

        set_last(st, "govLevel", em.sk(), gov_level)
    elif party.get("address") is not None and address.get("countryName") is not None:
        # else-branch country (extract.js:527-543): created WITH counters
        country_code = clean_country(address["countryName"])
        country_id = simple_name(country_code)
        country_name = address["countryName"]

    # summaries + counter credits (extract.js:546-607)
    buyer_contracts = get_buyer_contracts(inst_id, releases)
    if is_purchase(metadata["source"]):
        summary = get_buyer_contract_item_summary(cr, buyer_contracts, item_keys)
        prefix = "purchase"
    else:
        summary = get_buyer_contract_summary(inst_id, buyer_contracts, cr)
        prefix = "contract"

    roles = party.get("roles") or []
    role_slot = "funder" if (roles and roles[0] == "funder") else "buyer"
    add_sum(st, f"{prefix}_count.{role_slot}", summary[0])
    add_sum(st, f"{prefix}_amount.{role_slot}", summary[1])
    em.emit(st)

    if parent_id is not None and parent_id != party.get("id"):
        pcredit = new_state("orgs", parent_id)
        if gov_level is not None:
            set_last(pcredit, "govLevel", em.sk(), gov_level)
        add_sum(pcredit, f"{prefix}_count.buyer", summary[0])
        add_sum(pcredit, f"{prefix}_amount.buyer", summary[1])
        em.emit(pcredit)
    if encargado_id is not None:
        ecredit = new_state("persons", encargado_id or "")
        add_sum(ecredit, f"{prefix}_count.buyer", summary[0])
        add_sum(ecredit, f"{prefix}_amount.buyer", summary[1])
        em.emit(ecredit)

    if country_id is not None:
        _emit_area_with_counters(
            em,
            country_id,
            {
                "name": country_name,
                "classification": ["country"],
                "source": _source_ids(metadata["source"]),
                "sourceRun": _source_ids(metadata["sourceRun"]),
            },
            prefix,
            summary,
        )
    if state_id is not None:
        payload = {
            "name": state_name,
            "classification": ["state"],
            "parent_id": country_id,
            "parent_name": country_name,
            "source": _source_ids(metadata["source"]),
            "sourceRun": _source_ids(metadata["sourceRun"]),
        }
        aliases = get_other_state_names(state_name)
        if aliases:
            payload["other_names"] = [{"name": a} for a in aliases]
        _emit_area_with_counters(em, state_id, payload, prefix, summary)
    if municipality_id is not None:
        payload = {
            "name": municipality_name,
            "classification": ["city"],
            "parent_id": state_id,
            "parent_name": state_name,
            "source": _source_ids(metadata["source"]),
            "sourceRun": _source_ids(metadata["sourceRun"]),
        }
        _emit_area_with_counters(em, municipality_id, payload, prefix, summary)


def _area_membership_payload(role, org_id, org_name, org_class, parent_id, parent_name, parent_class, metadata):
    """createCountryMembership / createStateMembership (extract.js:1102-1138)."""
    return {
        "role": role,
        "organization_id": org_id,
        "organization_name": org_name,
        "organization_class": org_class,
        "parent_id": parent_id,
        "parent_name": parent_name,
        "parent_class": parent_class,
        "source": _source_ids(metadata["source"]),
        "sourceRun": _source_ids(metadata["sourceRun"]),
    }


def _org_area_membership_payload(role, org_id, org_payload, parent_id, parent_name, parent_class, metadata):
    """createOrgStateMembership / createOrgMunicipalityMembership
    (extract.js:1140-1178)."""
    return {
        "role": role,
        "organization_id": org_id,
        "organization_name": org_payload["name"],
        "organization_class": "institution",
        "organization_subclass": org_payload["subclassification"][0],
        "parent_id": parent_id,
        "parent_name": parent_name,
        "parent_class": parent_class,
        "source": _source_ids(metadata["source"]),
        "sourceRun": _source_ids(metadata["sourceRun"]),
    }
