"""Sequential single-process oracle: a faithful Python port of the
reference's accumulator semantics (/root/reference/lib/extract.js), used as
golden ground truth by the conformance tests (SURVEY.md §5.1).

This is deliberately the OPPOSITE architecture from the Ray engine — one
heap, one pass, dict mutation, order-dependent — so agreement between the
two is real evidence. Known controlled divergences from the JS (documented
in SURVEY §7.4): dates compare lexicographically on uniform ISO strings
(vs Date.parse), and null dates are skipped rather than poisoning the min.
Everything else, including the order-dependent company->institution
promotion drops (extract.js:303-325), is ported as-is.

Additional documented normalizations shared with the engine: missing/None
entity ids coerce to "" (JS would stringify undefined into ids like
'undefined_PARENT'), and explicit-null details.classification is treated as
absent (JS hasOwnProperty would produce subclassification [null]).
"""

from __future__ import annotations

from ..functions.classify import classify_party
from ..functions.geo import get_country_name, get_other_state_names, get_state_id
from ..functions.laundry import clean_country, company_type, launder, simple_name
from ..functions.products import get_product_id, strip_dots
from ..extraction.emit import (
    get_buyer_contract_item_summary,
    get_buyer_contract_summary,
    get_buyer_contracts,
    get_contract_item_summary,
    get_earliest_entity_date,
    get_party_sources,
    get_product_sources,
    get_supplier_contract_summary,
    is_purchase,
)


def new_entities() -> dict:
    """The accumulator (/root/reference/index.js:48-55)."""
    return {
        "companies": {},
        "institutions": {},
        "states": {},
        "persons": {},
        "memberships": {},
        "products": {},
    }


def run_reference(records, classifier_list=None, product_index=None) -> dict:
    """Drain records sequentially (index.js:81-96). ``records`` must be
    iterated in the same order_key order the distributed engine uses for its
    first-seen tiebreaks (sort by url/ocid before calling)."""
    entities = new_entities()
    product_index = product_index or {}
    for record in records:
        extract_entities(
            record.get("compiledRelease") or {},
            record.get("releases") or [],
            entities,
            classifier_list,
            product_index,
        )
    return entities


def extract_entities(cr, releases, entities, classifier_list, product_index):
    """extractEntities (extract.js:5-37)."""
    items = _extract_items(cr, releases, entities, product_index)
    for party in cr.get("parties") or []:
        sources, source_runs = get_party_sources(party, releases)
        # creation-time snapshots keep the FULL source objects (Object.assign
        # of the collected objects, extract.js:12); merges strip to {id}
        metadata = {"source": sources, "sourceRun": source_runs}
        cls = classify_party(party, classifier_list)
        if cls == "institution":
            _handle_institution(cr, releases, party, entities, items, metadata)
        elif cls == "company":
            _handle_company(cr, releases, party, entities, items, metadata)
        else:
            _handle_person(cr, releases, party, entities, items, metadata)


def _merge_metadata(doc, metadata):
    """mergeMetadata (extract.js:690-702): union doc.source by id."""
    have = {s.get("id") for s in doc.get("source") or []}
    doc.setdefault("source", [])
    for s in metadata["source"]:
        if s["id"] not in have:
            have.add(s["id"])
            doc["source"].append({"id": s["id"]})


def _other_names(doc, new_name):
    """otherNames (extract.js:621-628)."""
    if doc.get("name") != new_name:
        if not any(o.get("name") == new_name for o in doc["other_names"]):
            doc["other_names"].append({"name": new_name})


def _other_identifiers(doc, party):
    """otherIdentifiers (extract.js:630-643)."""
    ids = []
    if party.get("identifier") is not None:
        ids.append(party["identifier"])
    ids.extend(party.get("additionalIdentifiers") or [])
    for ident in ids:
        if not any(
            e.get("id") == ident.get("id") and e.get("scheme") == ident.get("scheme")
            for e in doc["identifiers"]
        ):
            doc["identifiers"].append(ident)


def _other_types(doc, new_type):
    """otherTypes (extract.js:645-655)."""
    if doc.get("classification"):
        if new_type not in doc["classification"]:
            doc["classification"].append(new_type)
    else:
        doc["classification"] = [new_type]


def _merge_dates(doc, first_seen):
    """mergeDates (extract.js:292-301), null-skipping variant."""
    if first_seen is None:
        return
    if doc.get("date") is None:
        doc["date"] = first_seen
    elif first_seen < doc["date"]:
        doc["date"] = first_seen


# --- products (extract.js:39-140) -------------------------------------------


def _extract_items(cr, releases, entities, product_index):
    items = []
    for contract in cr.get("contracts") or []:
        for item in contract.get("items") or []:
            prod_id = get_product_id(item.get("id"))
            if not prod_id:
                continue
            metadata = {"source": get_product_sources(item.get("id"), releases)}
            if prod_id not in entities["products"]:
                product = _create_product(item, product_index.get(prod_id), metadata)
                entities["products"][prod_id] = product
            else:
                product = entities["products"][prod_id]
                _merge_metadata(product, metadata)

            unit_value = ((item.get("unit") or {}).get("value")) or None
            qty = float(item.get("quantity") or 0.0)
            if unit_value is not None and unit_value.get("amount") is not None:
                acc = product["avgUnitPrice"] * product["purchase_quantity"]["product"]
                pp = float(unit_value["amount"]) * qty
                denom = product["purchase_quantity"]["product"] + qty
                product["avgUnitPrice"] = (acc + pp) / denom if denom else 0

            product["purchase_count"]["product"] += 1
            product["purchase_amount"]["product"] += float(item.get("valueMxIMSS") or 0.0)
            product["purchase_quantity"]["product"] += qty

            over = (unit_value or {}).get("amountOverpriceMxIMSS")
            if over is not None and over != 0:
                over = float(over)
                product["amount_over_all"] += over
                if over > 0:
                    product["amount_over_with_overcost"] += over
                avg = (unit_value or {}).get("valueAverageMxIMSS")
                if avg:
                    product["quantity_lost_all"] += over / float(avg)
                    if over > 0:
                        product["quantity_lost_with_overcost"] += over / float(avg)

            start = (contract.get("period") or {}).get("startDate")
            if start is not None:
                if product["first_purchase_date"] is None or start < product["first_purchase_date"]:
                    product["first_purchase_date"] = start
                if product["last_purchase_date"] is None or start > product["last_purchase_date"]:
                    product["last_purchase_date"] = start

            items.append(product)
    return items


def _create_product(item, base, metadata):
    """createProduct (extract.js:108-140)."""
    if base is not None:
        product = {k: v for k, v in base.items() if k != "_id"}
        product.setdefault("source", [])
        product["source"] = [dict(s) for s in product["source"]]
        _merge_metadata(product, metadata)
    else:
        product = {"id": item.get("id"), "description": item.get("description")}
        cls_desc = (item.get("classification") or {}).get("description")
        if cls_desc is not None:
            product["name"] = cls_desc
        product.update(metadata)
    product.update(
        {
            "purchase_count": {"product": 0},
            "purchase_amount": {"product": 0},
            "purchase_quantity": {"product": 0},
            "avgUnitPrice": 0,
            "quantity_lost_with_overcost": 0,
            "quantity_lost_all": 0,
            "amount_over_with_overcost": 0,
            "amount_over_all": 0,
            "first_purchase_date": None,
            "last_purchase_date": None,
        }
    )
    return product


def _item_keys(items):
    return {strip_dots(p.get("id")) for p in items}


# --- persons / companies (extract.js:197-269,704-783,1220-1292) --------------


def _handle_person(cr, releases, party, entities, items, metadata):
    pid = party.get("id") or ""
    if pid not in entities["persons"]:
        person = _create_person(party, metadata, "proveedor", entities)
        entities["persons"][pid] = person
    else:
        person = entities["persons"][pid]
        _other_names(person, party.get("name"))
        _other_identifiers(person, party)
        _other_types(person, "proveedor")
        _merge_metadata(person, metadata)
    _merge_dates(person, get_earliest_entity_date(pid, releases))

    if is_purchase(cr.get("source")):
        count, amount = get_contract_item_summary(cr, _item_keys(items))
        person["purchase_count"]["supplier"] += count
        person["purchase_amount"]["supplier"] += amount
    else:
        count, amount = get_supplier_contract_summary(pid, cr)
        person["contract_count"]["supplier"] += count
        person["contract_amount"]["supplier"] += amount


def _create_person(party, metadata, ptype, entities):
    person = {
        "id": party.get("id") or "",
        "name": party.get("name"),
        "other_names": [],
        "contract_count": {"buyer": 0, "supplier": 0},
        "contract_amount": {"buyer": 0, "supplier": 0},
        "purchase_count": {"buyer": 0, "supplier": 0, "funder": 0},
        "purchase_amount": {"buyer": 0, "supplier": 0, "funder": 0},
    }
    if ptype:
        person["classification"] = [ptype]
    identifiers = []
    if party.get("identifier") is not None:
        identifiers.append(party["identifier"])
    identifiers.extend(party.get("additionalIdentifiers") or [])
    person["identifiers"] = identifiers

    country_id, country_name = "mx", "México"
    address = party.get("address") or {}
    if party.get("address") is not None and address.get("countryName") is not None:
        code = clean_country(address["countryName"])
        country_id = simple_name(code)
        country_name = get_country_name(address["countryName"])
        if country_id not in entities["states"]:
            cobj = _create_country(country_id, country_name, metadata)
            for f in ("contract_count", "contract_amount", "purchase_count", "purchase_amount"):
                cobj.pop(f, None)
            entities["states"][country_id] = cobj
    person["area"] = [{"id": country_id, "name": country_name, "classification": ["country"]}]
    person.update({k: list(v) for k, v in metadata.items()})
    return person


def _handle_company(cr, releases, party, entities, items, metadata):
    cid = party.get("id") or ""
    in_comp = cid in entities["companies"]
    in_inst = cid in entities["institutions"]

    if not in_comp and not in_inst:
        company = _create_company(party, metadata, entities)
        entities["companies"][cid] = company
        in_comp = True
    else:
        company = entities["institutions"][cid] if in_inst else entities["companies"][cid]
        _other_identifiers(company, party)
        _other_names(company, party.get("name"))
        _merge_metadata(company, metadata)
    _merge_dates(company, get_earliest_entity_date(cid, releases))

    collection = entities["companies"] if in_comp else entities["institutions"]
    if is_purchase(cr.get("source")):
        count, amount = get_contract_item_summary(cr, _item_keys(items))
        collection[cid]["purchase_count"]["supplier"] += count
        collection[cid]["purchase_amount"]["supplier"] += amount
    else:
        count, amount = get_supplier_contract_summary(cid, cr)
        collection[cid]["contract_count"]["supplier"] += count
        collection[cid]["contract_amount"]["supplier"] += amount


def _create_company(party, metadata, entities):
    org = {
        "id": party.get("id") or "",
        "name": party.get("name"),
        "other_names": [],
        "classification": ["company"],
        "contract_count": {"buyer": 0, "supplier": 0, "funder": 0},
        "contract_amount": {"buyer": 0, "supplier": 0, "funder": 0},
        "purchase_count": {"buyer": 0, "supplier": 0, "funder": 0},
        "purchase_amount": {"buyer": 0, "supplier": 0, "funder": 0},
    }
    ctype = company_type(party.get("name"))
    if ctype:
        org["subclassification"] = [ctype]
    identifiers = []
    if party.get("identifier") is not None:
        identifiers.append(party["identifier"])
    identifiers.extend(party.get("additionalIdentifiers") or [])
    org["identifiers"] = identifiers

    country_id, country_name = "mx", "México"
    address = party.get("address") or {}
    if party.get("address") is not None and address.get("countryName") is not None:
        raw = address["countryName"]
        code = clean_country(raw)
        country_id = simple_name(code)
        country_name = get_country_name(raw) if len(raw) == 2 else raw
        if country_id not in entities["states"]:
            cobj = _create_country(country_id, country_name, metadata)
            for f in ("contract_count", "contract_amount", "purchase_count", "purchase_amount"):
                cobj.pop(f, None)
            entities["states"][country_id] = cobj
    org["area"] = [{"id": country_id, "name": country_name, "classification": ["country"]}]
    org.update({k: list(v) for k, v in metadata.items()})
    return org


# --- areas (extract.js:785-829) ----------------------------------------------


def _create_country(cid, name, metadata):
    country = {
        "id": cid,
        "name": name,
        "classification": ["country"],
        "contract_count": {"area": 0},
        "contract_amount": {"area": 0},
        "purchase_count": {"area": 0},
        "purchase_amount": {"area": 0},
    }
    country.update({k: list(v) for k, v in metadata.items()})
    return country


def _create_state(stype, sid, name, parent, metadata):
    st = {
        "id": sid,
        "name": name,
        "classification": [stype],
        "contract_count": {"area": 0},
        "contract_amount": {"area": 0},
        "purchase_count": {"area": 0},
        "purchase_amount": {"area": 0},
    }
    if parent is not None:
        st.update({"parent_id": parent["id"], "parent_name": parent["name"]})
    else:
        st.update({"parent_id": "mx", "parent_name": "México"})
    aliases = get_other_state_names(name)
    if aliases:
        st["other_names"] = [{"name": a} for a in aliases]
    st.update({k: list(v) for k, v in metadata.items()})
    return st


# --- institutions (extract.js:303-608,831-989) -------------------------------


def _create_institution(party, metadata):
    from ..extraction.emit import _institution_create_payload

    payload = _institution_create_payload(party, metadata)
    org = {
        "id": party.get("id") or "",
        "name": payload["name"],
        "other_names": [],
        "classification": ["institution"],
        "contract_count": {"buyer": 0, "supplier": 0, "funder": 0},
        "contract_amount": {"buyer": 0, "supplier": 0, "funder": 0},
        "purchase_count": {"buyer": 0, "supplier": 0, "funder": 0},
        "purchase_amount": {"buyer": 0, "supplier": 0, "funder": 0},
        "subclassification": payload["subclassification"],
        "identifiers": payload["identifiers"],
    }
    if "parent_id" in payload:
        org["parent_id"] = payload["parent_id"]
    if "contact_details" in payload:
        org["contact_details"] = payload["contact_details"]
    if "area" in payload:
        org["area"] = payload["area"]
    if "govLevel" in payload:
        org["govLevel"] = payload["govLevel"]
    org["source"] = list(payload["source"])
    org["sourceRun"] = list(payload["sourceRun"])
    return org


def _handle_institution(cr, releases, party, entities, items, metadata):
    inst_id = party.get("id") or ""
    details = party.get("details") or {}
    address = party.get("address") or {}

    if inst_id not in entities["institutions"]:
        institution = _create_institution(party, metadata)
        # company->institution promotion (extract.js:310-318): copies
        # contract counters + identifiers, DROPS other_names/purchase counts.
        if inst_id in entities["companies"]:
            institution["classification"] = ["institution"]
            institution["contract_count"] = entities["companies"][inst_id]["contract_count"]
            institution["contract_amount"] = entities["companies"][inst_id]["contract_amount"]
            institution["identifiers"] = entities["companies"][inst_id]["identifiers"]
            del entities["companies"][inst_id]
        entities["institutions"][inst_id] = institution
    else:
        institution = entities["institutions"][inst_id]
        _other_names(institution, party.get("name"))
        _merge_metadata(institution, metadata)
    _merge_dates(institution, get_earliest_entity_date(inst_id, releases))

    parent = None
    parent_id = None
    member_of = party.get("memberOf")
    if member_of and (member_of[0] or {}).get("id") not in ("", None) and member_of[0]["id"] != inst_id:
        parent_id = member_of[0]["id"]
        if parent_id not in entities["institutions"]:
            parent_party = {
                "id": parent_id,
                "name": member_of[0].get("name"),
                "govLevel": details.get("govLevel"),
                "address": party.get("address"),
            }
            if member_of[0].get("initials") is not None:
                parent_party["initials"] = member_of[0]["initials"]
            parent = _create_institution(parent_party, metadata)
            entities["institutions"][parent_id] = parent
        else:
            parent = entities["institutions"][parent_id]
            _other_names(parent, member_of[0].get("name"))
            _merge_metadata(parent, metadata)
        _merge_dates(parent, get_earliest_entity_date(parent_id, releases))

        if inst_id != "" and parent_id != "":
            mid = inst_id + "_" + parent_id
            if mid not in entities["memberships"]:
                child_doc = entities["institutions"][inst_id]
                parent_doc = entities["institutions"][parent_id]
                entities["memberships"][mid] = dict(
                    {
                        "id": mid,
                        "role": "Unidad Compradora",
                        "organization_id": child_doc["id"],
                        "organization_name": child_doc["name"],
                        "organization_class": child_doc["classification"][0],
                        "organization_subclass": child_doc["subclassification"][0],
                        "parent_id": parent_doc["id"],
                        "parent_name": parent_doc["name"],
                        "parent_class": parent_doc["classification"][0],
                        "parent_subclass": parent_doc["subclassification"][0],
                    },
                    **metadata,
                )

    encargado_id = None
    contact = party.get("contactPoint")
    if contact is not None:
        encargado_id = contact.get("id") or ""
        if encargado_id not in entities["persons"]:
            entities["persons"][encargado_id] = _create_person(
                {"id": encargado_id, "name": contact.get("name")}, metadata, "funcionario", entities
            )
        else:
            _other_types(entities["persons"][encargado_id], "funcionario")
        _merge_dates(entities["persons"][encargado_id], get_earliest_entity_date(encargado_id, releases))

        mid = str(encargado_id) + "_" + str(inst_id)
        if mid not in entities["memberships"]:
            child_doc = entities["persons"][encargado_id]
            parent_doc = entities["institutions"][inst_id]
            entities["memberships"][mid] = dict(
                {
                    "id": mid,
                    "role": "Punto de Contacto",
                    "person_id": child_doc["id"],
                    "person_name": child_doc["name"],
                    "parent_id": parent_doc["id"],
                    "parent_name": parent_doc["name"],
                    "parent_class": parent_doc["classification"][0],
                    "parent_subclass": parent_doc["subclassification"][0],
                },
                **metadata,
            )

    gov_level = party.get("govLevel")
    if gov_level is None:
        gov_level = details.get("govLevel")

    country_id = state_id = municipality_id = None
    if gov_level is not None:
        country_code = clean_country(address.get("countryName"))
        country_id = simple_name(country_code)
        if country_id not in entities["states"]:
            entities["states"][country_id] = _create_country(country_id, address.get("countryName"), metadata)
        country = entities["states"][country_id]

        if gov_level in ("city", "region"):
            state_id = get_state_id(address, country_code)
            if state_id not in entities["states"]:
                state = _create_state("state", state_id, address.get("region"), country, metadata)
                entities["states"][state_id] = state
                mid = country_id + "_" + state_id
                entities["memberships"][mid] = dict(
                    {
                        "id": mid,
                        "role": "Estado",
                        "organization_id": state["id"],
                        "organization_name": state["name"],
                        "organization_class": "state",
                        "parent_id": country["id"],
                        "parent_name": country["name"],
                        "parent_class": "country",
                    },
                    **metadata,
                )
            else:
                state = entities["states"][state_id]

        if gov_level == "city":
            municipality_id = state_id + "-" + simple_name(launder(address.get("locality")))
            if municipality_id not in entities["states"]:
                municipality = _create_state("city", municipality_id, address.get("locality"), state, metadata)
                entities["states"][municipality_id] = municipality
                mid = municipality_id + "_" + state_id
                entities["memberships"][mid] = dict(
                    {
                        "id": mid,
                        "role": "Municipio",
                        "organization_id": municipality["id"],
                        "organization_name": municipality["name"],
                        "organization_class": "city",
                        "parent_id": state["id"],
                        "parent_name": state["name"],
                        "parent_class": "state",
                    },
                    **metadata,
                )
            else:
                municipality = entities["states"][municipality_id]

            _org_area_membership(entities, institution, municipality_id, "Pertenece a Municipio", "city", metadata)
            if parent is not None:
                _org_area_membership(entities, parent, municipality_id, "Pertenece a Municipio", "city", metadata)
        elif gov_level == "region":
            _org_area_membership(entities, institution, state_id, "Pertenece a Estado", "state", metadata)
            if parent is not None:
                _org_area_membership(entities, parent, state_id, "Pertenece a Estado", "state", metadata)

        entities["institutions"][inst_id]["govLevel"] = gov_level
        if parent is not None:
            entities["institutions"][parent_id]["govLevel"] = gov_level
    else:
        if party.get("address") is not None and address.get("countryName") is not None:
            country_code = clean_country(address["countryName"])
            country_id = simple_name(country_code)
            if country_id not in entities["states"]:
                entities["states"][country_id] = _create_country(country_id, address["countryName"], metadata)

    buyer_contracts = get_buyer_contracts(inst_id, releases)
    if is_purchase(metadata["source"]):
        summary = get_buyer_contract_item_summary(cr, buyer_contracts, _item_keys(items))
        count_name, amount_name = "purchase_count", "purchase_amount"
    else:
        summary = get_buyer_contract_summary(inst_id, buyer_contracts, cr)
        count_name, amount_name = "contract_count", "contract_amount"

    roles = party.get("roles") or []
    slot = "funder" if (roles and roles[0] == "funder") else "buyer"
    entities["institutions"][inst_id][count_name][slot] += summary[0]
    entities["institutions"][inst_id][amount_name][slot] += summary[1]

    if parent_id is not None and parent_id != party.get("id"):
        entities["institutions"][parent_id][count_name]["buyer"] += summary[0]
        entities["institutions"][parent_id][amount_name]["buyer"] += summary[1]
    if encargado_id is not None:
        entities["persons"][encargado_id][count_name]["buyer"] += summary[0]
        entities["persons"][encargado_id][amount_name]["buyer"] += summary[1]

    for area_id in (country_id, state_id, municipality_id):
        if area_id is not None:
            area = entities["states"][area_id]
            if count_name not in area:
                area[count_name] = {"area": 0}
                area[amount_name] = {"area": 0}
            area[count_name]["area"] += summary[0]
            area[amount_name]["area"] += summary[1]


def _org_area_membership(entities, org, area_id, role, parent_class, metadata):
    mid = org["id"] + "_" + area_id
    if mid not in entities["memberships"]:
        area = entities["states"][area_id]
        entities["memberships"][mid] = dict(
            {
                "id": mid,
                "role": role,
                "organization_id": org["id"],
                "organization_name": org["name"],
                "organization_class": org["classification"][0],
                "organization_subclass": org["subclassification"][0],
                "parent_id": area["id"],
                "parent_name": area["name"],
                "parent_class": parent_class,
            },
            **metadata,
        )
