"""Render a fully-merged state into the final output document.

Output shapes mirror the reference's Popolo-ish docs (SURVEY.md §1.3;
/root/reference/lib/extract.js:704-783 company, :831-989 institution,
:785-829 area, :1220-1292 person, :108-140 product, :1102-1218 membership).
The content id `_id` is the deterministic content hash of the doc
(insert.js:37-38 parity — computed before any wall-clock stamping).
"""

from __future__ import annotations

from ..functions.hashing import content_hash
from .state import set_members_ordered

_ZERO2 = {"buyer": 0, "supplier": 0}
_ZERO3 = {"buyer": 0, "supplier": 0, "funder": 0}


def _num(x: float) -> int | float:
    """Canonical number rendering: whole floats as ints (JS print parity),
    fractional floats rounded to 12 significant digits so the content hash
    is stable under any float-summation order (merge-tree fp noise is
    ~1e-14 relative; 12 sig digits leaves a 100x margin up to ~1e10
    contributions per key — beyond that, exclude counters from _id)."""
    x = float(f"{float(x):.12g}")  # canonicalize BEFORE the int check so a
    # sum that lands at 3071.9999999998 in one merge order and 3072.0 in
    # another renders identically
    return int(x) if x.is_integer() else x


def _counter(state: dict, prefix: str, slots: dict) -> dict:
    out = {}
    for slot, zero in slots.items():
        out[slot] = _num(state["sums"].get(f"{prefix}.{slot}", zero))
    return out


def render_entity(state: dict) -> dict:
    table = state["table"]
    if table == "persons":
        return _render_person(state)
    if table == "orgs":
        return _render_org(state)
    if table == "areas":
        return _render_area(state)
    if table == "products":
        return _render_product(state)
    if table == "memberships":
        return _render_membership(state)
    raise ValueError(f"unknown table {table}")


def _merged_sources(state: dict, payload: dict) -> list:
    """Creator's source snapshot first, then set-union contributions in
    first-seen order (mergeMetadata semantics, extract.js:690-702)."""
    out = []
    seen = set()
    for s in payload.get("source") or []:
        if s.get("id") not in seen:
            seen.add(s.get("id"))
            out.append(dict(s))  # creator snapshot keeps the FULL object
    for s in set_members_ordered(state, "source"):
        if s.get("id") not in seen:
            seen.add(s.get("id"))
            out.append({"id": s.get("id")})  # merged additions strip to {id}
    return out


def _other_names(state: dict, chosen_name: str | None) -> list:
    out = []
    seen = set()
    for entry in set_members_ordered(state, "other_names"):
        nm = entry.get("name")
        if nm != chosen_name and nm not in seen:
            seen.add(nm)
            out.append({"name": nm})
    return out


def _identifiers(state: dict, payload_idents: list | None) -> list:
    out = []
    seen = set()
    for ident in (payload_idents or []) + set_members_ordered(state, "identifiers"):
        key = (ident.get("id"), ident.get("scheme"))
        if key not in seen:
            seen.add(key)
            out.append(ident)
    return out


def _render_person(state: dict) -> dict:
    _, payload = state["first"]["create"]
    doc = {
        "id": state["id"],
        "name": payload.get("name"),
        "other_names": _other_names(state, payload.get("name")),
        "contract_count": _counter(state, "contract_count", _ZERO2),
        "contract_amount": _counter(state, "contract_amount", _ZERO2),
        "purchase_count": _counter(state, "purchase_count", _ZERO3),
        "purchase_amount": _counter(state, "purchase_amount", _ZERO3),
        "classification": set_members_ordered(state, "classification"),
        "identifiers": _identifiers(state, None),
        "area": payload.get("area"),
        "source": _merged_sources(state, payload),
        "sourceRun": payload.get("sourceRun") or [],
    }
    if "date" in state["mins"]:
        doc["date"] = state["mins"]["date"]
    doc["_id"] = content_hash(doc)
    return doc


def _render_org(state: dict) -> dict:
    """Class-priority resolution A6: institution if ANY institution sighting
    (extract.js:232-247,303-325), fields from the first institution sighting;
    counters/sets union everything (documented divergence from the
    reference's promotion-time drops, SURVEY §7.4.1)."""
    if state["flags"].get("inst_seen") and "inst_create" in state["first"]:
        _, payload = state["first"]["inst_create"]
        cls = "institution"
    else:
        _, payload = state["first"]["any_create"]
        cls = "company"

    doc = {
        "id": state["id"],
        "name": payload.get("name"),
        "other_names": _other_names(state, payload.get("name")),
        "classification": [cls],
        "contract_count": _counter(state, "contract_count", _ZERO3),
        "contract_amount": _counter(state, "contract_amount", _ZERO3),
        "purchase_count": _counter(state, "purchase_count", _ZERO3),
        "purchase_amount": _counter(state, "purchase_amount", _ZERO3),
        "identifiers": _identifiers(state, payload.get("identifiers")),
        "source": _merged_sources(state, payload),
        "sourceRun": payload.get("sourceRun") or [],
    }
    if payload.get("subclassification"):
        doc["subclassification"] = payload["subclassification"]
    if payload.get("parent_id") is not None:
        doc["parent_id"] = payload["parent_id"]
    if payload.get("contact_details") is not None:
        doc["contact_details"] = payload["contact_details"]
    if payload.get("area") is not None:
        doc["area"] = payload["area"]
    gov = state["last"].get("govLevel")
    if gov is not None:
        doc["govLevel"] = gov[1]
    elif payload.get("govLevel") is not None:
        doc["govLevel"] = payload["govLevel"]
    if "date" in state["mins"]:
        doc["date"] = state["mins"]["date"]
    doc["_id"] = content_hash(doc)
    return doc


def _render_area(state: dict) -> dict:
    _, payload = state["first"]["create"]
    doc = {
        "id": state["id"],
        "name": payload.get("name"),
        "classification": payload.get("classification"),
    }
    if payload.get("parent_id") is not None:
        doc["parent_id"] = payload["parent_id"]
        doc["parent_name"] = payload.get("parent_name")
    if payload.get("other_names") is not None:
        doc["other_names"] = payload["other_names"]
    # Lazy counters (extract.js:581-607): an area CREATED on the institution
    # path carries all four zeroed families; an area created counter-less
    # (person/company side-effect) materializes only the prefix families
    # that actually credited it (the sums keys mark each credit, including
    # zero-valued ones).
    full = bool(payload.get("with_counters"))
    for prefix in ("contract", "purchase"):
        if full or f"{prefix}_count.area" in state["sums"]:
            doc[f"{prefix}_count"] = {"area": _num(state["sums"].get(f"{prefix}_count.area", 0))}
            doc[f"{prefix}_amount"] = {"area": _num(state["sums"].get(f"{prefix}_amount.area", 0))}
    doc["source"] = payload.get("source") or []
    doc["sourceRun"] = payload.get("sourceRun") or []
    doc["_id"] = content_hash(doc)
    return doc


def _render_product(state: dict) -> dict:
    _, payload = state["first"]["create"]
    qty_unit = state["sums"].get("qty_with_unit", 0.0)
    price_qty = state["sums"].get("price_qty", 0.0)
    doc = dict(payload)
    doc.update(
        {
            "purchase_count": {"product": _num(state["sums"].get("purchase_count", 0))},
            "purchase_amount": {"product": _num(state["sums"].get("purchase_amount", 0))},
            "purchase_quantity": {"product": _num(state["sums"].get("purchase_quantity", 0))},
            # avgUnitPrice == sum(price*qty)/sum(qty) (A2, extract.js:62-66)
            "avgUnitPrice": _num(price_qty / qty_unit) if qty_unit else 0,
            "quantity_lost_with_overcost": _num(state["sums"].get("quantity_lost_with_overcost", 0)),
            "quantity_lost_all": _num(state["sums"].get("quantity_lost_all", 0)),
            "amount_over_with_overcost": _num(state["sums"].get("amount_over_with_overcost", 0)),
            "amount_over_all": _num(state["sums"].get("amount_over_all", 0)),
            "first_purchase_date": state["mins"].get("first_purchase_date"),
            "last_purchase_date": state["maxs"].get("last_purchase_date"),
        }
    )
    doc["source"] = set_members_ordered(state, "source")
    doc["_id"] = content_hash(doc)
    return doc


def _render_membership(state: dict) -> dict:
    _, payload = state["first"]["create"]
    doc = dict(payload)
    doc["_id"] = content_hash(doc)
    return doc
