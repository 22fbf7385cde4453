"""Triple derivation: entity/membership docs -> (subj, pred, obj, props).

The graph edges are the reference's six membership types
(/root/reference/lib/extract.js:1102-1218, SURVEY §2.6 E1-E6) mapped to
predicates, plus entity-attribute triples (type / name / area). Shared by
the Ray engine and the sequential oracle so P/R compares like with like.
"""

from __future__ import annotations

from ..functions.hashing import canonical_json

# role -> predicate (SURVEY §2.3 E1-E6)
ROLE_PREDICATES = {
    "Estado": "inCountry",
    "Municipio": "inState",
    "Pertenece a Estado": "locatedInState",
    "Pertenece a Municipio": "locatedInCity",
    "Unidad Compradora": "memberOf",
    "Punto de Contacto": "contactPointOf",
}


def membership_triple(doc: dict) -> tuple[str, str, str, str]:
    subj = doc.get("organization_id", doc.get("person_id"))
    pred = ROLE_PREDICATES.get(doc.get("role"), doc.get("role") or "relatedTo")
    obj = doc.get("parent_id")
    props = canonical_json({"role": doc.get("role")})
    return (str(subj), pred, str(obj), props)


def entity_triples(table: str, doc: dict) -> list[tuple[str, str, str, str]]:
    """Attribute triples for a non-membership entity doc."""
    out = []
    eid = str(doc.get("id"))
    cls = doc.get("classification") or []
    if cls:
        out.append((eid, "hasClass", str(cls[0]), "{}"))
    if doc.get("name") is not None:
        out.append((eid, "hasName", str(doc["name"]), "{}"))
    area = doc.get("area")
    if area:
        out.append((eid, "inArea", str(area[0].get("id")), "{}"))
    if table == "areas" and doc.get("parent_id") is not None:
        out.append((eid, "hasParentArea", str(doc["parent_id"]), "{}"))
    return out


def triples_from_entities(entities_by_table: dict[str, list[dict]]) -> list[tuple[str, str, str, str]]:
    """entities_by_table: {'persons': [...], 'orgs': [...], 'areas': [...],
    'products': [...], 'memberships': [...]} -> sorted unique triples."""
    out: set = set()
    for table, docs in entities_by_table.items():
        for doc in docs:
            if table == "memberships":
                out.add(membership_triple(doc))
            else:
                out.update(entity_triples(table, doc))
    return sorted(out)


def oracle_entities_by_table(entities: dict) -> dict[str, list[dict]]:
    """Adapt the sequential oracle's accumulator (companies/institutions
    split) to the engine's table layout (orgs = companies ∪ institutions,
    insert.js:8-11)."""
    return {
        "persons": list(entities["persons"].values()),
        "orgs": list(entities["companies"].values()) + list(entities["institutions"].values()),
        "areas": list(entities["states"].values()),
        "products": list(entities["products"].values()),
        "memberships": list(entities["memberships"].values()),
    }


def precision_recall(predicted, expected) -> tuple[float, float]:
    p_set, e_set = set(predicted), set(expected)
    if not p_set and not e_set:
        return 1.0, 1.0
    tp = len(p_set & e_set)
    precision = tp / len(p_set) if p_set else 1.0
    recall = tp / len(e_set) if e_set else 1.0
    return precision, recall
