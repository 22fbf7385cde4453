"""Classifier-override list loading + lookup.

Re-expresses /root/reference/lib/classify.js:4-34 (headerless CSV of
``name,class`` rows, whitespace-collapsed keys, later files override) and
the lookup contract of getEntityClassifier (/root/reference/lib/extract.js:189-195).
"""

from __future__ import annotations

import csv
import io

from .laundry import collapse_ws, is_company


def build_classifier_list(paths: list[str]) -> dict[str, str] | None:
    """Load one or more headerless CSVs into {collapsed_name: 'person'|'company'}.

    Mirrors classify.js: skip empty lines, tolerate ragged rows (first two
    fields used), keys whitespace-collapsed (classify.js:19), later files
    override earlier keys.
    """
    if not paths:
        return None
    out: dict[str, str] = {}
    for path in paths:
        with open(path, newline="", encoding="utf-8") as fh:
            _load_csv_into(out, fh)
    return out


def build_classifier_list_from_text(blobs: list[str]) -> dict[str, str] | None:
    if not blobs:
        return None
    out: dict[str, str] = {}
    for blob in blobs:
        _load_csv_into(out, io.StringIO(blob))
    return out


def _load_csv_into(out: dict[str, str], fh) -> None:
    for row in csv.reader(fh):
        if not row or all(not c.strip() for c in row):
            continue
        if len(row) < 2:
            continue
        out[collapse_ws(row[0])] = row[1]


def get_entity_classifier(name: str, classifier_list: dict[str, str]) -> bool | None:
    """True=company, False=person, None=not listed (extract.js:189-195).

    The probe uses the RAW party name against whitespace-collapsed keys —
    the reference's exact (slightly lossy) behavior."""
    cls = classifier_list.get(name)
    if cls is None:
        return None
    return cls == "company"


def classify_party(
    party: dict, classifier_list: dict[str, str] | None
) -> str:
    """Full classification cascade (extract.js:13-34):

    1. details.type == 'institution' short-circuits;
    2. classifier-list lookup by name;
    3. details.type == 'company' forces company;
    4. fallback: is_company(name) heuristic.
    Returns 'institution' | 'company' | 'person'.
    """
    details = party.get("details") or {}
    if details.get("type") == "institution":
        return "institution"
    result: bool | None = None
    if classifier_list:
        result = get_entity_classifier(party.get("name") or "", classifier_list)
    if details.get("type") == "company":
        result = True
    if result is None:
        result = is_company(party.get("name"))
    return "company" if result else "person"
