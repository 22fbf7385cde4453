"""The mergeable per-entity state algebra.

The reference holds all cross-document state in one driver-heap dict of
dicts mutated per record (/root/reference/index.js:48-57,90). Here every
sighting of an entity becomes an immutable partial STATE, and states merge
with an associative + commutative operator, so the canonicalization step is
a plain (two-stage, map-side-combined) groupby on the entity key — the only
shape that scales on a cluster.

State sections and their merge ops:

- ``sums``  : {field: float}          -> elementwise add        (A1, A2)
- ``mins``  : {field: str}            -> elementwise min        (A3; ISO-8601
              strings, uniform format => lexicographic min == time min)
- ``maxs``  : {field: str}            -> elementwise max        (A3)
- ``flags`` : {field: bool}           -> elementwise OR         (class votes,
              lazy-counter init, A6 institution-beats-company)
- ``first`` : {slot: [sortkey, payload]} -> keep min sortkey    (A5 first-
              writer-wins creation payloads; sortkey = [order_key, seq]
              replaces dict-insertion order with a deterministic total order)
- ``last``  : {slot: [sortkey, value]}  -> keep max sortkey     (the
              reference's govLevel last-writer at extract.js:522)
- ``sets``  : {field: {member_key: [sortkey, value]}} -> union keeping the
              min sortkey per member  (A4 dedup-unions of other_names /
              identifiers / classification / sources, rendered in
              first-seen order)

Associativity/commutativity of every section is property-tested in
tests/test_canonicalize.py; that is what makes merge order (and therefore
parallelism, retries and block boundaries) invisible in the output.
"""

from __future__ import annotations

import json
from typing import Any

SECTIONS = ("sums", "mins", "maxs", "flags", "first", "last", "sets")


def new_state(table: str, entity_id: str) -> dict:
    return {
        "table": table,
        "id": entity_id,
        "sums": {},
        "mins": {},
        "maxs": {},
        "flags": {},
        "first": {},
        "last": {},
        "sets": {},
    }


def merge_state(a: dict, b: dict) -> dict:
    """Merge b into a (in place) and return a. Associative + commutative."""
    for k, v in b["sums"].items():
        a["sums"][k] = a["sums"].get(k, 0.0) + v
    for k, v in b["mins"].items():
        cur = a["mins"].get(k)
        if cur is None or v < cur:
            a["mins"][k] = v
    for k, v in b["maxs"].items():
        cur = a["maxs"].get(k)
        if cur is None or v > cur:
            a["maxs"][k] = v
    for k, v in b["flags"].items():
        a["flags"][k] = a["flags"].get(k, False) or v
    for slot, (sk, payload) in b["first"].items():
        cur = a["first"].get(slot)
        if cur is None or list(sk) < list(cur[0]):
            a["first"][slot] = [sk, payload]
    for slot, (sk, value) in b["last"].items():
        cur = a["last"].get(slot)
        if cur is None or list(sk) > list(cur[0]):
            a["last"][slot] = [sk, value]
    for field, members in b["sets"].items():
        cur_f = a["sets"].setdefault(field, {})
        for mk, (sk, value) in members.items():
            cur = cur_f.get(mk)
            if cur is None or list(sk) < list(cur[0]):
                cur_f[mk] = [sk, value]
    return a


def add_sum(st: dict, field: str, value: float) -> None:
    if value:
        st["sums"][field] = st["sums"].get(field, 0.0) + float(value)
    else:
        st["sums"].setdefault(field, st["sums"].get(field, 0.0))


def set_min(st: dict, field: str, value: str | None) -> None:
    if value is None:
        return
    cur = st["mins"].get(field)
    if cur is None or value < cur:
        st["mins"][field] = value


def set_max(st: dict, field: str, value: str | None) -> None:
    if value is None:
        return
    cur = st["maxs"].get(field)
    if cur is None or value > cur:
        st["maxs"][field] = value


def set_first(st: dict, slot: str, sortkey: list, payload: Any) -> None:
    cur = st["first"].get(slot)
    if cur is None or list(sortkey) < list(cur[0]):
        st["first"][slot] = [sortkey, payload]


def set_last(st: dict, slot: str, sortkey: list, value: Any) -> None:
    cur = st["last"].get(slot)
    if cur is None or list(sortkey) > list(cur[0]):
        st["last"][slot] = [sortkey, value]


def add_set_member(st: dict, field: str, member_key, sortkey: list, value: Any) -> None:
    mk = member_key if isinstance(member_key, str) else json.dumps(member_key)
    members = st["sets"].setdefault(field, {})
    cur = members.get(mk)
    if cur is None or list(sortkey) < list(cur[0]):
        members[mk] = [sortkey, value]


def set_members_ordered(st: dict, field: str) -> list:
    """Set members in first-seen (min sortkey) order."""
    members = st["sets"].get(field, {})
    return [v for _, v in sorted(((sk, v) for sk, v in members.values()), key=lambda t: list(t[0]))]


def state_key(st: dict) -> str:
    return st["table"] + "|" + st["id"]


def dumps_state(st: dict) -> str:
    return json.dumps(st, ensure_ascii=False, separators=(",", ":"))


def loads_state(s: str) -> dict:
    return json.loads(s)
