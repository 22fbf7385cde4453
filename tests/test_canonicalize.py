"""Combiner-algebra property tests (SURVEY §5.3: A1-A7 associativity /
commutativity) and full-corpus conformance of emission+merge vs the
sequential oracle — pure Python, no Ray needed (the Ray pipeline is the
same algebra behind map_batches/groupby; see test_kg_pipeline.py)."""

from __future__ import annotations

import copy
import json
import random
from collections import defaultdict

import pytest

from ocds_entity_extract_ray.extraction.emit import emit_record
from ocds_entity_extract_ray.extraction.render import render_entity
from ocds_entity_extract_ray.extraction.state import merge_state, new_state, state_key
from ocds_entity_extract_ray.extraction.triples import (
    oracle_entities_by_table,
    precision_recall,
    triples_from_entities,
)
from ocds_entity_extract_ray.functions.classify import build_classifier_list_from_text
from ocds_entity_extract_ray.oracle.reference_extractor import run_reference
from ocds_entity_extract_ray.sources.synth import (
    classifier_csv,
    make_record,
    product_index,
)
from .conftest import normalize_numbers

N_RECORDS = 400


@pytest.fixture(scope="module")
def corpus():
    records = [make_record(i) for i in range(N_RECORDS)]
    return records, build_classifier_list_from_text([classifier_csv()]), product_index()


@pytest.fixture(scope="module")
def all_states(corpus):
    records, clist, pidx = corpus
    states = []
    for r in records:
        states.extend(emit_record(r, r["ocid"], clist, pidx))
    return states


def _merge_all(states):
    merged = {}
    for st in states:
        k = state_key(st)
        if k in merged:
            merge_state(merged[k], copy.deepcopy(st))
        else:
            merged[k] = copy.deepcopy(st)
    return merged


def _tables(merged):
    tables = defaultdict(list)
    for st in merged.values():
        tables[st["table"]].append(render_entity(st))
    return dict(tables)


def test_merge_order_invariance(all_states):
    """Merging sightings in any order yields identical rendered docs
    (modulo float summation error) — the property that makes parallelism,
    retries and block boundaries invisible."""
    base = _tables(_merge_all(all_states))
    for seed in (1, 2, 3):
        shuffled = list(all_states)
        random.Random(seed).shuffle(shuffled)
        other = _tables(_merge_all(shuffled))
        assert normalize_numbers(_strip_ids(base)) == normalize_numbers(_strip_ids(other))


def test_merge_associativity(all_states):
    """merge(merge(a,b),c) == merge(a,merge(b,c)) on real sighting states
    grouped three ways."""
    by_key = defaultdict(list)
    for st in all_states:
        by_key[state_key(st)].append(st)
    checked = 0
    for k, sts in by_key.items():
        if len(sts) < 3:
            continue
        a, b, c = (copy.deepcopy(sts[0]), copy.deepcopy(sts[1]), copy.deepcopy(sts[2]))
        left = merge_state(merge_state(copy.deepcopy(a), copy.deepcopy(b)), copy.deepcopy(c))
        right = merge_state(copy.deepcopy(a), merge_state(copy.deepcopy(b), copy.deepcopy(c)))
        dl = {k2: v for k2, v in render_entity(left).items() if k2 != "_id"}
        dr = {k2: v for k2, v in render_entity(right).items() if k2 != "_id"}
        assert normalize_numbers(dl) == normalize_numbers(dr), k
        checked += 1
        if checked >= 50:
            break
    assert checked > 10


def _strip_ids(tables):
    return {
        t: sorted(
            ({k: v for k, v in d.items() if k != "_id"} for d in docs),
            key=lambda d: str(d.get("id")),
        )
        for t, docs in tables.items()
    }


def test_conformance_vs_sequential_oracle(corpus, all_states):
    """Golden-output conformance (SURVEY §5.1): the distributed algebra's
    entities + triples match the faithful sequential port of the reference
    at P/R >= 0.95 (BASELINE.json north_rule); on this corpus exact on
    triples and near-exact on docs."""
    records, clist, pidx = corpus
    oracle_tables = oracle_entities_by_table(
        run_reference(sorted(records, key=lambda r: r["ocid"]), clist, pidx)
    )
    engine_tables = _tables(_merge_all(all_states))

    for t in ("persons", "orgs", "areas", "products", "memberships"):
        assert {d["id"] for d in oracle_tables[t]} == {d["id"] for d in engine_tables[t]}, t

    p, r = precision_recall(
        triples_from_entities(engine_tables), triples_from_entities(oracle_tables)
    )
    assert p >= 0.95 and r >= 0.95
    # this corpus should agree exactly on the triple set
    assert p == 1.0 and r == 1.0

    # doc-level: every doc equal after float normalization, except the
    # documented A6 promotion divergences (SURVEY §7.4.1) — bound them.
    from .conftest import approx_equal

    total = mismatched = 0
    for t in ("persons", "orgs", "areas", "products", "memberships"):
        o = {d["id"]: d for d in oracle_tables[t]}
        e = {d["id"]: d for d in engine_tables[t]}
        for k in o:
            total += 1
            do = {kk: v for kk, v in o[k].items() if kk != "_id"}
            de = {kk: v for kk, v in e[k].items() if kk != "_id"}
            if not approx_equal(do, de):
                mismatched += 1
    assert mismatched / total <= 0.05, f"{mismatched}/{total} docs diverge"


def test_content_hash_deterministic(all_states):
    merged = _merge_all(all_states)
    st = next(iter(merged.values()))
    assert render_entity(copy.deepcopy(st))["_id"] == render_entity(copy.deepcopy(st))["_id"]


def test_merge_identity():
    st = new_state("orgs", "x")
    out = merge_state(copy.deepcopy(st), new_state("orgs", "x"))
    assert out["sums"] == {} and out["first"] == {}
