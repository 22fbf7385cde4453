"""Hypothesis property tests: the merge algebra's laws under arbitrary
generated states, and normalizer invariants (SURVEY §5.3)."""

from __future__ import annotations

import copy
import json

from hypothesis import example, given, settings
from hypothesis import strategies as st

from ocds_entity_extract_ray.extraction.state import (
    merge_state,
    new_state,
)
from ocds_entity_extract_ray.functions.laundry import (
    clean_country,
    collapse_ws,
    is_company,
    launder,
    simple_name,
)
from ocds_entity_extract_ray.functions.products import get_product_id, strip_dots

# --- generated states --------------------------------------------------------

_fields = st.sampled_from(["a", "b", "c", "d"])
_sortkey = st.tuples(
    st.text(alphabet="abc0123456789", min_size=1, max_size=6),
    st.integers(0, 99),
    st.integers(-1, 1),
).map(list)


@st.composite
def states(draw):
    st_ = new_state("orgs", "x")
    for f in draw(st.lists(_fields, max_size=4)):
        st_["sums"][f] = draw(st.integers(-1000, 1000))
    for f in draw(st.lists(_fields, max_size=3)):
        st_["mins"][f] = draw(st.text("0123456789", min_size=4, max_size=4))
    for f in draw(st.lists(_fields, max_size=3)):
        st_["maxs"][f] = draw(st.text("0123456789", min_size=4, max_size=4))
    for f in draw(st.lists(_fields, max_size=2)):
        st_["flags"][f] = draw(st.booleans())
    for slot in draw(st.lists(_fields, max_size=2)):
        st_["first"][slot] = [draw(_sortkey), {"v": draw(st.integers(0, 9))}]
    for slot in draw(st.lists(_fields, max_size=2)):
        st_["last"][slot] = [draw(_sortkey), draw(st.integers(0, 9))]
    for f in draw(st.lists(_fields, max_size=2)):
        members = {}
        for mk in draw(st.lists(st.text("xyz", min_size=1, max_size=2), max_size=3)):
            members[mk] = [draw(_sortkey), {"m": mk}]
        st_["sets"][f] = members
    return st_


def _tag(state: dict, tag: int) -> dict:
    """Append a unique per-state element to every sortkey: the engine's
    sortkeys ([order_key, seq]) are globally unique by construction (url/
    ocid unique per record, seq monotonic within), so tie-breaking between
    DIFFERENT payloads can never occur; the generator must respect that
    invariant or commutativity trivially fails on artificial ties."""
    for slot, (sk, v) in state["first"].items():
        state["first"][slot] = [list(sk) + [tag], v]
    for slot, (sk, v) in state["last"].items():
        state["last"][slot] = [list(sk) + [tag], v]
    for f, members in state["sets"].items():
        for mk, (sk, v) in members.items():
            members[mk] = [list(sk) + [tag], v]
    return state


def _canon(s) -> str:
    from .conftest import normalize_numbers

    # int/float duality (0 vs 0.0) is a representation artifact the render
    # layer canonicalizes; normalize before comparing
    return json.dumps(normalize_numbers(s), sort_keys=True)


@settings(max_examples=200, deadline=None)
@given(states(), states())
def test_merge_commutative(a, b):
    a, b = _tag(a, 1), _tag(b, 2)
    ab = merge_state(copy.deepcopy(a), copy.deepcopy(b))
    ba = merge_state(copy.deepcopy(b), copy.deepcopy(a))
    assert _canon(ab) == _canon(ba)


@settings(max_examples=200, deadline=None)
@given(states(), states(), states())
def test_merge_associative(a, b, c):
    a, b, c = _tag(a, 1), _tag(b, 2), _tag(c, 3)
    left = merge_state(merge_state(copy.deepcopy(a), copy.deepcopy(b)), copy.deepcopy(c))
    right = merge_state(copy.deepcopy(a), merge_state(copy.deepcopy(b), copy.deepcopy(c)))
    assert _canon(left) == _canon(right)


@settings(max_examples=100, deadline=None)
@given(states())
def test_merge_identity_element(a):
    out = merge_state(copy.deepcopy(a), new_state("orgs", "x"))
    assert _canon(out) == _canon(a)


@settings(max_examples=100, deadline=None)
@given(states())
def test_merge_idempotent_for_non_sums(a):
    """Merging a state with itself only doubles the sums — every other
    section is idempotent (required: a retried task must not perturb
    first/last/sets/flags beyond the documented counter caveat handled by
    shard-level manifests)."""
    doubled = merge_state(copy.deepcopy(a), copy.deepcopy(a))
    for section in ("mins", "maxs", "flags", "first", "last", "sets"):
        assert _canon(doubled[section]) == _canon(a[section])
    for k, v in a["sums"].items():
        assert doubled["sums"][k] == 2 * v


# --- normalizer invariants ---------------------------------------------------

_texts = st.text(min_size=0, max_size=60)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_simple_name_idempotent_and_clean(s):
    out = simple_name(s)
    assert simple_name(out) == out
    assert out == "" or out.strip("-") == out
    assert all(c.islower() or c.isdigit() or c == "-" for c in out)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_launder_idempotent(s):
    assert launder(launder(s)) == launder(s)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_collapse_ws_idempotent(s):
    assert collapse_ws(collapse_ws(s)) == collapse_ws(s)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_is_company_total(s):
    assert is_company(s) in (True, False)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789", min_size=0, max_size=20))
def test_product_id_preserves_digits(s):
    """Dot insertion never changes the digit content (dot-insensitive
    compare invariant, extract.js:1302)."""
    assert strip_dots(get_product_id(s)) == s


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(["MX", "mx", "US", "GB", "ZZ"]))
def test_clean_country_2char_uppercases(code):
    assert clean_country(code) == code.upper()


# --- round-2 op kernels ------------------------------------------------------


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_simhash_in_signed_range_and_deterministic(t):
    from ocds_entity_extract_ray.ops.textstats import simhash64, simhash64_signed

    sh = simhash64(t)
    assert 0 <= sh < (1 << 64)
    s = simhash64_signed(t)
    assert -(1 << 63) <= s < (1 << 63)
    assert (s & ((1 << 64) - 1)) == sh  # two's complement round-trip
    assert simhash64(t) == sh


@given(st.text(max_size=300), st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_ngram_jaccard_bounds_and_symmetry(a, b):
    from ocds_entity_extract_ray.ops.dedup import ngram_jaccard

    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(b, a)
    assert ngram_jaccard(a, a) == 1.0


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_winnowing_guarantee(t):
    """Winnowing guarantee: fingerprint count is positive whenever the doc
    has at least one k-gram, bounded by gram count, and deterministic."""
    from ocds_entity_extract_ray.ops.textstats import winnowing_fingerprints

    fps = winnowing_fingerprints(t)
    n_grams = max(0, len(t) - 8 + 1) if len(t) >= 8 else 0
    if n_grams == 0:
        assert fps == []
    else:
        assert 1 <= len(fps) <= n_grams
    assert fps == winnowing_fingerprints(t)


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=200), st.floats(0.01, 0.99))
@settings(max_examples=100, deadline=None)
def test_hash_sample_mask_is_pure(keys, frac):
    import numpy as np

    from ocds_entity_extract_ray.ops.sampling import hash_sample_mask

    ks = np.asarray(keys, dtype=np.int64)
    m1 = hash_sample_mask(ks, frac)
    m2 = hash_sample_mask(ks, frac)
    assert (m1 == m2).all()
    # monotone in fraction: a kept key stays kept at any larger fraction
    m3 = hash_sample_mask(ks, min(0.999, frac + 0.2))
    assert (~m1 | m3).all()


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=500),
    st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
)
@settings(max_examples=100, deadline=None)
def test_quantile_summary_rank_bound(vals, q):
    """One-level compression: quantile from the k-point summary is within
    1/k + 1/n rank error of the true quantile."""
    import numpy as np

    from ocds_entity_extract_ray.ops.quantiles import (
        _partial_points,
        _quantile_from_summaries,
    )

    v = np.asarray(vals, dtype=np.float64)
    k = 64
    pts = _partial_points(v, k)
    w = np.full(len(pts), len(v) / len(pts))
    got = _quantile_from_summaries(pts, w, q)
    sv = np.sort(v)
    # with duplicates the returned value spans a RANK INTERVAL; error is
    # the distance from q to that interval
    r_lo = np.searchsorted(sv, got, side="left") / len(sv)
    r_hi = np.searchsorted(sv, got, side="right") / len(sv)
    err = 0.0 if r_lo <= q <= r_hi else min(abs(q - r_lo), abs(q - r_hi))
    assert err <= 1.0 / k + 1.0 / len(v) + 1e-9


@given(st.integers(0, 10_000))
@settings(max_examples=8, deadline=None)
def test_range_join_matches_bruteforce(seed):
    """Randomized interval graphs: the banded distributed join equals the
    O(n*m) brute-force containment check."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ocds_entity_extract_ray.ops.rangejoin import range_join

    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-06-01")
    n_p, n_r = 40, 25
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_p),
            "k": rng.randint(0, 4, n_p),
            "ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.randint(0, 600, n_p)],
        }
    )
    starts = [base + pd.Timedelta(minutes=int(m)) for m in rng.randint(0, 600, n_r)]
    lens = rng.randint(1, 60, n_r)
    rgs = pd.DataFrame(
        {
            "rid": np.arange(n_r),
            "k": rng.randint(0, 4, n_r),
            "start": starts,
            "end": [s + pd.Timedelta(minutes=int(l)) for s, l in zip(starts, lens)],
        }
    )
    got = range_join(
        ray.data.from_pandas(pts),
        ray.data.from_pandas(rgs),
        key_col="k",
        point_ts_col="ts",
        point_cols=["pid"],
        range_cols=["rid"],
        bucket_width=pd.Timedelta(hours=1),
    ).to_pandas()
    got_pairs = set(zip(got["p_pid"].astype(int), got["r_rid"].astype(int)))
    want = {
        (int(p.pid), int(r.rid))
        for p in pts.itertuples()
        for r in rgs.itertuples()
        if p.k == r.k and r.start <= p.ts < r.end
    }
    assert got_pairs == want


@given(st.integers(0, 10_000))
@settings(max_examples=8, deadline=None)
@example(118)  # regression: a draw with ZERO edges (schema-less empty frame)
def test_connected_components_matches_bruteforce(seed):
    """Random sparse graphs: both component paths equal a BFS baseline."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ocds_entity_extract_ray.ops.graph import connected_components

    rng = np.random.RandomState(seed)
    n = 30
    n_e = rng.randint(0, 25)
    edges = pd.DataFrame(
        {"id_a": rng.randint(0, n, n_e), "id_b": rng.randint(0, n, n_e)}
    )
    nodes = pd.DataFrame({"node": np.arange(n, dtype="int64")})

    # BFS baseline
    adj = {i: set() for i in range(n)}
    for a, b in zip(edges["id_a"], edges["id_b"]):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    want = {}
    seen = set()
    for s in range(n):
        if s in seen:
            continue
        comp, stack = [], [s]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.append(x)
            stack.extend(adj[x] - seen)
        m = min(comp)
        for x in comp:
            want[x] = m

    for max_edges in (1_000_000, 0):
        got = connected_components(
            ray.data.from_pandas(nodes),
            ray.data.from_pandas(edges),
            broadcast_max_edges=max_edges,
        ).to_pandas()
        assert dict(zip(got["node"].astype(int), got["cluster_id"].astype(int))) == want


# --- round-4 vectorized text kernels -----------------------------------------

_TEXT_SUBSET = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "S", "Zs", "Zl", "Zp"),
        max_codepoint=0x024F,  # ASCII + latin extended: the pinned RE2 subset
        # the FULL Python-\s set (incl. NBSP \xa0, NEL \x85, separators
        # \x1c-\x1f) — the batch kernels spell it out for RE2, so parity
        # must hold on every one of these, not just ASCII whitespace
        include_characters=" \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f\x85\xa0  　",
        # U+0130 'İ' is the one code point in range where Python's FULL
        # lowercase ('i' + combining dot) differs from Arrow's simple
        # mapping ('i') — excluded from the pinned subset (documented)
        exclude_characters="İ",
    ),
    max_size=300,
)


@given(st.lists(_TEXT_SUBSET, max_size=20))
@settings(max_examples=100, deadline=None)
def test_quality_stats_batch_matches_scalar(texts):
    """The vectorized (pyarrow/RE2 + numpy) batch kernels must agree
    EXACTLY — including float ratios — with the per-doc reference
    implementations on the pinned ASCII + latin-extended subset."""
    import numpy as np

    from ocds_entity_extract_ray.ops.textstats import (
        bpe_ish_token_count,
        bpe_ish_token_count_batch,
        detect_lang,
        detect_lang_batch,
        quality_stats,
        quality_stats_batch,
        token_count,
        token_count_batch,
    )

    qb = quality_stats_batch(texts)
    lb = detect_lang_batch(texts)
    tb = token_count_batch(texts)
    bb = bpe_ish_token_count_batch(texts)
    assert len(lb) == len(texts)
    for i, t in enumerate(texts):
        ref = quality_stats(t)
        for k, v in ref.items():
            assert qb[k][i] == v, (k, t)
        assert lb[i] == detect_lang(t), t
        assert tb[i] == token_count(t), t
        assert bb[i] == bpe_ish_token_count(t), t
    if not texts:
        assert all(np.asarray(v).shape == (0,) for v in qb.values())


@given(st.lists(_TEXT_SUBSET, max_size=12))
@settings(max_examples=60, deadline=None)
def test_simhash_batch_matches_scalar_both_branches(texts):
    """simhash64_signed_batch == the scalar reference, on BOTH the
    counts-matmul (small vocab) and reduceat (large vocab) branches."""
    from unittest import mock

    from ocds_entity_extract_ray.ops import textstats as T

    want = [T.simhash64_signed(t) for t in texts]
    assert list(T.simhash64_signed_batch(texts)) == want
    with mock.patch.object(T, "_SIMHASH_MATMUL_CELLS", 0):
        assert list(T.simhash64_signed_batch(texts)) == want
