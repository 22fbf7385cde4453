"""Planted-fixture coverage for the two round-4 corpus-cleaning ops:
cross-document duplicated-passage removal (ops/passages.py) and
SemDeDup-style semantic dedup (ops/semdedup.py). The SQL-oracle parity
for both is covered by the sweep (q_passage_dedup / q_semantic_dedup);
these tests pin the planted semantics and the forced-branch parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ocds_entity_extract_ray.ops.passages import dedup_passages
from ocds_entity_extract_ray.ops.semdedup import semantic_dedup

P = "alpha beta gamma delta"  # the planted shared 4-word passage


@pytest.fixture(scope="module")
def passage_corpus(ray_session):
    rows = [
        # P + unique full chunk + partial tail
        {"doc_id": 1, "text": P + " one two three four tail"},
        # P + a different unique full chunk, no tail
        {"doc_id": 2, "text": P + " five six seven eight"},
        # 3 words: ONLY a partial tail — never dropped even though the
        # text is a prefix of the duplicated passage
        {"doc_id": 3, "text": "alpha beta gamma"},
        # within-document duplicate: both occurrences of P drop,
        # nothing survives -> NULL cleaned_text
        {"doc_id": 4, "text": P + " " + P},
        # fully unique doc
        {"doc_id": 5, "text": "u1 u2 u3 u4 u5"},
    ]
    return ray.data.from_pandas(pd.DataFrame(rows))


EXPECTED = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "n_passages": [3, 2, 1, 2, 2],
        "n_dropped": [1, 1, 0, 2, 0],
        "cleaned_text": [
            "one two three four tail",
            "five six seven eight",
            "alpha beta gamma",
            None,
            "u1 u2 u3 u4 u5",
        ],
    }
)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_passages"] = out["n_passages"].astype(np.int64)
    out["n_dropped"] = out["n_dropped"].astype(np.int64)
    out["cleaned_text"] = out["cleaned_text"].where(out["cleaned_text"].notna(), None)
    return out


def test_passage_dedup_planted(passage_corpus):
    got = _normalize(dedup_passages(passage_corpus, words_per_passage=4).to_pandas())
    pd.testing.assert_frame_equal(got, EXPECTED)


def test_passage_dedup_distributed_branch_parity(passage_corpus):
    """broadcast_max_dups=0 forces the explode/anti-join/reassemble branch;
    output must be identical to the broadcast branch."""
    got = _normalize(
        dedup_passages(
            passage_corpus, words_per_passage=4, broadcast_max_dups=0, num_buckets=4
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, EXPECTED)


def test_passage_dedup_no_dups_is_identity(ray_session):
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [7, 8], "text": ["a b c d e", "f g h i"]})
    )
    got = _normalize(dedup_passages(docs, words_per_passage=4).to_pandas())
    assert list(got["n_dropped"]) == [0, 0]
    assert list(got["cleaned_text"]) == ["a b c d e", "f g h i"]


def test_passage_dedup_rejects_bad_window(passage_corpus):
    with pytest.raises(ValueError, match="words_per_passage"):
        dedup_passages(passage_corpus, words_per_passage=0)


@pytest.fixture(scope="module")
def line_corpus(ray_session):
    from ocds_entity_extract_ray.ops.passages import dedup_lines  # noqa: F401

    rows = [
        {"doc_id": 1, "text": "A\nB\nC"},  # all first occurrences
        {"doc_id": 2, "text": "B\nD"},  # B seen at doc1 pos1 -> dropped
        {"doc_id": 3, "text": "A\nB"},  # every line dropped -> doc vanishes
        {"doc_id": 4, "text": "E\nE"},  # within-doc dup: first kept
    ]
    df = pd.DataFrame(rows)
    df["doc_id"] = df["doc_id"].astype(np.int64)
    return ray.data.from_pandas(df).repartition(3)


LINE_EXPECTED = pd.DataFrame(
    {
        "doc_id": np.array([1, 2, 4], dtype=np.int64),
        "clean_text": ["A\nB\nC", "D", "E"],
        "n_lines": np.array([3, 2, 2], dtype=np.int64),
        "n_dropped": np.array([0, 1, 1], dtype=np.int64),
    }
)


@pytest.mark.parametrize("branch", [None, "broadcast", "join"])
def test_line_dedup_planted_both_branches(line_corpus, branch):
    """Globally-first-occurrence keep rule, ordered by (doc_id, pos);
    documents whose every line occurred earlier disappear. The forced
    join branch (packed position blobs + left-outer hash join) must be
    byte-identical to the broadcast branch."""
    from ocds_entity_extract_ray.ops.passages import dedup_lines

    got = (
        dedup_lines(line_corpus, force_branch=branch, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, LINE_EXPECTED)


def test_line_dedup_reflow_tail_included(ray_session):
    """words_per_line reflow: consecutive w-word lines with the tail
    partial line INCLUDED (every word belongs to exactly one line)."""
    from ocds_entity_extract_ray.ops.passages import dedup_lines

    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["a b c d a b", "c d e"],
        }
    )
    got = (
        dedup_lines(ray.data.from_pandas(df), words_per_line=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["clean_text"]) == ["a b\nc d", "e"]
    assert list(got["n_lines"]) == [3, 2]
    assert list(got["n_dropped"]) == [1, 1]


def test_line_dedup_matches_reference_on_random_corpora(ray_session):
    """Seeded random corpora vs a from-scratch sequential reference
    (global first-occurrence set in (doc_id, pos) order), both branches."""
    from ocds_entity_extract_ray.ops.passages import dedup_lines

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(6)]
    W = 2
    for trial in range(3):
        texts = []
        for _ in range(20):
            n = int(rng.integers(1, 12))
            texts.append(" ".join(rng.choice(vocab, size=n)))
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

        seen: set[str] = set()
        expect = {}
        for did, t in zip(df["doc_id"], texts):
            ws = t.split(" ")
            n_ln = max((len(ws) + W - 1) // W, 1)
            lines = [" ".join(ws[j * W : (j + 1) * W]) for j in range(n_ln)]
            kept = []
            for ln in lines:
                if ln in seen:
                    continue
                seen.add(ln)
                kept.append(ln)
            if kept:
                expect[int(did)] = ("\n".join(kept), n_ln, n_ln - len(kept))

        for branch in ("broadcast", "join"):
            got = (
                dedup_lines(
                    ray.data.from_pandas(df).repartition(3),
                    words_per_line=W,
                    force_branch=branch,
                    num_buckets=3,
                )
                .to_pandas()
                .sort_values("doc_id")
            )
            assert set(got["doc_id"].astype(int)) == set(expect), (trial, branch)
            for did, ct, nl, nd in zip(
                got["doc_id"], got["clean_text"], got["n_lines"], got["n_dropped"]
            ):
                assert (ct, nl, nd) == expect[int(did)], (trial, branch, did)


def _vec(theta: float, d: int = 8, r: float = 0.9) -> np.ndarray:
    v = np.zeros(d, dtype=np.float64)
    v[0] = r * np.cos(theta)
    v[1] = r * np.sin(theta)
    return v


@pytest.fixture(scope="module")
def planted_embeddings(ray_session):
    """Cluster 0: three vectors in a 2D fan at 0/40/80 degrees — with
    tau^2 = 1/5 (tau ~ 0.447, ~63.4deg) the 40deg neighbors are similar
    but the 80deg pair is not. Cluster 1: two far-away vectors."""
    deg = np.pi / 180.0
    rows = [
        {"vec_id": 0, "label": 0, "embedding": _vec(0.0)},
        {"vec_id": 1, "label": 0, "embedding": _vec(40 * deg)},
        {"vec_id": 2, "label": 0, "embedding": _vec(80 * deg)},
        {"vec_id": 10, "label": 1, "embedding": _vec(200 * deg)},
        {"vec_id": 11, "label": 1, "embedding": _vec(210 * deg)},
    ]
    df = pd.DataFrame(rows)
    df["label"] = df["label"].astype(np.int64)
    df["vec_id"] = df["vec_id"].astype(np.int64)
    return ray.data.from_pandas(df)


def _init_centroids(ds):
    from ocds_entity_extract_ray.ops.kmeans import label_init_centroids

    return label_init_centroids(ds)


def test_semantic_dedup_non_transitive_drop_rule(planted_embeddings):
    """vec1 is dropped by vec0 (cos40 > tau); vec2 is dropped by vec1
    (cos40 > tau) even though vec1 itself was dropped — the rule is
    'similar to ANY lower id', not 'similar to a survivor' — while
    cos(vec0, vec2) = cos80 < tau alone would have kept vec2."""
    init = _init_centroids(planted_embeddings)
    out = (
        semantic_dedup(planted_embeddings, init, iters=2, tau2_num=1, tau2_den=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(out["vec_id"]) == [0, 1, 2, 10, 11]
    # both planted clusters survive the 2 Lloyd iterations intact
    assert out["cluster"].iloc[0] == out["cluster"].iloc[1] == out["cluster"].iloc[2]
    assert out["cluster"].iloc[3] == out["cluster"].iloc[4]
    assert out["cluster"].iloc[0] != out["cluster"].iloc[3]
    # 210deg is 10deg from 200deg -> similar -> 11 dropped by 10
    assert list(out["kept"]) == [True, False, False, True, False]


def test_semantic_dedup_strict_threshold_keeps_all(planted_embeddings):
    """tau^2 = 1999/2000 (tau ~ 0.99975) — nothing in the fan or the far
    cluster is that parallel, so every vector survives."""
    init = _init_centroids(planted_embeddings)
    out = semantic_dedup(
        planted_embeddings, init, iters=2, tau2_num=1999, tau2_den=2000
    ).to_pandas()
    assert bool(out["kept"].all())


def test_semantic_dedup_cluster_cap_raises(planted_embeddings):
    init = _init_centroids(planted_embeddings)
    with pytest.raises(Exception, match="max_cluster_size"):
        semantic_dedup(
            planted_embeddings, init, iters=1, max_cluster_size=2
        ).to_pandas()


def test_semantic_dedup_validates_threshold(planted_embeddings):
    init = _init_centroids(planted_embeddings)
    # overflow bound is dimension-aware: d=8 here, so tau2_den must
    # satisfy tau2_den * 64 <= 9.223e6
    with pytest.raises(ValueError, match="overflows int64"):
        semantic_dedup(planted_embeddings, init, tau2_num=1, tau2_den=200_000)
    with pytest.raises(ValueError, match="int64 headroom"):
        semantic_dedup(planted_embeddings, init, tau2_num=0, tau2_den=5)
    # a ratio the old fixed cap (2000) would have refused is fine at d=8
    out = semantic_dedup(
        planted_embeddings, init, iters=1, tau2_num=2999, tau2_den=3000
    ).to_pandas()
    assert bool(out["kept"].all())


def test_semantic_dedup_chunked_prune_matches_dense(ray_session):
    """Force the chunked pairwise path (chunk >= 256 rows) with a cluster
    larger than one chunk and verify against a brute-force O(n^2) numpy
    reference on the same quantized integers."""
    import ray.data

    rng = np.random.default_rng(5)
    n, d = 700, 8
    base = rng.normal(size=(n, d))
    base /= np.abs(base).max() * 1.2  # inside the quantizer's [-1, 1]
    # plant near-dup pairs: every 50th vector is a tiny perturbation of
    # its predecessor
    for i in range(50, n, 50):
        base[i] = base[i - 1] * 0.999
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "label": np.zeros(n, dtype=np.int64),  # ONE cluster
            "embedding": [base[i] for i in range(n)],
        }
    )
    ds = ray.data.from_pandas(df)
    init = _init_centroids(ds)
    out = (
        # budget 100k cells with n=700 -> chunk ~142 rows -> 5 chunks
        semantic_dedup(
            ds, init, iters=1, tau2_num=9, tau2_den=10, pair_cell_budget=100_000
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # brute-force reference on the same integer quantization
    q = np.floor(base * 1000).astype(np.int64)
    nn = np.einsum("ij,ij->i", q, q)
    dot = q @ q.T
    sim = (dot > 0) & (10 * dot * dot > 9 * np.outer(nn, nn))
    expect_dropped = np.triu(sim, 1).any(axis=0)
    assert (out["kept"].to_numpy() == ~expect_dropped).all()
    assert (~out["kept"]).sum() >= 10  # the planted near-dups were found


def test_passage_dedup_matches_reference_on_random_corpora(ray_session):
    """Seeded random corpora vs a from-scratch reference implementation
    (independent chunking + corpus-wide count + rebuild), both branches."""
    import collections

    import ray.data

    from ocds_entity_extract_ray.ops.passages import dedup_passages

    rng = np.random.default_rng(77)
    vocab = [f"w{i}" for i in range(12)]
    W = 4
    for trial in range(4):
        texts = []
        for _ in range(25):
            n = int(rng.integers(0, 15))
            texts.append(" ".join(rng.choice(vocab, size=n)) if n else "x")
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

        # reference: chunk every doc, count FULL chunks corpus-wide,
        # drop every occurrence of any chunk seen twice, reassemble
        def chunks_of(t):
            ws = t.split(" ")
            full = [" ".join(ws[j * W : (j + 1) * W]) for j in range(len(ws) // W)]
            tail = [" ".join(ws[(len(ws) // W) * W :])] if len(ws) % W else []
            return full, tail

        counts = collections.Counter(
            c for t in texts for c in chunks_of(t)[0]
        )
        expect = {}
        for did, t in zip(df["doc_id"], texts):
            full, tail = chunks_of(t)
            kept = [c for c in full if counts[c] <= 1] + tail
            expect[did] = (
                len(full) + len(tail),
                sum(1 for c in full if counts[c] > 1),
                " ".join(kept) if kept else None,
            )

        for kwargs in ({}, {"broadcast_max_dups": 0, "num_buckets": 3}):
            got = (
                dedup_passages(
                    ray.data.from_pandas(df).repartition(3),
                    words_per_passage=W,
                    **kwargs,
                )
                .to_pandas()
                .sort_values("doc_id")
            )
            for _, r in got.iterrows():
                want = expect[r["doc_id"]]
                assert (r["n_passages"], r["n_dropped"]) == want[:2], (trial, kwargs)
                cleaned = r["cleaned_text"] if pd.notna(r["cleaned_text"]) else None
                assert cleaned == want[2], (trial, kwargs, r["doc_id"])


# --- sliding-window span dedup (ExactSubstr at every offset) ------------------

S = "s1 s2 s3 s4"  # the planted shared 4-word span


@pytest.fixture(scope="module")
def span_corpus(ray_session):
    rows = [
        # span at offset 0 (chunk-aligned)
        {"doc_id": 1, "text": S + " u1 u2"},
        # the SAME span at offset 2 — straddles the stride-4 chunk
        # boundary, so dedup_passages(words_per_passage=4) cannot see it
        {"doc_id": 2, "text": "p1 p2 " + S + " p3"},
        # shorter than the window: untouched even though it is a prefix
        # of the duplicated span
        {"doc_id": 3, "text": "s1 s2 s3"},
        # within-document duplicate: both occurrences cover every word
        {"doc_id": 4, "text": S + " " + S},
        # fully unique
        {"doc_id": 5, "text": "q1 q2 q3 q4 q5"},
    ]
    return ray.data.from_pandas(pd.DataFrame(rows))


EXPECTED_SPANS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "n_words": [6, 7, 3, 8, 5],
        "dup_words": [4, 4, 0, 8, 0],
        "cleaned_text": ["u1 u2", "p1 p2 p3", "s1 s2 s3", None, "q1 q2 q3 q4 q5"],
    }
)


def _normalize_spans(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_words", "dup_words"):
        out[c] = out[c].astype(np.int64)
    out["cleaned_text"] = out["cleaned_text"].where(out["cleaned_text"].notna(), None)
    return out


def test_span_dedup_planted_catches_straddling_span(span_corpus):
    from ocds_entity_extract_ray.ops.passages import dedup_spans

    got = _normalize_spans(dedup_spans(span_corpus, window_words=4).to_pandas())
    pd.testing.assert_frame_equal(got, EXPECTED_SPANS)


def test_span_dedup_join_branch_parity(span_corpus):
    from ocds_entity_extract_ray.ops.passages import dedup_spans

    got = _normalize_spans(
        dedup_spans(
            span_corpus, window_words=4, force_branch="join", num_buckets=4
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, EXPECTED_SPANS)


def test_span_dedup_closes_the_chunk_alignment_gap(span_corpus):
    """The gap dedup_spans exists to close: stride-4 passage chunking
    leaves doc 2's straddling copy of the span fully intact."""
    got = _normalize(dedup_passages(span_corpus, words_per_passage=4).to_pandas())
    doc2 = got[got["doc_id"] == 2].iloc[0]
    assert doc2["n_dropped"] == 0 and S in doc2["cleaned_text"]


def test_span_dedup_rejects_degenerate_window(span_corpus):
    from ocds_entity_extract_ray.ops.passages import dedup_spans

    with pytest.raises(ValueError, match="window_words"):
        dedup_spans(span_corpus, window_words=1)


def test_span_and_line_dedup_join_branch_zero_dups(ray_session):
    """Forced join branch on a duplicate-free corpus: the blob side is a
    ZERO-block dataset (schema None) that acero would reject — both ops
    must short-circuit to the identity rebuild instead of joining."""
    from ocds_entity_extract_ray.ops.passages import dedup_lines, dedup_spans

    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e", "f g h i j"]})
    )
    spans = _normalize_spans(
        dedup_spans(docs, window_words=4, force_branch="join", num_buckets=4).to_pandas()
    )
    assert list(spans["dup_words"]) == [0, 0]
    assert list(spans["cleaned_text"]) == ["a b c d e", "f g h i j"]

    lines = (
        dedup_lines(docs, words_per_line=2, force_branch="join", num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(lines["n_dropped"].astype(int)) == [0, 0]
    assert list(lines["clean_text"]) == ["a b\nc d\ne", "f g\nh i\nj"]
