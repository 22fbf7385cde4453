"""Relational conformance: every SQL-oracled query must match DuckDB
EXACTLY (the driver hashes values order-insensitively, so this test mimics
that: same row count, same column set, identical values after row sort)
— and DTYPE-STRICTLY: the twin must come back from DuckDB with the
engine's exact pandas dtype. Round 4 shipped 9 dtype-only driver/oracle
divergences (engine int64 vs DuckDB SUM(BIGINT)->HUGEINT->float64 etc.)
because both this test and tools/sweep_oracle.py normalized int dtypes
before comparing; the rule is now: ``::BIGINT`` every SUM / window /
iterative aggregate in the twin (COVERAGE.md dtype-discipline note)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocds_entity_extract_ray.pipelines.relational import ROWS_ONLY_QUERIES, SQL_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Only representation-level normalizations survive here (datetime
    fetch units, object-vs-pandas-string for the same VARCHAR values);
    numeric dtypes are compared STRICTLY below."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or isinstance(df[c].dtype, pd.StringDtype):
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_query_matches_duckdb(ray_session, duck, name):
    fn, sql = SQL_QUERIES[name]
    ray_df = fn(SF_DIR)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    duck_df = duck.sql(sql).df()

    assert len(ray_df) == len(duck_df), f"{name}: row count {len(ray_df)} vs {len(duck_df)}"
    assert sorted(ray_df.columns) == sorted(duck_df.columns), f"{name}: columns"
    a, b = _normalize(ray_df), _normalize(duck_df)
    for c in a.columns:
        assert str(a[c].dtype) == str(b[c].dtype), (
            f"{name}: dtype mismatch col={c}: engine={a[c].dtype} "
            f"oracle={b[c].dtype} — cast the twin (::BIGINT the aggregate) "
            "or normalize the engine column; see COVERAGE.md dtype note"
        )
    pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True, obj=name)


def test_no_unoracled_relational_queries():
    """Every relational query carries a DuckDB oracle (the former
    rows-only set — simhash/fingerprints/quality/langid/dup-pairs/sample —
    gained exact SQL twins via md5_number_lower + integer-operand ratios)
    EXCEPT the explicit estimator allowlist below: a HyperLogLog count is
    approximate by construction, so no SQL twin can hash-match it — its
    correctness evidence is the <5% error-bound + partition-independence
    pytest (test_ops.py). Anything else rows-only here is a regression."""
    ALLOWED = {
        # approximate by construction: no SQL twin can hash-match an HLL
        # estimate; evidence = <5% error bound + partition independence
        "q_source_distinct_hll",
        # iterative state rewriting (each BPE merge reshapes every word's
        # symbol sequence): not SQL-expressible; evidence = from-scratch
        # reference implementation parity (test_ops.py) + total
        # determinism order
        "q_bpe_merges",
        # BPE APPLY composes on the merge table above — same non-SQL
        # iterative merge order per word; evidence = the apply-parity
        # leg of test_ops.py::test_bpe_train_matches_reference (every
        # doc's count re-derived with the from-scratch tokenizer)
        "q_bpe_token_counts",
        # binary media payloads: no media table exists in the sf dirs and
        # pHash / spectral landmarks are not SQL-expressible; evidence =
        # the planted-pair ground-truth gate INSIDE each query
        # (_check_planted_pairs raises on any missed or false pair) plus
        # the robustness pytests (test_ops.py phash/audio/video suites)
        "q_image_dup_pairs",
        "q_audio_dup_pairs",
        "q_video_dup_pairs",
    }
    assert set(ROWS_ONLY_QUERIES) == ALLOWED


def test_late_events_rule_is_non_vacuous(ray_session):
    """The allowed-lateness watermark must actually split the corpus: a
    drop rule that never fires (monotone arrival) or always fires would
    pass the SQL twin trivially. Both sides populated at sf0.001."""
    fn, _sql = SQL_QUERIES["q_late_events"]
    out = fn(SF_DIR)
    assert int(out["n_late"].sum()) > 0
    assert int(out["n_events"].sum()) > 0
    # drop semantics: on-time sums exclude the late rows' value
    assert (out.loc[out["n_events"] == 0, "sum_value_cents"] == 0).all()


def test_driver_window_is_representative_cross_section():
    """The driver's correctness gate oracles exactly queries()[:50]; pin
    that prefix to DRIVER_WINDOW so it always covers the flagship KG
    pipeline plus one query per operator family, and stays overwhelmingly
    SQL-oracled (only the KG extractor entries are rows-only)."""
    import __ray_entry__ as e

    names = list(e.queries())
    assert len(e.DRIVER_WINDOW) == 50
    assert names[:50] == list(e.DRIVER_WINDOW)
    assert len(names) == len(set(names)), "duplicate query names"

    oracled = set(e.oracle_sql())
    rows_only_in_window = [n for n in names[:50] if n not in oracled]
    assert rows_only_in_window == [
        # KG extractor: conformance-tested vs the sequential oracle port
        "kg_triples",
        "kg_triples_from_warc",
        "kg_text_hashes",
        "kg_incremental_triples",
        # media dedup: planted-truth-gated (the query itself raises on a
        # missed planted duplicate or a false cross-group pair)
        "q_image_dup_pairs",
        "q_audio_dup_pairs",
        "q_video_dup_pairs",
    ]


def test_crawl_admission_funnel_is_non_vacuous(ray_session):
    """Every stage of the composed admission funnel must fire: frontier
    dedup collapses candidates below page count, the blocklist blocks,
    robots blocks domain-survivors, and something is still admitted."""
    fn, _sql = SQL_QUERIES["q_crawl_admission"]
    out = fn(SF_DIR)
    import pyarrow.parquet as _pq

    n_pages = _pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    assert n_pages > 0  # the dedup bound below must bind against reality
    assert int(out["n_candidates"].sum()) < n_pages
    assert int(out["n_blocked_domain"].sum()) > 0
    assert int(out["n_blocked_robots"].sum()) > 0
    assert int(out["n_admitted"].sum()) > 0
    # partition of the candidates
    assert (
        out["n_blocked_domain"] + out["n_blocked_robots"] + out["n_admitted"]
    ).equals(out["n_candidates"])
