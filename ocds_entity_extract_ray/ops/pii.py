"""PII redaction — the scrub pass every web-scale training-data pipeline
runs before anything else touches the text (reference has no equivalent;
this is part of the brief's training-data operator set).

Patterns are deliberately restricted to the regex subset where Python's
``re`` (used here, vectorized through pandas ``str`` kernels) and RE2
(used by the DuckDB oracle's ``regexp_replace``) produce byte-identical
results: character classes, bounded counted repetition, ASCII ``\\b`` —
no backreferences, no lookaround. Parity is pinned by tests on adversarial
inputs (overlong octets, trailing dots, nested matches).

Embarrassingly parallel: one stateless ``map_batches``, no shuffle; the
regexes compile once per worker at module import, not per batch.
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data

# (name, pattern, replacement token) — applied IN ORDER; order is part of
# the contract (an email is redacted before its digits could be misread
# as a phone fragment) and the SQL twin must chain identically.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_PATTERN, "<EMAIL>"),
    ("phones", PHONE_PATTERN, "<PHONE>"),
    ("ips", IPV4_PATTERN, "<IP>"),
)

_COMPILED = tuple((name, re.compile(pat), tok) for name, pat, tok in PII_RULES)


def redact_frame(batch: pd.DataFrame, text_col: str, out_col: str) -> pd.DataFrame:
    """Redact one pandas batch: returns a COPY of the frame with
    ``out_col`` (scrubbed text) and one nullable-int ``n_<rule>`` count
    column per rule appended — the input frame is not mutated. NULL text
    propagates as NULL redacted text and NULL counts, exactly like the
    SQL twin (``regexp_replace(NULL) -> NULL``). Usable inside any
    map_batches stage."""
    batch = batch.copy()
    nulls = batch[text_col].isna()
    s = batch[text_col].astype("string").fillna("")
    for name, rx, tok in _COMPILED:
        cnt = s.str.count(rx).astype("Int64")
        cnt[nulls] = pd.NA
        batch[f"n_{name}"] = cnt
        s = s.str.replace(rx, tok, regex=True)
    red = s.astype("string")
    red[nulls] = pd.NA
    batch[out_col] = red
    return batch


def redact_pii(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Scrub emails / phone numbers / IPv4 addresses from ``text_col``,
    replacing each with a typed token, and attach per-row match counts
    (``n_emails``, ``n_phones``, ``n_ips``). ``out_col`` defaults to
    replacing ``text_col`` in place.

    Scale: stateless map, zero shuffle, output row-for-row with input.
    """
    target = out_col or text_col

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        return redact_frame(batch, text_col, target)

    return ds.map_batches(apply, batch_format="pandas")


def pii_sql_expr(text_expr: str) -> str:
    """The DuckDB expression computing the same redaction as
    :func:`redact_frame` over ``text_expr`` — chained ``regexp_replace``
    in rule order."""
    expr = text_expr
    for _name, pat, tok in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{tok}', 'g')"
    return expr


def pii_count_sql_exprs(text_expr: str) -> dict[str, str]:
    """Per-rule DuckDB count expressions matching ``redact_frame``'s
    ``n_<rule>`` columns. Counts are computed against the text as it
    stood BEFORE that rule's replacement ran (rules chain)."""
    out: dict[str, str] = {}
    expr = text_expr
    for name, pat, tok in PII_RULES:
        out[f"n_{name}"] = f"len(regexp_extract_all({expr}, '{pat}'))::BIGINT"
        expr = f"regexp_replace({expr}, '{pat}', '{tok}', 'g')"
    return out
