"""Incremental streaming-window state store (ops/streaming.py): the
incremental==batch theorem across arbitrary contiguous splits, plus the
exactly-once / crash-recovery protocol."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ocds_entity_extract_ray.ops.streaming import (
    windowed_ingest_tick,
    windowed_state,
)
from ocds_entity_extract_ray.ops.windows import tumbling_window_late


def _events(n: int = 400) -> pd.DataFrame:
    # deterministic log with real out-of-order arrivals: event times jump
    # back up to 20 days while arrival order is an md5-style interleave
    import hashlib

    rng = np.random.RandomState(7)
    ts = pd.Timestamp("2023-01-01").value // 1000 + np.cumsum(
        rng.randint(0, 86_400_000_000 // 4, n)
    )
    back = rng.randint(0, 20 * 86_400_000_000, n) * (rng.rand(n) < 0.3)
    ts = ts - back
    arr = np.array(
        [
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
            for i in range(n)
        ],
        dtype=np.uint64,
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": np.array(["a", "b", "c"])[rng.randint(0, 3, n)],
            "ts": pd.to_datetime(ts, unit="us"),
            "value": rng.randint(0, 10_000, n) / 100.0,
            "arrival_seq": arr,
        }
    )


def _sorted_tuples(df: pd.DataFrame):
    return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))


@pytest.mark.parametrize("cuts", [(0.5,), (0.2, 0.7), (0.33, 0.34, 0.9)])
def test_incremental_equals_single_pass(ray_session, tmp_path, cuts):
    df = _events()
    lateness = pd.Timedelta(days=7)
    batch = tumbling_window_late(
        ray.data.from_pandas(df), freq="D", lateness=lateness
    )

    # split by arrival-order QUANTILES so ticks are contiguous in arrival
    order = df.sort_values(["arrival_seq", "event_id"]).reset_index(drop=True)
    idx = [0] + [int(c * len(order)) for c in cuts] + [len(order)]
    state = str(tmp_path / "state")
    for i in range(len(idx) - 1):
        tick = order.iloc[idx[i] : idx[i + 1]]
        windowed_ingest_tick(
            state,
            ray.data.from_pandas(tick.reset_index(drop=True)),
            tick_id=f"t{i}",
            freq="D",
            lateness=lateness,
        )
    inc = windowed_state(state)
    assert _sorted_tuples(inc) == _sorted_tuples(batch)


def test_reapply_and_interleave_protocol(ray_session, tmp_path):
    df = _events(100)
    state = str(tmp_path / "state")
    half = df.sort_values(["arrival_seq", "event_id"]).reset_index(drop=True)
    r1 = windowed_ingest_tick(
        state, ray.data.from_pandas(half.iloc[:50]), tick_id="t0", freq="D"
    )
    assert r1["status"] == "applied" and r1["buckets_touched"] > 0
    before = windowed_state(state)
    # exactly-once: re-applying the same tick is a no-op
    r2 = windowed_ingest_tick(
        state, ray.data.from_pandas(half.iloc[:50]), tick_id="t0", freq="D"
    )
    assert r2["status"] == "already_applied"
    assert windowed_state(state).equals(before)
    # config mismatch is refused
    with pytest.raises(ValueError, match="config mismatch"):
        windowed_ingest_tick(
            state, ray.data.from_pandas(half.iloc[50:]), tick_id="t1", freq="h"
        )


def test_crash_mid_swap_recovers(ray_session, tmp_path, monkeypatch):
    import ocds_entity_extract_ray.ops.streaming as st

    df = _events(200)
    order = df.sort_values(["arrival_seq", "event_id"]).reset_index(drop=True)
    state = str(tmp_path / "state")
    windowed_ingest_tick(
        state, ray.data.from_pandas(order.iloc[:100]), tick_id="t0", freq="D"
    )

    # batch reference over both ticks
    batch = tumbling_window_late(
        ray.data.from_pandas(order), freq="D", lateness=pd.Timedelta(days=14)
    )

    # crash DURING the swap of tick t1: let one bucket swap, then die
    real_replace = st.os.replace
    calls = {"n": 0}

    def dying_replace(src, dst):
        if "_stage" in src:
            calls["n"] += 1
            if calls["n"] > 1:
                raise RuntimeError("simulated crash mid-swap")
        return real_replace(src, dst)

    monkeypatch.setattr(st.os, "replace", dying_replace)
    with pytest.raises(RuntimeError, match="simulated crash"):
        windowed_ingest_tick(
            state, ray.data.from_pandas(order.iloc[100:]), tick_id="t1", freq="D"
        )
    monkeypatch.setattr(st.os, "replace", real_replace)

    # a DIFFERENT tick is refused while t1 is staged
    with pytest.raises(RuntimeError, match="staged but not applied"):
        windowed_ingest_tick(
            state, ray.data.from_pandas(order.iloc[100:]), tick_id="t2", freq="D"
        )
    # and so is READING the half-swapped state (torn totals)
    with pytest.raises(RuntimeError, match="staged but not fully applied"):
        windowed_state(state)
    # re-applying t1 finishes the swap from the stage (no recompute)
    r = windowed_ingest_tick(
        state, ray.data.from_pandas(order.iloc[100:]), tick_id="t1", freq="D"
    )
    assert r["status"] == "recovered"

    inc = windowed_state(state)

    def key(d):
        return sorted(map(tuple, d[sorted(d.columns)].itertuples(index=False)))

    assert key(inc) == key(batch)


def test_seeded_watermark_changes_lateness(ray_session):
    """initial_watermark_us must actually gate: with a watermark far in
    the future every event is late; with the default none are."""
    df = _events(50)
    ds = ray.data.from_pandas(df)
    future = int(pd.Timestamp("2030-01-01").value // 1000)
    all_late = tumbling_window_late(
        ds, freq="D", lateness=pd.Timedelta(days=7), initial_watermark_us=future
    )
    assert int(all_late["n_events"].sum()) == 0
    assert int(all_late["n_late"].sum()) == len(df)
