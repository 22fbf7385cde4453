"""Incremental streaming-window state store: micro-batch ingestion of an
event stream into persisted tumbling-window aggregates with an
allowed-lateness watermark carried ACROSS ticks.

``ops/windows.py:tumbling_window_late`` evaluates the standard streaming
drop rule over one batch log; this module makes it a resumable STREAM:
each tick (an arrival-contiguous slice of the log) merges its window
partials into an on-disk state directory and advances the persisted
watermark, so

    tick(s0, e[:a]); tick(s0, e[a:b]); tick(s0, e[b:])
    ==  tumbling_window_late(e)           (pytest-pinned, hash-exact)

— the theorem that makes the final state SQL-oracle-able even though it
was built incrementally. Correctness requires ticks to partition arrival
order contiguously and be applied in order (the watermark is a prefix
max; out-of-order application is refused by the journal).

Scale + crash-safety shape (the ``pipelines/kg_incremental.py`` protocol
in miniature):
- state is hash-bucketed parquet (md5 of (key, window) -> bucket), so a
  tick rewrites ONLY the buckets its windows touch — update cost tracks
  tick locality, not stream age;
- merged buckets are staged under ``_stage/`` first, ``meta.json`` flips
  to phase='staged' (tmp+``os.replace``), then buckets swap in, then meta
  commits phase='applied'. A crash mid-swap resumes by re-swapping the
  staged (already-merged) buckets — idempotent; a crash before staging
  completes leaves the applied state untouched.
- re-applying an applied tick_id is a no-op; applying a NEW tick while
  another is staged is refused (the interleave would clobber the stage).

The tick's own aggregate (windows x keys touched by the tick) is
driver-sized by construction — it is the OUTPUT of the distributed
window pass, not the event stream.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data

STATE_COLS = ["key", "window_start", "n_events", "sum_value_cents", "n_late"]

_EMPTY_STATE = pd.DataFrame(
    {
        "key": pd.Series(dtype="object"),
        "window_start": pd.Series(dtype="datetime64[us]"),
        "n_events": pd.Series(dtype="int64"),
        "sum_value_cents": pd.Series(dtype="int64"),
        "n_late": pd.Series(dtype="int64"),
    }
)


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "meta.json")


def _read_meta(state_dir: str) -> dict | None:
    try:
        with open(_meta_path(state_dir)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _write_meta(state_dir: str, meta: dict) -> None:
    tmp = _meta_path(state_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, _meta_path(state_dir))


def _bucket_ids(keys, windows_us, num_buckets: int) -> np.ndarray:
    from .textstats import _h64  # the repo-wide md5-low64 convention

    out = np.empty(len(keys), dtype=np.int64)
    for i, (k, w) in enumerate(zip(keys, windows_us)):
        out[i] = _h64(f"{k}\x00{int(w)}".encode()) % num_buckets
    return out


def _bucket_file(state_dir: str, b: int) -> str:
    return os.path.join(state_dir, f"part_{b:04d}.parquet")


def _merge_frames(old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
    both = pd.concat([old, new], ignore_index=True)
    out = (
        both.groupby(["key", "window_start"], as_index=False, sort=True)[
            ["n_events", "sum_value_cents", "n_late"]
        ].sum()
    )
    for c in ("n_events", "sum_value_cents", "n_late"):
        out[c] = out[c].astype("int64")
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out[STATE_COLS]


def _swap_in_stage(state_dir: str, meta: dict) -> None:
    stage = os.path.join(state_dir, "_stage")
    for name in sorted(meta["staged_files"]):
        src = os.path.join(stage, name)
        if os.path.exists(src):  # resume: some may already have swapped
            os.replace(src, os.path.join(state_dir, name))
    meta["phase"] = "applied"
    meta.pop("staged_files", None)
    _write_meta(state_dir, meta)
    try:
        os.rmdir(stage)
    except OSError:
        pass


def windowed_ingest_tick(
    state_dir: str,
    events: ray.data.Dataset,
    *,
    tick_id: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    arrival_col: str = "arrival_seq",
    id_col: str = "event_id",
    freq: str = "h",
    lateness: pd.Timedelta = pd.Timedelta(days=14),
    num_buckets: int = 16,
) -> dict:
    """Apply one arrival-contiguous tick to the state under ``state_dir``.
    Returns a report dict (status, buckets_touched, watermark_us)."""
    import pyarrow.parquet as pq

    from .windows import tumbling_window_late

    os.makedirs(state_dir, exist_ok=True)
    config = {
        "freq": freq,
        "lateness_us": int(lateness / pd.Timedelta(microseconds=1)),
        "num_buckets": num_buckets,
    }
    meta = _read_meta(state_dir)
    if meta is None:
        meta = {
            "phase": "applied",
            "watermark_us": -(2**62),
            "applied": [],
            **config,
        }
    for k, v in config.items():
        if meta[k] != v:
            raise ValueError(
                f"windowed_ingest_tick: config mismatch on {k!r}: state has "
                f"{meta[k]!r}, caller passed {v!r}"
            )
    if meta["phase"] == "staged":
        if meta.get("staging_tick") == tick_id:
            _swap_in_stage(state_dir, meta)  # crash recovery: finish the swap
            return {
                "status": "recovered",
                "watermark_us": meta["watermark_us"],
                "buckets_touched": 0,
            }
        raise RuntimeError(
            f"windowed_ingest_tick: tick {meta.get('staging_tick')!r} is "
            f"staged but not applied — recover it (re-apply the same tick) "
            f"before applying {tick_id!r}"
        )
    if tick_id in meta["applied"]:
        return {
            "status": "already_applied",
            "watermark_us": meta["watermark_us"],
            "buckets_touched": 0,
        }

    w0 = int(meta["watermark_us"])
    # the window pass's per-range max already holds the tick's high
    # watermark — no second execution of the events pipeline
    agg, tick_max = tumbling_window_late(
        events,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        arrival_col=arrival_col,
        id_col=id_col,
        freq=freq,
        lateness=lateness,
        initial_watermark_us=w0,
        return_high_watermark=True,
    )
    new_wm = w0 if tick_max is None else max(w0, int(tick_max))

    win_us = agg["window_start"].astype("datetime64[us]").astype("int64").to_numpy()
    agg = agg.assign(_b=_bucket_ids(agg["key"].to_numpy(), win_us, num_buckets))

    # stage every touched bucket's MERGED content, then commit. Stale
    # stage leftovers (a crash before the staged-phase meta write) are
    # discarded first — the applied state was never touched by them.
    import shutil

    stage = os.path.join(state_dir, "_stage")
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)
    staged = []
    for b, g in agg.groupby("_b", sort=True):
        name = f"part_{int(b):04d}.parquet"
        path = _bucket_file(state_dir, int(b))
        old = pd.read_parquet(path) if os.path.exists(path) else _EMPTY_STATE
        merged = _merge_frames(old, g[STATE_COLS])
        import pyarrow as pa

        pq.write_table(
            pa.Table.from_pandas(merged, preserve_index=False),
            os.path.join(stage, name),
        )
        staged.append(name)

    meta.update(
        phase="staged",
        staging_tick=tick_id,
        staged_files=staged,
        watermark_us=new_wm,
        applied=meta["applied"] + [tick_id],
    )
    _write_meta(state_dir, meta)
    _swap_in_stage(state_dir, meta)
    meta.pop("staging_tick", None)
    _write_meta(state_dir, meta)
    return {
        "status": "applied",
        "watermark_us": new_wm,
        "buckets_touched": len(staged),
    }


def windowed_state(state_dir: str) -> pd.DataFrame:
    """Current aggregate state, total-ordered (key, window_start).
    Refuses a half-swapped store: a crash mid-swap leaves some buckets
    merged and some not — no consistent tick boundary — so the staged
    tick must be re-applied (which finishes the swap) before reading."""
    meta = _read_meta(state_dir)
    if meta is not None and meta.get("phase") == "staged":
        raise RuntimeError(
            f"windowed_state: tick {meta.get('staging_tick')!r} is staged "
            f"but not fully applied — re-apply it to finish the swap "
            f"before reading"
        )
    files = sorted(
        f
        for f in os.listdir(state_dir)
        if f.startswith("part_") and f.endswith(".parquet")
    )
    if not files:
        return _EMPTY_STATE.copy()
    frames = [pd.read_parquet(os.path.join(state_dir, f)) for f in files]
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["key", "window_start"]).reset_index(drop=True)[STATE_COLS]
