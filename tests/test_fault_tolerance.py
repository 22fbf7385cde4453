"""Fault-tolerance evidence: a transient task failure mid-pipeline must
be retried by Ray and leave the result byte-correct — the property the
100 TB design leans on (lineage re-execution instead of checkpoint-
restart for map stages; the KG pipeline's resumable writes cover the
sink side, tests/test_kg_pipeline.py).

Ray Data retries application exceptions only when the stage opts in
(``retry_exceptions=[...]`` passed through ``map_batches``); worker
deaths are always retried. The injected failure here raises exactly once
(a marker file makes the first attempt fail across whatever worker runs
it), so one task executes twice and the output must contain no
duplicate or missing rows.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import ray.data


def test_transient_task_failure_retries_without_dup_or_loss(ray_session):
    marker = os.path.join(tempfile.mkdtemp(), "boom_once")

    def flaky(batch: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise OSError("injected transient failure")
        return batch.assign(y=batch["x"] * 2)

    ds = ray.data.from_pandas(
        [
            pd.DataFrame({"x": np.arange(i * 100, (i + 1) * 100, dtype=np.int64)})
            for i in range(8)
        ]
    )
    out = ds.map_batches(
        flaky,
        batch_format="pandas",
        **{"retry_exceptions": [OSError], "max_retries": 3},
    ).to_pandas()

    assert os.path.exists(marker), "the failure was never injected"
    assert len(out) == 800  # no lost and no duplicated blocks
    assert sorted(out["x"].tolist()) == list(range(800))
    assert (out["y"] == out["x"] * 2).all()


def test_transient_failure_in_aggregation_is_exactly_once(ray_session):
    """The retried task's partial aggregate must not double-count."""
    from ocds_entity_extract_ray.ops.agg import grouped_agg

    marker = os.path.join(tempfile.mkdtemp(), "boom_once_agg")

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise OSError("injected transient failure")
        return batch

    ds = ray.data.from_pandas(
        [
            pd.DataFrame(
                {"k": np.arange(100, dtype=np.int64) % 7, "v": np.ones(100, dtype=np.int64)}
            )
            for _ in range(6)
        ]
    )
    # grouped_agg's partial runs inside map_batches; wrap via pre hook
    out = grouped_agg(
        ds.map_batches(
            pre, batch_format="pandas", **{"retry_exceptions": [OSError], "max_retries": 3}
        ),
        ["k"],
        {"n": ("v", "sum")},
        final="driver",
    )
    assert os.path.exists(marker)
    assert int(out["n"].sum()) == 600
