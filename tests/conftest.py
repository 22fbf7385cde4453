from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """Session-scoped Ray: ONE init for the whole pytest run."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


def normalize_numbers(obj, sig: int = 9):
    """Canonicalize numbers to ``sig`` SIGNIFICANT digits (absolute-decimal
    rounding breaks at 1e9 magnitudes where fp merge noise exceeds 1e-6) and
    collapse int/float, so docs merged in different orders compare equal."""
    if isinstance(obj, bool):
        return obj
    if isinstance(obj, (int, float)):
        r = float(f"{float(obj):.{sig}g}")
        return int(r) if r == int(r) else r
    if isinstance(obj, dict):
        return {k: normalize_numbers(v, sig) for k, v in obj.items()}
    if isinstance(obj, list):
        return [normalize_numbers(v, sig) for v in obj]
    return obj
