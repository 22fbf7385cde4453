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


def approx_equal(a, b, rel_tol: float = 1e-9, abs_tol: float = 1e-6) -> bool:
    """Recursive structural equality with float tolerance — canonical
    rounding (decimal or significant-digit) always has boundary values that
    straddle under fp merge noise; isclose does not."""
    import math

    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=abs_tol)
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(approx_equal(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(approx_equal(x, y) for x, y in zip(a, b))
    return a == b
