"""On-TPU test gate (VERDICT r2 item 4): this suite runs on the REAL
chip — compiled Pallas kernels, in-kernel PRNG, f32 — so a Mosaic
lowering or precision break fails a test instead of silently perturbing
BENCH/RESULTS numbers.

Run with ``python -m pytest tests_tpu/ -q`` from the repo root (the
default environment platform — axon/TPU — is kept, unlike tests/ which
pins a virtual CPU mesh). Each round's bench should run only after this
suite is green. Compiles are cached via tpunav.runtime.cache.
"""

import pytest

from tpunav.runtime import cache as _cache

_cache.enable()

import jax  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="tests_tpu requires a TPU backend")
        for item in items:
            item.add_marker(skip)
