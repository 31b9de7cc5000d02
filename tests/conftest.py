"""Test configuration: run on a virtual 8-device CPU mesh in float64.

Multi-chip sharding tests use ``xla_force_host_platform_device_count=8``
(real multi-chip hardware isn't available in CI); parity tests against the
reference's hand-computed doubles need x64. Env vars MUST be set before jax
is imported anywhere, hence this top-level conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the outer env pins a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env's TPU plugin ignores JAX_PLATFORMS at import time; the config
# update below is what actually pins the test platform to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
