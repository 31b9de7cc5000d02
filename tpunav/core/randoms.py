"""Deterministic, shardable random sampling helpers.

Replaces the reference's thread-unsafe singleton Mersenne twister
(ref: rigid2d/src/rigid2d/utilities.cpp:12-56) with counter-based
``jax.random`` keys: every rollout/particle derives its own key, so
sampling is reproducible and partitions cleanly across devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_normal(key, mean, std, shape=()):
    """Gaussian draw (ref: sampleNormalDistribution utilities.cpp:20-24)."""
    return mean + std * jax.random.normal(key, shape)


def sample_uniform(key, lo, hi, shape=()):
    """Uniform draw (ref: sampleUniformDistribution utilities.cpp:27-31)."""
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def sample_multivariate(key, cov, shape=()):
    """Zero-mean multivariate Gaussian via Cholesky of ``cov``
    (ref: sampleMultivariateDistribution utilities.cpp:46-56)."""
    n = cov.shape[-1]
    chol = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, (*shape, n), dtype=cov.dtype)
    return jnp.einsum("...ij,...j->...i", chol, z)


def euclidean_distance(x0, y0, x1, y1):
    """(ref: euclideanDistance utilities.cpp:59-63)."""
    return jnp.hypot(x1 - x0, y1 - y0)
