"""Batched device kernels (RK4, scans, raycasting, distance fields, ...)."""

from .rk4 import rk4_solve, rk4_step  # noqa: F401
