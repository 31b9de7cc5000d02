"""Sampling-based MPC (MPPI) and waypoint management."""

from .mppi import MPPIConfig, MPPIController, init_controls, mppi_solve  # noqa: F401
