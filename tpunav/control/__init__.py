"""Sampling-based MPC (MPPI) and waypoint management."""

from .mppi import MPPIConfig, MPPIController, init_controls, mppi_solve  # noqa: F401
from .slam_loop import (  # noqa: F401
    SlamLoopConfig,
    SlamLoopState,
    run_slam_loop,
    slam_loop_init,
    slam_loop_tick,
)
