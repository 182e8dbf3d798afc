"""Trajectory optimization solvers: MPPI sampling + SQP/iLQR Gauss-Newton."""

from bez_isaacgym_tpu.solvers.mppi import MPPIConfig, MPPISolver  # noqa: F401
