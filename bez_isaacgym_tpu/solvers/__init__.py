"""Trajectory optimization solvers: MPPI sampling + SQP/iLQR Gauss-Newton,
and the hybrid that chains them (BASELINE.json north star)."""

from bez_isaacgym_tpu.solvers.mppi import MPPIConfig, MPPISolver, MPPIState  # noqa: F401
from bez_isaacgym_tpu.solvers.sqp import SQPConfig, SQPSolver, SQPState  # noqa: F401
from bez_isaacgym_tpu.solvers.hybrid import HybridSolver  # noqa: F401
