"""Hybrid sampling + SQP solver (the north-star MPC engine).

MPPI explores globally (contact-mode discovery: which foot, when to strike);
the SQP/iLQR stage polishes the winner with gradient information.  The
classical walking engine (bez_isaacgym_tpu.control) can warm-start the
nominal sequence (SURVEY.md §7 Phase 4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bez_isaacgym_tpu.solvers.mppi import MPPIConfig, MPPISolver, MPPIState
from bez_isaacgym_tpu.solvers.sqp import SQPConfig, SQPSolver, SQPState
from bez_isaacgym_tpu.tasks.base import BezTask, EnvState


class HybridState(NamedTuple):
    mppi: MPPIState
    sqp: SQPState


class HybridSolver:

    def __init__(self, task: BezTask, mppi_cfg: MPPIConfig | None = None,
                 sqp_cfg: SQPConfig | None = None, use_sqp: bool = True,
                 prior_fn=None):
        mppi_cfg = mppi_cfg or MPPIConfig()
        sqp_cfg = sqp_cfg or SQPConfig(horizon=mppi_cfg.horizon)
        assert sqp_cfg.horizon == mppi_cfg.horizon
        if prior_fn is not None and use_sqp:
            # With a policy prior MPPI's nominal is a closed-loop RESIDUAL;
            # there is no per-solve absolute open-loop sequence for the SQP
            # stage to polish (each sample's executed actions depend on its
            # own state trajectory through the prior).
            raise ValueError("policy prior_fn is MPPI-only; set use_sqp=False")
        self.task = task
        self.mppi = MPPISolver(task, mppi_cfg, prior_fn=prior_fn)
        self.sqp = SQPSolver(task, sqp_cfg)
        self.use_sqp = use_sqp

    def init_state(self) -> HybridState:
        return HybridState(mppi=self.mppi.init_state(),
                           sqp=self.sqp.init_state())

    def warm_start(self, state: HybridState,
                   nominal: jnp.ndarray) -> HybridState:
        """Seed both stages with an (S,H,nu) reference action sequence
        (e.g. baked from control.SoccerbotController.plan_joint_trajectory)."""
        return HybridState(mppi=MPPIState(nominal=nominal),
                           sqp=SQPState(nominal=nominal))

    def solve(self, env_states: EnvState, state: HybridState, key):
        _, mppi_state, info = self.mppi.solve(env_states, state.mppi, key)
        if not self.use_sqp:
            return (mppi_state.nominal[:, 0],
                    HybridState(mppi=mppi_state, sqp=state.sqp), info)
        actions, sqp_state, sqp_info = self.sqp.solve(
            env_states, SQPState(nominal=mppi_state.nominal))
        info = {**info, **sqp_info}
        # Keep the polished sequence as next round's sampling nominal.
        new_state = HybridState(mppi=MPPIState(nominal=sqp_state.nominal),
                                sqp=sqp_state)
        return actions, new_state, info
