"""SQP / iLQR Gauss-Newton trajectory optimizer.

The second stage of the north-star hybrid solver (BASELINE.json): refine a
nominal action sequence (typically MPPI's or the classical walking engine's
output) by linearizing the differentiable physics along the trajectory
(forward-mode autodiff through ops.engine) and running a Riccati backward
pass + line-searched forward pass.  Everything is batched over S parallel
solves; the per-step Riccati recursion is a `lax.scan` over the horizon with
(nx+nu)-sized blocks sized for the MXU.

The physics step's compliant contacts and regularized friction are smooth,
so the linearization is well-defined everywhere (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bez_isaacgym_tpu.ops.engine import PhysicsState
from bez_isaacgym_tpu.tasks.base import BezTask, EnvState

F32 = jnp.float32

# Flattened physics-state layout (ball quat omitted: irrelevant to costs).
_FIELDS = (("q", 18), ("qd", 18), ("base_pos", 3), ("base_quat", 4),
           ("base_u", 6), ("ball_pos", 3), ("ball_vel", 3), ("ball_ang", 3))
NX = sum(n for _, n in _FIELDS)   # 58


def flatten_physics(ph: PhysicsState) -> jnp.ndarray:
    return jnp.concatenate([getattr(ph, name).reshape(-1)
                            for name, _ in _FIELDS])


def unflatten_physics(x: jnp.ndarray, template: PhysicsState) -> PhysicsState:
    out = template
    i = 0
    for name, n in _FIELDS:
        out = out._replace(**{name: x[i:i + n].astype(F32)})
        i += n
    return out


@dataclass(frozen=True)
class SQPConfig:
    horizon: int = 32              # BASELINE.md target horizon
    iterations: int = 3
    reg: float = 1e-3              # Levenberg-Marquardt regularization
    line_search: tuple = (1.0, 0.5, 0.25, 0.1)
    u_clip: float = 3.9
    parallel_riccati: bool = False  # associative-scan backward pass
                                   # (solvers/riccati.py; O(log H) depth).
                                   # Pays off for large solve batches; at
                                   # the production S<=16 the sequential
                                   # scan is 2.2x faster on-chip (30 vs
                                   # 67 ms, round-4 profile), so off by
                                   # default.
    linearize: str = "struct"      # "struct" (default): structured
                                   # forward-mode Jacobian — per-substep
                                   # jax.linearize over the 58 STATE
                                   # tangents only (the SPD solve carries a
                                   # custom JVP that REUSES the primal
                                   # Cholesky factor,
                                   # ops/linalg.py:solve_spd_shared_factor,
                                   # dx = H^-1(db - dH x)), plus a
                                   # CLOSED-FORM control column: u enters
                                   # the substep ONLY through the Stable-PD
                                   # torque (ops/engine.py:201-206), so
                                   # B_sub = d(integrate)/d(udot) .
                                   #         H^-1 S diag(kp . clip masks)
                                   # — 18 triangular substitutions against
                                   # the SAME primal factor and a cheap
                                   # integrate JVP; no FK/contact/dH work
                                   # for the control tangents (round-5;
                                   # round 4 pushed all 76 (x,u) tangents
                                   # through the full substep JVP).
                                   # Substep Jacobians are chained by
                                   # matmul composition inside a scan.
                                   # "struct_z": the round-4 form (all
                                   # NX+nu tangents through one linearize).
                                   # "jacfwd": one fused jacfwd over the
                                   # whole step (autodiff oracle).
                                   # "fd": central-difference oracle —
                                   # autodiff-free cross-check
                                   # (tests/test_solvers.py).
    fd_eps: float = 1e-3           # central-diff step: truncation O(h^2)
                                   # ~1e-6 vs f32 roundoff O(eps/h) ~1e-4
    warm_reg: float = 0.0          # trust-region tether: adds
                                   # 0.5*warm_reg*|u - u_warmstart|^2 per
                                   # step to the cost, so the polish stays
                                   # a strict local improvement around a
                                   # trusted nominal (e.g. a policy
                                   # rollout) instead of chasing the task
                                   # cost off-distribution.
    balance_weight: float = 0.0    # subtracts balance_weight *
                                   # balance_score(state) from the cost
                                   # (solvers/mppi.py balance_score): the
                                   # same stability shaping that fixed the
                                   # MPPI kick's fall rate, available to
                                   # the gradient stage.
    relinearize_every: int = 1     # k > 1: frozen-Jacobian (inexact)
                                   # Gauss-Newton — iterations whose index
                                   # is not a multiple of k REUSE the last
                                   # dynamics linearization and only redo
                                   # the (cheap, physics-free) cost
                                   # quadraticization + backward/forward
                                   # passes.  The line search scores the
                                   # TRUE rollout cost, so descent is exact
                                   # regardless of Jacobian staleness; near
                                   # the solution the nominal moves little
                                   # and the stale A,B stay accurate.  This
                                   # is the lever that brings 2-iteration
                                   # solves inside the 10 ms budget
                                   # (docs/STATUS.md round-4 gap #2).


class SQPState(NamedTuple):
    nominal: jnp.ndarray           # (H, nu)


class SQPSolver:
    """Batched iLQR: solve(env_states, sqp_states) -> refined first actions."""

    def __init__(self, task: BezTask, cfg: SQPConfig = SQPConfig()):
        import dataclasses

        from bez_isaacgym_tpu.ops.engine import make_step_fn

        self.task = task
        self.cfg = cfg
        self.nu = task.num_actions
        # One-substep step function (dt = control_dt / substeps): the
        # rollouts scan it `substeps` times and the structured linearization
        # composes per-substep Jacobians through the same scan, so the
        # substep body is traced/compiled ONCE per context instead of
        # unrolled `substeps` times (compile-time lever, VERDICT r3 item 1).
        self.n_sub = task.scene.substeps
        sub_scene = dataclasses.replace(
            task.scene, dt=task.scene.dt / self.n_sub, substeps=1)
        self._sub_scene = sub_scene
        self._substep_fn = make_step_fn(task.model, sub_scene)
        from bez_isaacgym_tpu.ops import kinematics as _kin
        self._kin_mask = _kin.ancestor_mask(task.model)

    def init_state(self) -> SQPState:
        return SQPState(nominal=jnp.zeros((self.cfg.horizon, self.nu), F32))

    # -- single-env step/cost in flattened coordinates ----------------------
    def _targets(self, u: jnp.ndarray) -> jnp.ndarray:
        task = self.task
        uc = jnp.clip(u, -self.cfg.u_clip, self.cfg.u_clip).at[0:2].set(0.0)
        return jnp.clip(uc + task.default_dof_pos,
                        task.dof_lower, task.dof_upper)

    def _f(self, env_state: EnvState, x: jnp.ndarray, u: jnp.ndarray):
        targets = self._targets(u)
        ph = unflatten_physics(x, env_state.physics)
        ph2, _ = jax.lax.scan(
            lambda s, _: (self._substep_fn(env_state.dyn, s, targets), None),
            ph, None, length=self.n_sub)
        return flatten_physics(ph2)

    def _f_sub(self, env_state: EnvState, x: jnp.ndarray, u: jnp.ndarray):
        """ONE substep in flattened coordinates (linearization unit)."""
        ph = unflatten_physics(x, env_state.physics)
        ph2 = self._substep_fn(env_state.dyn, ph, self._targets(u))
        return flatten_physics(ph2)

    def _cost(self, env_state: EnvState, x: jnp.ndarray, u: jnp.ndarray):
        ph = unflatten_physics(x, env_state.physics)
        s = env_state._replace(physics=ph)
        reward, _ = self.task.reward_done(s, u)
        if self.cfg.balance_weight:
            from bez_isaacgym_tpu.solvers.mppi import balance_score
            reward = reward + self.cfg.balance_weight * balance_score(ph)
        return -reward

    def linearize_dynamics(self, env_state: EnvState, x: jnp.ndarray,
                           u: jnp.ndarray):
        """(A (NX,NX), B (NX,nu)): Jacobian of the step at (x, u).

        cfg.linearize selects the structured forward-mode Jacobian
        (default — shared-factor solve JVP, see SQPConfig) or the
        central-difference oracle; parity between the two is pinned by
        tests/test_solvers.py::test_fd_linearization_matches_jacfwd."""
        cfg = self.cfg
        z = jnp.concatenate([x, u])
        nz = NX + self.nu

        def f(zz):
            return self._f(env_state, zz[:NX], zz[NX:])

        if cfg.linearize == "struct":
            # Chain-rule composition of per-substep Jacobians inside a
            # scan: J_0 = [I | 0]; J_{k+1} = A_k J_k + [0 | B_k].
            # A_k: ONE jax.linearize of the substep w.r.t. the 58 STATE
            # coordinates (primal shared across tangents; the SPD solve
            # tangent reuses the primal Cholesky factor via
            # ops.linalg.solve_spd_shared_factor).  B_k: closed-form — the
            # control enters only the Stable-PD torque
            # (ops/engine.py:201-206), so dtau/du is a masked diagonal and
            # B_k = d(integrate)/d(udot) . H^-1 S diag(kp . masks): 18
            # substitutions against the SAME factor, no FK/contact/dH
            # tangent work.  Parity with jacfwd/fd is pinned by
            # tests/test_solvers.py.
            import numpy as np

            from bez_isaacgym_tpu.ops import engine
            from bez_isaacgym_tpu.ops.linalg import (cholesky_factor_unrolled,
                                                     cholesky_substitute)

            task = self.task
            model, sub_scene = task.model, self._sub_scene
            kmask = self._kin_mask
            dyn_params = env_state.dyn
            h = sub_scene.dt
            nv = 6 + model.nq
            perm = np.concatenate([np.arange(6, nv), np.arange(6)])
            iperm = np.argsort(perm)
            eye_x = jnp.eye(NX, dtype=F32)
            J0 = jnp.concatenate(
                [eye_x, jnp.zeros((NX, self.nu), F32)], axis=1)  # [I|0]
            targets = self._targets(u)

            def substep_ext(xx):
                """The substep (engine._substep semantics) returning the
                primal pieces the control column needs."""
                from bez_isaacgym_tpu.ops.linalg import \
                    solve_spd_shared_factor

                ph = unflatten_physics(xx, env_state.physics)
                H_eff, tau, aux = engine._prepare(
                    model, sub_scene, kmask, dyn_params, ph, targets, h)
                Hs = 0.5 * (H_eff + H_eff.T)
                Hp = Hs[perm][:, perm]
                udot = solve_spd_shared_factor(Hp, tau[perm])[iperm]
                ph2 = engine._integrate(model, sub_scene, dyn_params, ph,
                                        udot, aux, h)
                return flatten_physics(ph2), (Hp, udot, aux, ph)

            def body(carry, _):
                x_k, J = carry
                (y, (Hp, udot, aux, ph)), jvp = jax.linearize(
                    substep_ext, x_k)
                A_k = jax.vmap(lambda e: jvp(e)[0])(eye_x).T   # (NX, NX)

                # Control column.  dtau_pd/du = kp on the unclipped set:
                # |u| < u_clip (head rows zeroed, _targets), targets inside
                # the DOF limits, |tau_pd| < effort (ops/engine.py:201-202).
                kp = jnp.asarray(dyn_params.kp, F32)
                kd = jnp.asarray(dyn_params.kd, F32)
                effort = jnp.asarray(dyn_params.effort, F32)
                tau_pd = kp * (targets - ph.q) - (h * kp + kd) * ph.qd
                m = ((jnp.abs(u) < cfg.u_clip)
                     & (targets > task.dof_lower) & (targets < task.dof_upper)
                     & (jnp.abs(tau_pd) < effort)).astype(F32)
                m = m.at[0:2].set(0.0)                    # head zeroed
                dtau = jnp.zeros((nv, self.nu), F32).at[6:, :].set(
                    jnp.diag(kp * m))
                L, inv_diag = cholesky_factor_unrolled(Hp)
                dudot = jax.vmap(
                    lambda col: cholesky_substitute(L, inv_diag, col),
                    in_axes=1, out_axes=1)(dtau[perm])[iperm]  # (nv, nu)
                _, int_jvp = jax.linearize(
                    lambda ud: flatten_physics(engine._integrate(
                        model, sub_scene, dyn_params, ph, ud, aux, h)),
                    udot)
                B_k = jax.vmap(int_jvp, in_axes=1, out_axes=1)(dudot)

                J_new = A_k @ J
                J_new = J_new.at[:, NX:].add(B_k)
                return (y, J_new), None

            (_, J), _ = jax.lax.scan(body, (x, J0), None, length=self.n_sub)
        elif cfg.linearize == "struct_z":
            # Round-4 form: all NX+nu tangents through one substep JVP.
            eye_z = jnp.eye(nz, dtype=F32)
            J0 = eye_z[:NX]                                # (NX, nz) = [I|0]

            def body(carry, _):
                x_k, J = carry
                zz = jnp.concatenate([x_k, u])
                y, jvp = jax.linearize(
                    lambda w: self._f_sub(env_state, w[:NX], w[NX:]), zz)
                Js = jax.vmap(jvp)(eye_z).T                # (NX, nz)
                J_new = Js[:, :NX] @ J
                J_new = J_new.at[:, NX:].add(Js[:, NX:])
                return (y, J_new), None

            (_, J), _ = jax.lax.scan(body, (x, J0), None, length=self.n_sub)
        elif cfg.linearize == "jacfwd":
            J = jax.jacfwd(f)(z)
        else:
            h = cfg.fd_eps
            pert = jnp.eye(nz, dtype=F32) * h
            fp = jax.vmap(lambda e: f(z + e))(pert)      # (nz, NX)
            fm = jax.vmap(lambda e: f(z - e))(pert)
            J = ((fp - fm) / (2.0 * h)).T                # (NX, nz)
        return J[:, :NX], J[:, NX:]

    def _rollout_cost(self, env_state: EnvState, U: jnp.ndarray):
        """Total cost of a (H,nu) sequence from env_state (single env)."""
        def body(x, u):
            x2 = self._f(env_state, x, u)
            return x2, self._cost(env_state, x2, u)

        x0 = flatten_physics(env_state.physics)
        _, costs = jax.lax.scan(body, x0, U)
        return costs.sum()

    def _solve_one(self, env_state: EnvState, U: jnp.ndarray):
        cfg = self.cfg
        x0 = flatten_physics(env_state.physics)
        U_ws = U      # trust-region anchor: the warm-start sequence

        def tether(Us):
            """0.5*warm_reg*|U - U_ws|^2 (0 when warm_reg == 0)."""
            if cfg.warm_reg == 0.0:
                return 0.0
            return 0.5 * cfg.warm_reg * jnp.sum((Us - U_ws) ** 2)

        def rollout(U):
            """States BEFORE each action + the sequence's true (raw) cost."""
            def body(x, u):
                x2 = self._f(env_state, x, u)
                return x2, (x, self._cost(env_state, x2, u))
            _, (xs, costs) = jax.lax.scan(body, x0, U)
            return xs, costs.sum()

        def lin_dyn(xs, U):
            """Dynamics Jacobians along the nominal (the expensive half;
            struct/jacfwd/fd per linearize_dynamics)."""
            return jax.vmap(
                lambda xx, uu: self.linearize_dynamics(env_state, xx, uu)
            )(xs, U)

        def cost_grads(xs, U):
            """Cost quadraticization — always autodiff, no physics inside
            _cost, so this is cheap and is redone EVERY iteration (also on
            frozen-Jacobian ones, relinearize_every > 1)."""
            def g(x, u, u_ws):
                z = jnp.concatenate([x, u])
                gz = jax.grad(
                    lambda zz: self._cost(env_state, zz[:NX], zz[NX:]))(z)
                # Trust-region tether gradient (quadratic term is folded
                # into the backward pass's LM regularizer below).
                return gz[:NX], gz[NX:] + cfg.warm_reg * (u - u_ws)

            return jax.vmap(g)(xs, U, U_ws)

        def bf_pass(U, xs, base_cost, A, Bm, cx, cu):
            """Riccati backward + line-searched forward pass.

            Backward (Gauss-Newton: value Hessian from the LM-regularized
            linear model): the parallel variant evaluates the same
            recursion in O(log H) depth via associative scan
            (solvers/riccati.py; SURVEY.md §7 hard part 3) — worth it for
            large solve batches; at S<=16 the sequential scan measures
            2.2x faster (30 vs 67 ms, round-4 profile).  warm_reg joins the
            LM regularizer; the line search scores the TRUE tethered cost,
            so descent is exact (also under stale A,B from
            relinearize_every > 1)."""
            from bez_isaacgym_tpu.solvers.riccati import (parallel_backward,
                                                          sequential_backward)
            backward = (parallel_backward if cfg.parallel_riccati
                        else sequential_backward)
            ks, Ks = backward(A, Bm, cx, cu, cfg.reg + cfg.warm_reg)

            # Forward pass with feedback, line-searched over alpha.  Each
            # candidate also returns its pre-action states so the accepted
            # one seeds the next iteration without re-rolling.
            def forward(alpha):
                def body(x, inp):
                    u_n, x_n, k, K = inp
                    u = u_n + alpha * k + K @ (x - x_n)
                    u = jnp.clip(u, -cfg.u_clip, cfg.u_clip)
                    x2 = self._f(env_state, x, u)
                    return x2, (u, x, self._cost(env_state, x2, u))
                _, (Us, xs_c, costs) = jax.lax.scan(body, x0, (U, xs, ks, Ks))
                return Us, xs_c, costs.sum()

            cand_U, cand_xs, cand_raw = jax.vmap(forward)(
                jnp.asarray(cfg.line_search, F32))
            cand_c = cand_raw + jax.vmap(tether)(cand_U) \
                if cfg.warm_reg else cand_raw
            base_c = base_cost + tether(U)
            best = jnp.argmin(cand_c)
            improved = cand_c[best] < base_c
            U_new = jnp.where(improved, cand_U[best], U)
            xs_new = jnp.where(improved, cand_xs[best], xs)
            cost_new = jnp.where(improved, cand_raw[best], base_cost)
            return (U_new, xs_new, cost_new,
                    jnp.where(improved, cand_c[best], base_c))

        # The nominal trajectory xs and its raw cost ride across
        # iterations: the accepted line-search candidate IS the next
        # nominal, so only the FIRST iteration pays a dedicated rollout
        # (round-3 re-rolled the nominal every iteration — 35 ms of the
        # 476 ms per-iteration profile).
        xs0, cost0 = rollout(U)
        if cfg.relinearize_every == 1:
            def one_iteration(carry, _):
                U, xs, base_cost = carry
                A, Bm = lin_dyn(xs, U)
                cx, cu = cost_grads(xs, U)
                U2, xs2, c2, tc = bf_pass(U, xs, base_cost, A, Bm, cx, cu)
                return (U2, xs2, c2), tc

            (U_final, _, _), costs = jax.lax.scan(
                one_iteration, (U, xs0, cost0), None, length=cfg.iterations)
            return U_final, costs[-1]

        # Frozen-Jacobian (inexact) Gauss-Newton: unrolled so the
        # relinearize pattern is static — linearize is traced only for the
        # iterations that actually relinearize.
        U_c, xs_c, cost_c, tc = U, xs0, cost0, cost0
        A = Bm = None
        for k in range(cfg.iterations):
            if k % cfg.relinearize_every == 0:
                A, Bm = lin_dyn(xs_c, U_c)
            cx, cu = cost_grads(xs_c, U_c)
            U_c, xs_c, cost_c, tc = bf_pass(U_c, xs_c, cost_c, A, Bm, cx, cu)
        return U_c, tc

    def solve(self, env_states: EnvState, sqp_states: SQPState, key=None):
        """Batched solve over S parallel problems (vmap of _solve_one)."""
        U_new, cost = jax.vmap(self._solve_one)(env_states, sqp_states.nominal)
        actions = U_new[:, 0]
        shifted = jnp.concatenate([U_new[:, 1:], U_new[:, -1:]], axis=1)
        return actions, SQPState(nominal=shifted), {"cost": cost}
