"""MPC solver unit tests: MPPI improvement, SQP cost decrease + line
search, hybrid warm start (VERDICT round-1 gap: the solver trio had zero
dedicated tests).

Kept tiny (short horizons, few samples, substeps=1) so they run on the CPU
backend; behavioral properties, not golden values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.solvers.hybrid import HybridSolver
from bez_isaacgym_tpu.solvers.mppi import MPPIConfig, MPPISolver, MPPIState
from bez_isaacgym_tpu.solvers.sqp import SQPConfig, SQPSolver, SQPState
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

F32 = jnp.float32


class QuadraticTask(KickTask):
    """Kick dynamics with a quadratic joint-tracking cost: reward responds
    directly and smoothly to actions, so solver-improvement properties are
    exact (the VERDICT-requested 'quadratic toy')."""

    def reward_done(self, state, action):
        err = state.physics.q - (self.default_dof_pos + 0.3)
        return -jnp.sum(err * err), jnp.zeros((), bool)


@pytest.fixture(scope="module")
def task():
    return KickTask(TaskConfig(substeps=1, use_pallas=False))


@pytest.fixture(scope="module")
def quad_task():
    return QuadraticTask(TaskConfig(substeps=1, use_pallas=False))


@pytest.fixture(scope="module")
def env1(task):
    """A single env (batch dim 1) from a fixed key."""
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    return jax.jit(jax.vmap(task.reset_one))(keys)


@pytest.fixture(scope="module")
def qenv1(quad_task):
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    return jax.jit(jax.vmap(quad_task.reset_one))(keys)


# ------------------------------------------------------------------- MPPI

def test_mppi_improves_bad_nominal(quad_task, qenv1):
    """The softmax-averaged nominal must score better than a deliberately
    bad nominal it started from (path-integral improvement property) on the
    quadratic toy cost."""
    cfg = MPPIConfig(horizon=6, num_samples=32, sigma=0.2)
    solver = MPPISolver(quad_task, cfg)

    def score_of(nominal):
        """Score a (1,H,nq) nominal by rolling it out (no noise)."""
        return float(jax.jit(solver._rollout_scores)(qenv1, nominal)[0][0])

    # -0.3 keeps every joint target interior to its limits (a larger offset
    # saturates the target clamp and makes all sampled rollouts identical).
    bad = jnp.full((1, cfg.horizon, quad_task.num_actions), -0.3, F32)
    base = score_of(bad)
    solve = jax.jit(solver.solve)
    _, mppi2, info = solve(qenv1, MPPIState(nominal=bad),
                           jax.random.PRNGKey(1))
    # Exact property: the best sampled sequence scores >= the sample mean.
    assert float(info["best_score"][0]) >= float(info["mean_score"][0])
    # The updated nominal (softmax average of samples) beats the bad one.
    assert score_of(mppi2.nominal) > base


def test_mppi_warm_nominal_raises_sample_mean(task, env1):
    """Warm-starting MPPI (nominal from a previous solve) must raise the
    mean sampled score vs a zero nominal — the mechanism HybridSolver's
    warm_start relies on."""
    cfg = MPPIConfig(horizon=6, num_samples=32, sigma=0.2)
    solver = MPPISolver(task, cfg)
    solve = jax.jit(solver.solve)
    cold = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                        solver.init_state())
    _, warm, info_cold = solve(env1, cold, jax.random.PRNGKey(3))
    _, _, info_warm = solve(env1, warm, jax.random.PRNGKey(3))
    assert float(info_warm["mean_score"][0]) > \
        float(info_cold["mean_score"][0])


def test_mppi_ess_in_range(task, env1):
    """Effective sample size must be in [1, K]."""
    cfg = MPPIConfig(horizon=4, num_samples=16)
    solver = MPPISolver(task, cfg)
    mppi = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                        solver.init_state())
    _, _, info = jax.jit(solver.solve)(env1, mppi, jax.random.PRNGKey(4))
    ess = float(info["ess"][0])
    assert 1.0 - 1e-5 <= ess <= cfg.num_samples + 1e-5


def test_mppi_policy_prior_is_the_floor(task, env1):
    """With a policy prior and sigma=0 every sample equals the closed-loop
    prior rollout, so the returned action must equal the prior's action at
    the current obs exactly (the 'policy is the floor' property the round-3
    kick fix relies on)."""
    prior_action = 0.12

    def prior_fn(obs):
        return jnp.full((obs.shape[0], task.num_actions), prior_action, F32)

    cfg = MPPIConfig(horizon=4, num_samples=4, sigma=0.0)
    solver = MPPISolver(task, cfg, prior_fn=prior_fn)
    mppi = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                        solver.init_state())
    actions, mppi2, info = jax.jit(solver.solve)(env1, mppi,
                                                 jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(actions),
                               prior_action, atol=1e-6)
    # Residual nominal stays zero when no noise is sampled.
    np.testing.assert_allclose(np.asarray(mppi2.nominal), 0.0, atol=1e-6)
    assert np.isfinite(float(info["best_score"][0]))


def test_mppi_balance_shaping_rewards_upright(task):
    """The balance-shaped rollout score must rank an upright stand above a
    fallen pose (the terminal/per-step stability terms added for the
    round-3 MPC kick fix)."""
    from bez_isaacgym_tpu.solvers.mppi import balance_score
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    env = jax.jit(jax.vmap(task.reset_one))(keys)
    fallen = jax.tree.map(lambda x: x, env)
    fallen = fallen._replace(physics=fallen.physics._replace(
        base_pos=fallen.physics.base_pos.at[:, 2].set(0.1),
        base_quat=jnp.asarray([[0.7071, 0.0, 0.0, 0.7071]], F32)))
    up_score = float(balance_score(env.physics)[0])
    down_score = float(balance_score(fallen.physics)[0])
    assert up_score > down_score
    assert up_score > 0.5  # a clean stand scores near +1


# -------------------------------------------------------------------- SQP

def test_sqp_cost_never_increases(task, env1):
    """Line-searched iLQR: the final cost must be <= the initial nominal's
    rollout cost (candidates are only accepted on improvement,
    sqp.py:158-161)."""
    cfg = SQPConfig(horizon=4, iterations=2)
    solver = SQPSolver(task, cfg)
    env0 = jax.tree.map(lambda x: x[0], env1)
    U0 = jnp.zeros((cfg.horizon, task.num_actions), F32)
    base_cost = float(jax.jit(solver._rollout_cost)(env0, U0))
    U_final, final_cost = jax.jit(solver._solve_one)(env0, U0)
    assert float(final_cost) <= base_cost + 1e-4


def test_sqp_improves_bad_nominal(quad_task, qenv1):
    """On the quadratic toy cost, SQP from a zero nominal must strictly
    reduce cost (drive joints toward the +0.3 offset targets)."""
    cfg = SQPConfig(horizon=4, iterations=2)
    solver = SQPSolver(quad_task, cfg)
    env0 = jax.tree.map(lambda x: x[0], qenv1)
    U0 = jnp.zeros((cfg.horizon, quad_task.num_actions), F32)
    base = float(jax.jit(solver._rollout_cost)(env0, U0))
    _, final_cost = jax.jit(solver._solve_one)(env0, U0)
    assert float(final_cost) < base


def test_sqp_frozen_jacobian_iterations_descend(quad_task, qenv1):
    """Frozen-Jacobian (inexact) Gauss-Newton (SQPConfig.relinearize_every):
    the 2-iteration frozen solve must (a) strictly beat the initial nominal
    (descent holds under stale A,B because the line search scores the TRUE
    rollout cost), (b) never be worse than the 1-iteration solve, and
    (c) land within 5% of the exact 2-iteration solve's cost improvement
    (on the quadratic toy one full GN step is already near-optimal, so the
    frozen second pass mostly confirms convergence)."""
    env0 = jax.tree.map(lambda x: x[0], qenv1)
    H = 4
    U0 = jnp.zeros((H, quad_task.num_actions), F32)

    def run(iterations, relin):
        solver = SQPSolver(quad_task, SQPConfig(
            horizon=H, iterations=iterations, relinearize_every=relin))
        _, cost = jax.jit(solver._solve_one)(env0, U0)
        return float(cost)

    solver = SQPSolver(quad_task, SQPConfig(horizon=H))
    base = float(jax.jit(solver._rollout_cost)(env0, U0))
    c1 = run(1, 1)
    c2_frozen = run(2, 2)
    c2_exact = run(2, 1)
    assert c2_frozen < base          # (a) strict descent from the nominal
    assert c2_frozen <= c1 + 1e-6    # (b) the frozen pass never regresses
    gain_exact = base - c2_exact
    gain_frozen = base - c2_frozen
    assert gain_frozen >= 0.95 * gain_exact - 1e-6   # (c)


def test_sqp_warm_reg_tethers_to_warm_start(quad_task, qenv1):
    """Trust-region tether (sqp.py warm_reg): with a huge tether the solve
    must stay at the warm start; with a moderate one it must move less
    than the untethered solve while still descending the TETHERED cost."""
    env0 = jax.tree.map(lambda x: x[0], qenv1)
    H = 4
    U0 = 0.1 * jnp.ones((H, quad_task.num_actions), F32)

    def run(warm_reg):
        solver = SQPSolver(quad_task, SQPConfig(horizon=H, iterations=2,
                                                warm_reg=warm_reg))
        U, cost = jax.jit(solver._solve_one)(env0, U0)
        return np.asarray(U), float(cost)

    U_free, _ = run(0.0)
    U_soft, _ = run(1.0)
    U_hard, _ = run(1e6)
    dev = lambda U: float(np.abs(U - np.asarray(U0)).max())  # noqa: E731
    assert dev(U_hard) < 1e-3               # pinned to the warm start
    assert dev(U_soft) < dev(U_free) + 1e-6  # tether shrinks the step
    assert dev(U_free) > 1e-3               # untethered solve does move


def test_sqp_batched_solve_shapes(task, env1):
    cfg = SQPConfig(horizon=3, iterations=1)
    solver = SQPSolver(task, cfg)
    sqp = SQPState(nominal=jnp.zeros((1, cfg.horizon, task.num_actions), F32))
    actions, sqp2, info = jax.jit(solver.solve)(env1, sqp)
    assert actions.shape == (1, task.num_actions)
    assert sqp2.nominal.shape == sqp.nominal.shape
    assert np.isfinite(float(info["cost"][0]))


def test_fd_linearization_matches_jacfwd(task, env1):
    """The default central-difference dynamics Jacobian (compile-time fix
    for the round-2 jacfwd hog) must match the exact jacfwd Jacobian
    (VERDICT r2 item 3: 'a parity test of the analytic linearization vs
    jacfwd').

    Parity is checked tightly on a contact-free state (dynamics smooth
    everywhere).  In contact, the stiff normal-force model is kinked at
    corner activation boundaries, so the FD secant deliberately smooths
    what jacfwd measures pointwise — there only the control Jacobian
    (which never crosses a contact boundary at these magnitudes) is pinned."""
    from bez_isaacgym_tpu.solvers.sqp import flatten_physics

    env0 = jax.tree.map(lambda x: x[0], env1)
    u = 0.05 * jnp.sin(jnp.arange(task.num_actions, dtype=F32))
    fd = SQPSolver(task, SQPConfig(horizon=4, linearize="fd"))
    ad = SQPSolver(task, SQPConfig(horizon=4, linearize="jacfwd"))

    # --- airborne: smooth dynamics, full-matrix parity -------------------
    # Also keep every OTHER kink out of the +-h window: joint velocities
    # well away from 0 (regularized Coulomb friction's steep zone) and
    # joint targets near q (PD torque interior to the effort clamp).
    air = env0._replace(physics=env0.physics._replace(
        base_pos=env0.physics.base_pos.at[2].set(0.6),
        q=task.default_dof_pos,
        qd=jnp.full(task.num_actions, 0.4, F32),
        # Ball well clear of the plane AND of the robot's collision boxes
        # (any active contact pair is a kink FD would smooth over).
        ball_pos=jnp.asarray([5.0, 0.0, 0.5], F32)))
    x_air = flatten_physics(air.physics)
    A_fd, B_fd = jax.jit(fd.linearize_dynamics)(air, x_air, u)
    A_ad, B_ad = jax.jit(ad.linearize_dynamics)(air, x_air, u)
    np.testing.assert_allclose(np.asarray(A_fd), np.asarray(A_ad),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(B_fd), np.asarray(B_ad),
                               atol=2e-2, rtol=2e-2)
    # Head-motor columns are zeroed by the action pipeline in both.
    np.testing.assert_allclose(np.asarray(B_ad[:, 0:2]), 0.0, atol=1e-6)

    # --- in contact: the control Jacobian still agrees -------------------
    x = flatten_physics(env0.physics)
    _, B_fd_c = jax.jit(fd.linearize_dynamics)(env0, x, u)
    _, B_ad_c = jax.jit(ad.linearize_dynamics)(env0, x, u)
    np.testing.assert_allclose(np.asarray(B_fd_c), np.asarray(B_ad_c),
                               atol=2e-2, rtol=2e-2)

    # --- struct (production default) == jacfwd, everywhere ---------------
    # Both are exact pointwise derivatives (chain-rule composition of
    # per-substep linearizations vs one fused forward-mode pass), so the
    # parity bound is tight and holds IN CONTACT too — this pins the
    # shared-factor solve JVP (ops/linalg.py:solve_spd_shared_factor) and
    # the scan composition against plain autodiff (VERDICT r3 item 1's
    # linearization-parity requirement).
    st = SQPSolver(task, SQPConfig(horizon=4, linearize="struct"))
    A_st, B_st = jax.jit(st.linearize_dynamics)(air, x_air, u)
    np.testing.assert_allclose(np.asarray(A_st), np.asarray(A_ad),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(B_st), np.asarray(B_ad),
                               atol=1e-4, rtol=1e-3)
    A_st_c, B_st_c = jax.jit(st.linearize_dynamics)(env0, x, u)
    A_ad_c, B_ad_full = jax.jit(ad.linearize_dynamics)(env0, x, u)
    np.testing.assert_allclose(np.asarray(A_st_c), np.asarray(A_ad_c),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(B_st_c), np.asarray(B_ad_full),
                               atol=1e-4, rtol=1e-3)


# ----------------------------------------------------------------- hybrid

def test_hybrid_warm_start_seeds_both_stages(task):
    solver = HybridSolver(task, MPPIConfig(horizon=3, num_samples=4),
                          SQPConfig(horizon=3, iterations=1))
    state = solver.init_state()
    nominal = jnp.ones((2, 3, task.num_actions), F32) * 0.1
    warm = solver.warm_start(state, nominal)
    np.testing.assert_array_equal(np.asarray(warm.mppi.nominal),
                                  np.asarray(nominal))
    np.testing.assert_array_equal(np.asarray(warm.sqp.nominal),
                                  np.asarray(nominal))


@pytest.mark.slow
def test_hybrid_solve_runs_and_polishes(task, env1):
    """Hybrid = MPPI + SQP polish; the polished sequence's cost must not
    exceed the MPPI winner's cost (SQP accepts only improvements)."""
    mppi_cfg = MPPIConfig(horizon=3, num_samples=8, sigma=0.2)
    sqp_cfg = SQPConfig(horizon=3, iterations=1)
    solver = HybridSolver(task, mppi_cfg, sqp_cfg)
    state = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                         solver.init_state())
    key = jax.random.PRNGKey(5)
    env0 = jax.tree.map(lambda x: x[0], env1)
    # The SQP stage starts from the MPPI stage's updated nominal; its final
    # cost must not exceed that nominal's rollout cost.
    _, mppi_state, _ = jax.jit(solver.mppi.solve)(env1, state.mppi, key)
    init_cost = float(jax.jit(solver.sqp._rollout_cost)(
        env0, mppi_state.nominal[0]))
    actions, state2, info = jax.jit(solver.solve)(env1, state, key)
    assert actions.shape == (1, task.num_actions)
    assert float(info["cost"][0]) <= init_cost + 1e-3


def test_mppi_elite_and_zero_nominal_sample(task, env1):
    """elite + zero_nominal_sample: with zero exploration noise the elite
    executor must reproduce the nominal exactly (the zero sample IS the
    argmax), pinning the best-of-K path against the softmax average."""
    cfg = MPPIConfig(horizon=3, num_samples=4, sigma=0.0, elite=True,
                     zero_nominal_sample=True)
    solver = MPPISolver(task, cfg)
    nominal = 0.1 * jnp.ones((1, 3, task.num_actions), F32)
    actions, st2, info = jax.jit(solver.solve)(
        env1, MPPIState(nominal=nominal), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(actions),
                               np.asarray(nominal[:, 0]), atol=1e-6)
    # Receding-horizon shift of the elite sequence.
    np.testing.assert_allclose(np.asarray(st2.nominal[:, 0]),
                               np.asarray(nominal[:, 1]), atol=1e-6)


def test_mppi_recovery_family_switches_to_stand(task, env1):
    """With a deliberately catastrophic prior (full-authority flail) and a
    zero-noise recovery family, the elite executor must pick the absolute
    stand plan: executed action == 0 (ready stand) and the carried residual
    resets to zero."""
    def bad_prior(obs):
        return jnp.full((obs.shape[0], task.num_actions), 3.9, F32)

    # recovery_gate=10 keeps the recovery family always eligible (the
    # production gate requires the pure-policy rollout to end doomed, which
    # a 3-step horizon cannot establish).
    cfg = MPPIConfig(horizon=3, num_samples=4, sigma=0.0, elite=True,
                     zero_nominal_sample=True, recovery_samples=2,
                     recovery_sigma=0.0, recovery_gate=10.0,
                     balance_weight=1.0, terminal_balance_weight=5.0)
    solver = MPPISolver(task, cfg, prior_fn=bad_prior)
    mppi = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                        solver.init_state())
    actions, st2, _ = jax.jit(solver.solve)(env1, mppi, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(actions), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.nominal), 0.0, atol=1e-6)
