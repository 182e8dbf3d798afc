"""Closed-loop kick evaluation: does the policy actually kick?

Runs a trained policy (or an MPC solver via --solver) on S parallel kick
envs for one episode horizon and reports ball displacement toward the goal,
success rate (ball driven >= `success_dist` toward goal), scoring rate, and
fall rate — the repo-native analog of judging the reference's shipped
checkpoint by watching it kick (test_kick_env.py:228-231).

Usage:
    python -m bez_isaacgym_tpu.eval.kick_eval --checkpoint runs/Bez_Kick/Bez_Kick_best.ckpt
    python -m bez_isaacgym_tpu.eval.kick_eval --solver mppi --num-envs 64
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def eval_policy(checkpoint: str, num_envs: int = 64, steps: int = 600,
                success_dist: float = 1.0, seed: int = 0,
                deterministic: bool = True):
    from bez_isaacgym_tpu.rl.players import PpoPlayerContinuous

    task = KickTask(TaskConfig(substeps=4))
    player = PpoPlayerContinuous(task, checkpoint_path=checkpoint)
    act = jax.jit(lambda ts, o: player._act(ts, o, jax.random.PRNGKey(0),
                                            deterministic))

    step = jax.jit(task.step_batch)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(task.reset_one))(keys)
    zero = jnp.zeros(task.num_actions, jnp.float32)
    obs, state = jax.jit(jax.vmap(lambda s: task.observe(s, zero)))(state)

    goal = np.asarray(state.goal)                    # (S,2)
    ball0 = np.asarray(state.physics.ball_pos)[:, :2]
    init_goal_dist = np.linalg.norm(goal - ball0, axis=-1)

    # Track per-env FIRST episode only (freeze results at first done).
    finished = np.zeros(num_envs, bool)
    progress_toward_goal = np.zeros(num_envs)        # meters toward goal
    scored = np.zeros(num_envs, bool)
    fell = np.zeros(num_envs, bool)
    ep_steps = np.zeros(num_envs, int)

    for t in range(steps):
        actions = act(player.train_state, obs)
        out = step(state, actions)
        ball = np.asarray(out.state.physics.ball_pos)[:, :2]
        height = np.asarray(out.state.physics.base_pos)[:, 2]
        goal_dist = np.linalg.norm(goal - ball, axis=-1)
        live = ~finished
        progress_toward_goal[live] = np.maximum(
            progress_toward_goal[live],
            (init_goal_dist - goal_dist)[live])
        d = np.asarray(out.done) & live
        scored[d & (goal_dist < 0.05)] = True
        fell[d & (height < 0.275)] = True
        ep_steps[live] += 1
        finished |= np.asarray(out.done)
        state, obs = out.state, out.obs
        if finished.all():
            break

    return {
        "num_envs": num_envs,
        "mean_ball_progress_m": float(progress_toward_goal.mean()),
        "median_ball_progress_m": float(np.median(progress_toward_goal)),
        "success_rate": float((progress_toward_goal >= success_dist).mean()),
        "kicked_rate": float((progress_toward_goal >= 0.3).mean()),
        "score_rate": float(scored.mean()),
        "fall_rate": float(fell.mean()),
        "mean_ep_steps": float(ep_steps.mean()),
    }


def eval_mppi(num_envs: int = 64, steps: int = 600, success_dist: float = 1.0,
              seed: int = 0, horizon: int = 32, num_samples: int = 64,
              sigma: float = 0.25, temperature: float = 0.05,
              substeps: int = 2, warm_skill: str = "",
              use_sqp: bool = False, done_penalty: float = 10.0,
              policy_prior: str = "", balance_weight: float = 0.0,
              terminal_balance_weight: float = 0.0,
              elite: bool = False, zero_nominal_sample: bool = False,
              recovery_samples: int = 0, recovery_sigma: float = 0.1,
              recovery_gate: float = 0.0):
    """Closed-loop MPC kick eval.

    warm_skill: keyframe skill (e.g. "simulation_rightkick") used as a
    receding-horizon reference nominal — at tick t the solver's nominal is
    re-seeded with the skill window [t, t+H) (HybridSolver.warm_start /
    SURVEY.md §7 Phase 4), so sampling explores around the classical kick.
    use_sqp: polish the MPPI winner with the SQP stage (HybridSolver).
    policy_prior: PPO checkpoint; rollouts run closed-loop around the
    policy's deterministic action and MPPI samples residuals (the round-3
    fix for 'MPPI kicks worse than its own PPO artifact', VERDICT r2 #3).
    """
    from bez_isaacgym_tpu.solvers.hybrid import HybridSolver
    from bez_isaacgym_tpu.solvers.mppi import MPPIConfig, MPPISolver, MPPIState
    from bez_isaacgym_tpu.solvers.sqp import SQPConfig

    task = KickTask(TaskConfig(substeps=substeps))
    mppi_cfg = MPPIConfig(horizon=horizon, num_samples=num_samples,
                          sigma=sigma, temperature=temperature,
                          done_penalty=done_penalty,
                          balance_weight=balance_weight,
                          terminal_balance_weight=terminal_balance_weight,
                          elite=elite,
                          zero_nominal_sample=zero_nominal_sample,
                          recovery_samples=recovery_samples,
                          recovery_sigma=recovery_sigma,
                          recovery_gate=recovery_gate)
    prior_fn = None
    if policy_prior:
        from bez_isaacgym_tpu.rl.players import PpoPlayerContinuous
        player = PpoPlayerContinuous(task, checkpoint_path=policy_prior)
        ts = player.train_state
        key0 = jax.random.PRNGKey(0)
        prior_fn = lambda obs: player._act(ts, obs, key0, True)  # noqa: E731
    if use_sqp:
        hybrid = HybridSolver(task, mppi_cfg,
                              SQPConfig(horizon=horizon, iterations=1),
                              prior_fn=prior_fn)
        solver = hybrid.mppi
        solve = jax.jit(hybrid.solve)
    else:
        hybrid = None
        solver = MPPISolver(task, mppi_cfg, prior_fn=prior_fn)
        solve = jax.jit(solver.solve)
    step = jax.jit(task.step_batch)

    warm_plan = None
    if warm_skill:
        from bez_isaacgym_tpu.control.warmstart import skill_warm_start
        # Full-length plan; window re-seeded each tick below.
        warm_plan = [
            jnp.asarray(skill_warm_start(task, warm_skill, horizon,
                                         t0=t / 60.0, num=num_envs))
            for t in range(steps)]

    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(task.reset_one))(keys)
    mppi = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape),
        solver.init_state())
    if hybrid is not None:
        hstate = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape),
            hybrid.init_state())

    goal = np.asarray(state.goal)
    ball0 = np.asarray(state.physics.ball_pos)[:, :2]
    init_goal_dist = np.linalg.norm(goal - ball0, axis=-1)

    finished = np.zeros(num_envs, bool)
    progress_toward_goal = np.zeros(num_envs)
    fell = np.zeros(num_envs, bool)
    key = jax.random.PRNGKey(seed + 1)

    for t in range(steps):
        key, sub = jax.random.split(key)
        if warm_plan is not None:
            nominal = warm_plan[min(t, len(warm_plan) - 1)]
            if hybrid is not None:
                hstate = hybrid.warm_start(hstate, nominal)
            else:
                mppi = MPPIState(nominal=nominal)
        if hybrid is not None:
            actions, hstate, _ = solve(state, hstate, sub)
        else:
            actions, mppi, _ = solve(state, mppi, sub)
        out = step(state, actions)
        ball = np.asarray(out.state.physics.ball_pos)[:, :2]
        height = np.asarray(out.state.physics.base_pos)[:, 2]
        goal_dist = np.linalg.norm(goal - ball, axis=-1)
        live = ~finished
        progress_toward_goal[live] = np.maximum(
            progress_toward_goal[live], (init_goal_dist - goal_dist)[live])
        d = np.asarray(out.done) & live
        fell[d & (height < 0.275)] = True
        finished |= np.asarray(out.done)
        state, obs = out.state, out.obs
        if finished.all():
            break

    return {
        "num_envs": num_envs,
        "config": {"sigma": sigma, "temperature": temperature,
                   "num_samples": num_samples, "horizon": horizon,
                   "done_penalty": done_penalty,
                   "balance_weight": balance_weight,
                   "terminal_balance_weight": terminal_balance_weight,
                   "policy_prior": policy_prior, "warm_skill": warm_skill,
                   "use_sqp": use_sqp, "substeps": substeps,
                   "elite": elite,
                   "zero_nominal_sample": zero_nominal_sample,
                   "recovery_samples": recovery_samples,
                   "recovery_sigma": recovery_sigma,
                   "recovery_gate": recovery_gate},
        "mean_ball_progress_m": float(progress_toward_goal.mean()),
        "success_rate": float((progress_toward_goal >= success_dist).mean()),
        "kicked_rate": float((progress_toward_goal >= 0.3).mean()),
        "fall_rate": float(fell.mean()),
    }


def eval_sqp_policy(num_envs: int = 16, steps: int = 200,
                    success_dist: float = 1.0, seed: int = 0,
                    horizon: int = 32, iterations: int = 1,
                    substeps: int = 4, warm_reg: float = 0.0,
                    balance_weight: float = 0.0,
                    policy_prior: str = "runs/Bez_Kick/Bez_Kick_best.ckpt"):
    """Closed-loop SQP with a policy-rollout warm start (north-star stage 2
    in the loop).

    Each tick the deterministic PPO policy is unrolled H steps from the
    current state to produce an ABSOLUTE action sequence, which the
    SQP/iLQR stage polishes (solvers/sqp.py); the first polished action is
    executed.  This is the standard policy-as-initializer MPC scheme — it
    gives the gradient stage a closed-loop quality number, which the
    residual-sampling MPPI prior cannot (HybridSolver rejects
    prior_fn+use_sqp, solvers/hybrid.py:34-39).
    """
    from bez_isaacgym_tpu.rl.players import PpoPlayerContinuous
    from bez_isaacgym_tpu.solvers.sqp import SQPConfig, SQPSolver, SQPState

    task = KickTask(TaskConfig(substeps=substeps))
    player = PpoPlayerContinuous(task, checkpoint_path=policy_prior)
    ts = player.train_state
    key0 = jax.random.PRNGKey(0)
    solver = SQPSolver(task, SQPConfig(horizon=horizon,
                                       iterations=iterations,
                                       warm_reg=warm_reg,
                                       balance_weight=balance_weight))

    def policy_rollout(state):
        """Unroll the deterministic policy H steps -> (S, H, nu) actions."""
        def body(s, _):
            obs, s = jax.vmap(task.observe)(
                s, jnp.zeros((num_envs, task.num_actions), jnp.float32))
            u = player._act(ts, obs, key0, True)
            targets = jnp.clip(
                jnp.clip(u, -task.cfg.clip_actions, task.cfg.clip_actions)
                .at[:, 0:2].set(0.0) + task.default_dof_pos[None],
                task.dof_lower[None], task.dof_upper[None])
            physics = task._step_physics_batch(s.dyn, s.physics, targets)
            s = s._replace(physics=physics, progress=s.progress + 1)
            return s, u
        _, us = jax.lax.scan(body, state, None, length=horizon)
        return jnp.swapaxes(us, 0, 1)

    def tick(state):
        nominal = policy_rollout(state)
        actions, _, info = solver.solve(state, SQPState(nominal=nominal))
        return actions, info

    tick_fn = jax.jit(tick)
    step = jax.jit(task.step_batch)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(task.reset_one))(keys)

    goal = np.asarray(state.goal)
    ball0 = np.asarray(state.physics.ball_pos)[:, :2]
    init_goal_dist = np.linalg.norm(goal - ball0, axis=-1)
    finished = np.zeros(num_envs, bool)
    progress_toward_goal = np.zeros(num_envs)
    fell = np.zeros(num_envs, bool)

    for t in range(steps):
        actions, _ = tick_fn(state)
        out = step(state, actions)
        ball = np.asarray(out.state.physics.ball_pos)[:, :2]
        height = np.asarray(out.state.physics.base_pos)[:, 2]
        goal_dist = np.linalg.norm(goal - ball, axis=-1)
        live = ~finished
        progress_toward_goal[live] = np.maximum(
            progress_toward_goal[live], (init_goal_dist - goal_dist)[live])
        d = np.asarray(out.done) & live
        fell[d & (height < 0.275)] = True
        finished |= np.asarray(out.done)
        state = out.state
        if finished.all():
            break

    return {
        "num_envs": num_envs,
        "config": {"solver": "sqp+policy_rollout", "horizon": horizon,
                   "iterations": iterations, "substeps": substeps,
                   "warm_reg": warm_reg, "balance_weight": balance_weight,
                   "policy_prior": policy_prior},
        "mean_ball_progress_m": float(progress_toward_goal.mean()),
        "success_rate": float((progress_toward_goal >= success_dist).mean()),
        "kicked_rate": float((progress_toward_goal >= 0.3).mean()),
        "fall_rate": float(fell.mean()),
    }


if __name__ == "__main__":
    from bez_isaacgym_tpu.utils.backend import ensure_backend
    ensure_backend()   # dead-tunnel hang guard (STATUS #7)
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--solver", default="",
                    choices=["", "mppi", "hybrid", "sqp-policy"])
    ap.add_argument("--warm-skill", default="",
                    help="keyframe skill for receding warm starts, e.g. "
                         "simulation_rightkick")
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--sigma", type=float, default=0.25)
    ap.add_argument("--temperature", type=float, default=0.05)
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--policy-prior", default="",
                    help="PPO ckpt; MPPI samples residuals around the "
                         "policy's closed-loop actions")
    ap.add_argument("--balance-weight", type=float, default=0.0)
    ap.add_argument("--terminal-balance-weight", type=float, default=0.0)
    ap.add_argument("--elite", action="store_true",
                    help="execute the best-scoring sample (predictive "
                         "sampling) instead of the softmax average")
    ap.add_argument("--zero-nominal-sample", action="store_true",
                    help="always score the unperturbed nominal (with a "
                         "prior: the pure policy) as sample 0")
    ap.add_argument("--recovery-samples", type=int, default=0,
                    help="elite+prior only: absolute stand-biased sample "
                         "family size (abort-and-balance recovery mode)")
    ap.add_argument("--recovery-sigma", type=float, default=0.1)
    ap.add_argument("--recovery-gate", type=float, default=0.0)
    ap.add_argument("--warm-reg", type=float, default=0.0,
                    help="sqp-policy: quadratic tether to the policy-"
                         "rollout warm start (trust region)")
    ap.add_argument("--substeps", type=int, default=0,
                    help="env/rollout physics substeps (default: 4 for "
                         "sqp-policy — matching both the function default "
                         "and the shipped artifact — else 2); use 4 for "
                         "like-for-like comparison with the policy eval "
                         "(the policy is trained at 4 — at 2 it falls 4x "
                         "as often, so MPC numbers at 2 are not comparable)")
    ap.add_argument("--iterations", type=int, default=1,
                    help="sqp-policy: Gauss-Newton iterations per tick")
    args = ap.parse_args()
    if not args.substeps:
        args.substeps = 4 if args.solver == "sqp-policy" else 2
    if args.solver == "sqp-policy":
        res = eval_sqp_policy(num_envs=args.num_envs, steps=args.steps,
                              horizon=args.horizon, substeps=args.substeps,
                              warm_reg=args.warm_reg,
                              iterations=args.iterations,
                              balance_weight=args.balance_weight,
                              policy_prior=args.policy_prior or
                              "runs/Bez_Kick/Bez_Kick_best.ckpt")
    elif args.solver in ("mppi", "hybrid"):
        res = eval_mppi(num_envs=args.num_envs, steps=args.steps,
                        sigma=args.sigma, temperature=args.temperature,
                        num_samples=args.num_samples, horizon=args.horizon,
                        warm_skill=args.warm_skill,
                        use_sqp=args.solver == "hybrid",
                        policy_prior=args.policy_prior,
                        balance_weight=args.balance_weight,
                        terminal_balance_weight=args.terminal_balance_weight,
                        substeps=args.substeps, elite=args.elite,
                        zero_nominal_sample=args.zero_nominal_sample,
                        recovery_samples=args.recovery_samples,
                        recovery_sigma=args.recovery_sigma,
                        recovery_gate=args.recovery_gate)
    else:
        res = eval_policy(args.checkpoint, num_envs=args.num_envs,
                          steps=args.steps,
                          deterministic=not args.stochastic)
    print(json.dumps(res))
