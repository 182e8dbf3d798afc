"""Task base: pure-functional env machinery shared by all Bez tasks.

Functional redesign of the reference `VecTask` template
(/root/reference/bez_isaacgym/tasks/base/vec_task.py:148-457):

- the step pipeline (vec_task.py:303-349) becomes a pure function
  step_one(state, action) -> (state', obs, reward, done, info);
- vectorized partial resets via indexed GPU writes (kick_env.py:779-850)
  become branch-free `where`-masked state substitution under vmap;
- buffers (obs/rew/reset/progress, vec_task.py:226-249) become fields of an
  immutable EnvState pytree.

Ordering parity with the reference step: physics advances first, done envs
are then re-initialized, and obs/reward are computed on the post-reset state
with progress=0 (post_physics_step, kick_env.py:426-438).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.models import bez
from bez_isaacgym_tpu.models.robot import DynParams, RobotModel
from bez_isaacgym_tpu.ops import sensors
from bez_isaacgym_tpu.ops.engine import (PhysicsState, SceneConfig,
                                         default_state, make_batched_step_fn,
                                         make_step_fn)
from bez_isaacgym_tpu.tasks import dr as dr_engine
from bez_isaacgym_tpu.tasks.dr import DomainRandConfig, RandSpec  # noqa: F401
                                       # (re-exported: the task-facing DR
                                       # surface lives in tasks/dr.py)

F32 = jnp.float32


@dataclass(frozen=True)
class TaskConfig:
    """Common task knobs (cfg/task/*.yaml)."""

    episode_length_s: float = 15.0        # bez_kick.yaml:107
    clip_actions: float = 3.9             # bez_kick.yaml:11
    dt: float = 1.0 / 60.0                # bez_kick.yaml:129
    substeps: int = 4                     # ours; reference PhysX uses 2
    control_freq_inv: int = 1             # bez_kick.yaml:38
    stiffness: float = 100.0              # bez_kick.yaml:35
    damping: float = 7.5                  # bez_kick.yaml:36
    cleats: bool = False                  # bez_kick.yaml:122
    stl: bool = True                      # bez_kick.yaml:123
    plane_static_friction: float = 1.0    # bez_kick.yaml:14
    plane_restitution: float = 0.0
    bez_init_pos: tuple = (0.0, 0.0, 0.34)   # bez_kick.yaml:19
    bez_init_rot: tuple = (0.0, 0.0, 0.0, 1.0)
    ball_init_pos: tuple = (0.175, 0.0, 0.1)  # bez_kick.yaml:25
    ball_init_vel: tuple = (0.0, 0.0, 0.0)
    goal: tuple = (1.5, 0.0)              # bez_kick.yaml:31
    goal_range: float = 2.0               # walk goal box half-width
                                          # (walk_env.py:570-574 samples
                                          # uniform in [-2,2]^2); smaller
                                          # values = curriculum stage
    goal_range_min: float = 0.0           # >0: sample goals in a RING
                                          # r in [min, goal_range] instead
                                          # of the box — curriculum stage
                                          # that avoids the near-origin
                                          # stray trap (a goal inside the
                                          # spawn-noise radius makes the
                                          # heading check fire at reset)
    win_shaping: float = 0.0              # TRAINING-ONLY dense proximity
                                          # bonus: + win_shaping *
                                          # exp(-(dist/0.1)^2) per step,
                                          # making approach-and-stay
                                          # locally optimal so the win
                                          # state is discoverable (the
                                          # reference reward pays 10x
                                          # velocity and -100 for the
                                          # near-goal heading flip, so
                                          # sprint-through strictly beats
                                          # precision stopping).  MUST be
                                          # 0 for evaluation (the default).
    goal_angle: float = 1.5708            # bez_orient.yaml:26
    reset_dof_pos_noise: float = 0.15     # kick_env.py:786
    reset_dof_vel_noise: float = 0.1      # kick_env.py:787
    use_pallas: bool = True               # fused TPU kernel when available
    dr: DomainRandConfig = field(default_factory=DomainRandConfig)

    @property
    def max_episode_length(self) -> int:
        # kick_env.py:127
        return int(self.episode_length_s / self.dt + 0.5)


class EnvState(NamedTuple):
    """Single-env task state (a pytree; vmapped over the env axis)."""

    physics: PhysicsState
    dyn: DynParams                 # per-env (DR-randomized) dynamics params
    prev_lin_vel: jnp.ndarray      # (3,) IMU finite-difference memory
    progress: jnp.ndarray          # () int32 steps since reset
    done: jnp.ndarray              # () bool, produced by the previous step
    goal: jnp.ndarray              # (2,)
    goal_angle: jnp.ndarray        # () f32
    ball_init: jnp.ndarray         # (2,)
    key: jnp.ndarray               # PRNG key
    dr_step: jnp.ndarray           # () int32 env steps since training start
                                   # (drives DR schedules; never reset)
    ep_reward: jnp.ndarray         # () f32 cumulative unscaled reward this
                                   # episode (for episode-return metrics)
    last_rand_step: jnp.ndarray    # () int32 dr_step at the last dynamics
                                   # re-randomization (DR frequency gate,
                                   # vec_task.py:524-530 randomize_buf)


class StepOutput(NamedTuple):
    state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray


def _model_variant(cfg: TaskConfig) -> str:
    if cfg.stl:
        return "stl_sensor" if cfg.cleats else "stl"
    return "box_sensor" if cfg.cleats else "box"


class BezTask:
    """Base class: owns the static model + scene and the pure step logic.

    Subclasses define num_obs / has_ball / observe() / reward_done().
    """

    num_actions: int = bez.NUM_JOINTS
    num_obs: int = 54
    has_ball: bool = True

    def __init__(self, cfg: TaskConfig):
        self.cfg = cfg
        self.model: RobotModel = bez.load_bez_model(_model_variant(cfg))
        self.scene = SceneConfig(dt=cfg.dt, substeps=cfg.substeps,
                                 has_ball=self.has_ball)
        self.base_params = jax.tree.map(
            jnp.asarray,
            bez.default_dyn_params(self.model,
                                   ground_friction=cfg.plane_static_friction,
                                   restitution=cfg.plane_restitution))
        self.base_params = self.base_params._replace(
            kp=jnp.full(self.model.nq, cfg.stiffness, F32),
            kd=jnp.full(self.model.nq, cfg.damping, F32))
        self.default_dof_pos = jnp.asarray(
            bez.pose_vector(self.model, bez.READY_JOINT_ANGLES), F32)
        self.dof_lower = jnp.asarray(self.model.dof_lower, F32)
        self.dof_upper = jnp.asarray(self.model.dof_upper, F32)
        self._step_physics = make_step_fn(self.model, self.scene)
        # Production batched path: the fused Pallas kernel on TPU backends
        # (14x the XLA path, see ops/pallas_step.py), XLA elsewhere.
        from bez_isaacgym_tpu.ops.pallas_step import (make_pallas_step_fn,
                                                      pallas_available)
        if cfg.use_pallas and pallas_available():
            self._step_physics_batch = make_pallas_step_fn(self.model,
                                                           self.scene)
        else:
            self._step_physics_batch = make_batched_step_fn(self.model,
                                                            self.scene)
        lf = self.model.body_index("left_foot")
        rf = self.model.body_index("right_foot")
        self._foot_bodies = (lf, rf)

    # ------------------------------------------------------------------ reset
    def _sample_dyn(self, key, dr_step=0) -> DynParams:
        """Per-env dynamics randomization (vec_task.py:620-713, spec
        bez_kick.yaml:151-219): per-parameter gaussian/uniform with
        additive/scaling ops and linear/constant schedules, evaluated at
        schedule position `dr_step` (env steps since training start)."""
        p = self.base_params
        dr = self.cfg.dr
        if not dr.enabled:
            return p
        ks = jax.random.split(key, 8)
        mass = dr_engine.apply(ks[0], dr.body_mass, p.mass_scale, dr_step)
        fric = dr_engine.apply(ks[1], dr.shape_friction,
                               p.ground_friction, dr_step)
        rest = dr_engine.apply(ks[2], dr.shape_restitution,
                               p.restitution, dr_step)
        kp = dr_engine.apply(ks[3], dr.dof_stiffness, p.kp, dr_step)
        kd = dr_engine.apply(ks[4], dr.dof_damping, p.kd, dr_step)
        grav = dr_engine.apply(ks[5], dr.gravity, p.gravity, dr_step)
        lo = dr_engine.apply(ks[6], dr.dof_lower, p.dof_lower, dr_step)
        hi = dr_engine.apply(ks[7], dr.dof_upper, p.dof_upper, dr_step)
        return p._replace(
            mass_scale=mass, ground_friction=fric, restitution=rest,
            kp=kp, kd=kd, gravity=grav,
            dof_lower=jnp.minimum(lo, hi), dof_upper=jnp.maximum(lo, hi))

    def reset_one(self, key, dr_step=0) -> EnvState:
        """Fresh env state with reference reset noise (kick_env.py:786-791).

        dr_step: DR schedule position (0 at training start; auto-resets
        re-sample at the live schedule position, see _post_physics)."""
        cfg = self.cfg
        k_pos, k_vel, k_dyn, k_task, k_next = jax.random.split(key, 5)
        q = self.default_dof_pos + jax.random.uniform(
            k_pos, (self.model.nq,), F32,
            -cfg.reset_dof_pos_noise, cfg.reset_dof_pos_noise)
        q = jnp.clip(q, self.dof_lower, self.dof_upper)
        qd = jax.random.uniform(k_vel, (self.model.nq,), F32,
                                -cfg.reset_dof_vel_noise, cfg.reset_dof_vel_noise)
        physics = default_state(self.model, self.scene, q, cfg.bez_init_pos,
                                cfg.bez_init_rot, ball_pos=cfg.ball_init_pos)
        physics = physics._replace(
            qd=qd, ball_vel=jnp.asarray(cfg.ball_init_vel, F32))
        state = EnvState(
            physics=physics,
            dyn=self._sample_dyn(k_dyn, dr_step),
            prev_lin_vel=jnp.zeros(3, F32),
            progress=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            goal=jnp.asarray(cfg.goal, F32),
            goal_angle=jnp.asarray(cfg.goal_angle, F32),
            ball_init=jnp.asarray(cfg.ball_init_pos[:2], F32),
            key=k_next,
            dr_step=jnp.zeros((), jnp.int32),
            ep_reward=jnp.zeros((), F32),
            last_rand_step=jnp.asarray(dr_step, jnp.int32),
        )
        return self.task_reset(state, k_task)

    def task_reset(self, state: EnvState, key) -> EnvState:
        """Task-specific goal resampling hook (walk_env.py:570-574)."""
        return state

    # ------------------------------------------------------------- step logic
    def _pre_physics(self, state: EnvState, action: jnp.ndarray):
        """Action pipeline (vec_task.py:314-318, kick_env.py:410-419)."""
        cfg = self.cfg
        key, k_act, k_obs, k_reset = jax.random.split(state.key, 4)
        if cfg.dr.enabled:
            # Action-noise DR (vec_task.py:314-315, spec bez_kick.yaml:157).
            action = dr_engine.apply(k_act, cfg.dr.actions, action,
                                     state.dr_step)
        action = jnp.clip(action, -cfg.clip_actions, cfg.clip_actions)
        action = action.at[0:2].set(0.0)  # head motors zeroed
        targets = jnp.clip(action + self.default_dof_pos,
                           state.dyn.dof_lower, state.dyn.dof_upper)
        return state._replace(key=key), action, targets, k_obs, k_reset

    def _post_physics(self, state: EnvState, physics, action,
                      k_obs, k_reset) -> StepOutput:
        """Auto-reset + obs + reward (post_physics_step order:
        kick_env.py:429-438)."""
        cfg = self.cfg
        stepped = state._replace(physics=physics, progress=state.progress + 1,
                                 dr_step=state.dr_step + 1)
        fresh = self.reset_one(k_reset, stepped.dr_step)
        state2 = jax.tree.map(lambda a, b: jnp.where(state.done, a, b),
                              fresh, stepped)
        # The DR schedule clock survives resets.
        state2 = state2._replace(dr_step=stepped.dr_step)
        if cfg.dr.enabled:
            # Frequency gate (vec_task.py:524-530): a resetting env only
            # re-randomizes its dynamics once >= frequency env steps have
            # passed since its last randomization; otherwise it keeps the
            # previous draw.  setup_only properties (mass,
            # bez_kick.yaml:175) are never re-randomized after creation.
            due = state.done & (
                (stepped.dr_step - state.last_rand_step) >= cfg.dr.frequency)
            new_dyn = jax.tree.map(lambda f, o: jnp.where(due, f, o),
                                   state2.dyn, stepped.dyn)
            if cfg.dr.body_mass.setup_only:
                new_dyn = new_dyn._replace(mass_scale=stepped.dyn.mass_scale)
            state2 = state2._replace(
                dyn=new_dyn,
                last_rand_step=jnp.where(due, stepped.dr_step,
                                         state.last_rand_step))
        obs, state3 = self.observe(state2, action)
        if cfg.dr.enabled:
            # Observation-noise DR (vec_task.py:337-338, bez_kick.yaml:153).
            obs = dr_engine.apply(k_obs, cfg.dr.observations, obs,
                                  state.dr_step)
        reward, done = self.reward_done(state3, action)
        # Reference fills timeout_buf from *pre-increment* progress >= max-1
        # (vec_task.py:331-332), i.e. post-increment progress >= max — the
        # same step the horizon reset fires, so rl-games' value bootstrap
        # (gamma*V on time_outs) applies exactly at horizon terminations.
        time_out = state3.progress >= cfg.max_episode_length
        state4 = state3._replace(done=done,
                                 ep_reward=state3.ep_reward + reward)
        return StepOutput(state=state4, obs=obs, reward=reward, done=done,
                          time_out=time_out)

    def step_one(self, state: EnvState, action: jnp.ndarray) -> StepOutput:
        """Single-env step (tests / reference semantics)."""
        state, action, targets, k_obs, k_reset = self._pre_physics(state, action)
        physics = state.physics
        for _ in range(self.cfg.control_freq_inv):
            physics = self._step_physics(state.dyn, physics, targets)
        return self._post_physics(state, physics, action, k_obs, k_reset)

    def step_batch(self, states: EnvState, actions: jnp.ndarray) -> StepOutput:
        """Production batched step: the physics runs through the batched
        engine path (batched linear solve — see ops.engine perf notes)."""
        states, actions, targets, k_obs, k_reset = jax.vmap(
            self._pre_physics)(states, actions)
        physics = states.physics
        for _ in range(self.cfg.control_freq_inv):
            physics = self._step_physics_batch(states.dyn, physics, targets)
        return jax.vmap(self._post_physics)(states, physics, actions,
                                            k_obs, k_reset)

    # ----------------------------------------------------------- observations
    def _imu_and_heading(self, state: EnvState):
        """IMU + heading obs; the IMU link is the torso (kick_env.py:174-177)."""
        ph = state.physics
        imu, new_prev = sensors.compute_imu(
            ph.base_quat, ph.base_u[0:3], ph.base_u[3:6],
            state.prev_lin_vel, self.cfg.dt)
        return imu, new_prev

    def _feet(self, state: EnvState) -> jnp.ndarray:
        ph = state.physics
        if self.cfg.cleats:
            return sensors.feet_sensors_cleats(ph.sensor_normal)
        lf, rf = self._foot_bodies
        return sensors.feet_sensors_no_cleats(
            ph.body_contact_force[lf], ph.body_contact_force[rf])

    def observe(self, state: EnvState, action) -> tuple[jnp.ndarray, EnvState]:
        raise NotImplementedError

    def reward_done(self, state: EnvState, action):
        raise NotImplementedError
