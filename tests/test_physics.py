"""Physics engine tests: FK, Jacobians, dynamics invariants, contact.

Converts the reference's watch-the-viewer behavioral tests
(test_kick_env.py:78-186) into deterministic asserts (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.models.bez import (READY_JOINT_ANGLES, READY_HEIGHT,
                                         default_dyn_params, load_bez_model,
                                         pose_vector)
from bez_isaacgym_tpu.ops import kinematics as kin
from bez_isaacgym_tpu.ops import dynamics as dyn
from bez_isaacgym_tpu.ops.engine import (PhysicsState, SceneConfig,
                                         default_state, make_step_fn)

F32 = jnp.float32


@pytest.fixture(scope="module")
def model():
    return load_bez_model("box_sensor")


@pytest.fixture(scope="module")
def setup(model):
    cfg = SceneConfig()
    params = jax.tree.map(jnp.asarray, default_dyn_params(model))
    q0 = jnp.asarray(pose_vector(model, READY_JOINT_ANGLES), F32)
    step = jax.jit(make_step_fn(model, cfg))
    return cfg, params, q0, step


@pytest.fixture(scope="module")
def fk_fn(model):
    """Jitted FK+Jacobian (single cacheable XLA program; eager per-op
    compiles are pathologically slow on this image's XLA:CPU)."""
    mask = kin.ancestor_mask(model)

    @jax.jit
    def f(q, base_pos, base_quat):
        frames = kin.forward_kinematics(model, q, base_pos, base_quat)
        J_lin, J_ang = kin.com_jacobians(model, frames, mask)
        return frames, J_lin, J_ang

    return f


def test_fk_ready_pose_feet_on_ground(model, fk_fn):
    """In the ready pose at base height 0.34 the cleats must sit near z=0."""
    q0 = jnp.asarray(pose_vector(model, READY_JOINT_ANGLES), F32)
    frames, _, _ = fk_fn(q0, jnp.array([0, 0, 0.34], F32),
                         jnp.array([0, 0, 0, 1], F32))
    rot = np.asarray(frames.rot)[model.cpoint_body]
    pos = np.asarray(frames.pos)[model.cpoint_body]
    pts = pos + np.einsum("cij,cj->ci", rot, model.cpoint_pos)
    lowest = float(pts[:, 2].min())
    assert -0.02 < lowest < 0.03, lowest


def test_fk_symmetry(model, fk_fn):
    """Left/right leg chains mirror each other at zero pose."""
    q = jnp.zeros(model.nq, F32)
    frames, _, _ = fk_fn(q, jnp.zeros(3, F32),
                         jnp.array([0, 0, 0, 1], F32))
    lf = frames.pos[model.body_index("left_foot")]
    rf = frames.pos[model.body_index("right_foot")]
    np.testing.assert_allclose(float(lf[0]), float(rf[0]), atol=1e-6)
    np.testing.assert_allclose(float(lf[1]), -float(rf[1]), atol=1e-6)
    # left/right calve->ankle z offsets differ in the URDF (0.0865 vs
    # 0.0827), so foot heights differ by exactly that asymmetry.
    np.testing.assert_allclose(float(lf[2]) - float(rf[2]), -0.0038, atol=1e-6)


def test_fk_and_jacobian_match_float64_oracle(model, fk_fn):
    """JAX f32 FK + COM Jacobian vs an independent numpy f64 oracle."""
    from scipy.spatial.transform import Rotation

    from tests.oracles import com_jacobian_oracle, fk_oracle

    rng = np.random.default_rng(1)
    q = rng.uniform(-0.3, 0.3, model.nq)
    base_pos = rng.normal(size=3)
    bq = rng.normal(size=4)
    bq /= np.linalg.norm(bq)
    mask = kin.ancestor_mask(model)

    frames, J_lin, J_ang = fk_fn(jnp.asarray(q, F32),
                                 jnp.asarray(base_pos, F32),
                                 jnp.asarray(bq, F32))

    R0 = Rotation.from_quat(bq).as_matrix()
    rot, pos, com, axes, anchors = fk_oracle(model, q, base_pos, R0)
    np.testing.assert_allclose(np.asarray(frames.com), com, atol=2e-3)
    np.testing.assert_allclose(np.asarray(frames.axis_w), axes, atol=5e-3)

    J_ref = com_jacobian_oracle(model, mask, com, axes, anchors, base_pos)
    np.testing.assert_allclose(np.asarray(J_lin), J_ref, atol=2e-3)
    # Angular columns: ancestor axes.
    for b in range(model.nb):
        for d in range(model.nq):
            ref = axes[d] if mask[b, d] else np.zeros(3)
            np.testing.assert_allclose(np.asarray(J_ang)[b, :, 6 + d], ref,
                                       atol=5e-3)


def test_mass_matrix_spd(model):
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, model.nq), F32)
    mask = kin.ancestor_mask(model)

    @jax.jit
    def mass_fn(q):
        frames = kin.forward_kinematics(model, q, jnp.zeros(3, F32),
                                        jnp.array([0, 0, 0, 1], F32))
        J_lin, J_ang = kin.com_jacobians(model, frames, mask)
        m, I_w = dyn.world_inertias(model, frames, jnp.ones(model.nb, F32))
        return dyn.mass_matrix(J_lin, J_ang, m, I_w,
                               jnp.full(model.nq, 1e-3, F32))

    H = np.asarray(mass_fn(q))
    np.testing.assert_allclose(H, H.T, atol=1e-3)
    assert np.linalg.eigvalsh(H).min() > 0
    # Total mass appears in the translational block (f32 accumulation).
    np.testing.assert_allclose(np.diag(H)[:3], model.mass.sum(), rtol=1e-3)


def test_freefall_momentum(model):
    """No contact, no actuation: COM accelerates at exactly g."""
    cfg = SceneConfig(has_ball=False)
    params = jax.tree.map(jnp.asarray, default_dyn_params(model))
    params = params._replace(kp=jnp.zeros(model.nq), kd=jnp.zeros(model.nq),
                             joint_friction=jnp.zeros(model.nq))
    q0 = jnp.asarray(pose_vector(model, READY_JOINT_ANGLES), F32)
    state = default_state(model, cfg, q0, (0, 0, 5.0), (0, 0, 0, 1))
    step = jax.jit(make_step_fn(model, cfg))

    @jax.jit
    def _com_z(s):
        fr = kin.forward_kinematics(model, s.q, s.base_pos, s.base_quat)
        return jnp.sum(jnp.asarray(model.mass) * fr.com[:, 2]) / model.mass.sum()

    com_z = lambda s: float(_com_z(s))

    z0 = com_z(state)
    T = 0.5
    for _ in range(int(T / cfg.dt)):
        state = step(params, state, q0)
    z1 = com_z(state)
    # Semi-implicit Euler drop over N steps: sum_{k=1..N} g k h^2.
    n = int(T / cfg.dt) * cfg.substeps
    h = cfg.dt / cfg.substeps
    expected = -9.81 * h * h * n * (n + 1) / 2
    np.testing.assert_allclose(z1 - z0, expected, rtol=2e-2)


def test_standing_balance(setup, model):
    """Zero-action stand: height stays at READY_HEIGHT +- 1 cm for 3 s
    (reference behavior: kick_env.py:1125 DESIRED_HEIGHT 0.325)."""
    cfg, params, q0, step = setup
    state = default_state(model, cfg, q0, (0, 0, 0.34), (0, 0, 0, 1))
    heights = []
    normal_sums = []
    for i in range(180):
        state = step(params, state, q0)
        if i >= 60:
            heights.append(float(state.base_pos[2]))
            normal_sums.append(float(state.sensor_normal.sum()))
    assert not np.isnan(np.asarray(state.q)).any()
    assert abs(np.mean(heights) - READY_HEIGHT) < 0.01, np.mean(heights)
    assert np.std(heights) < 2e-3
    # Upright: quaternion stays close to identity.
    assert float(state.base_quat[3]) > 0.995
    # Weight on the feet: sensors average ~ m g over the settled window
    # (instantaneous sums oscillate with the compliant-contact sway).
    total = float(np.mean(normal_sums))
    assert abs(total - model.mass.sum() * 9.81) < 5.0, total


def test_ball_rests_on_ground(setup, model):
    cfg, params, q0, step = setup
    state = default_state(model, cfg, q0, (0, 0, 0.34), (0, 0, 0, 1),
                          ball_pos=(1.0, 0.0, 0.3))
    for _ in range(120):
        state = step(params, state, q0)
    assert abs(float(state.ball_pos[2]) - cfg.ball_radius) < 0.01
    assert float(jnp.linalg.norm(state.ball_vel)) < 0.05


def test_rolling_ball_slows_down(setup, model):
    cfg, params, q0, step = setup
    state = default_state(model, cfg, q0, (0, 0, 0.34), (0, 0, 0, 1),
                          ball_pos=(1.0, 0.0, 0.08))
    state = state._replace(ball_vel=jnp.array([1.0, 0, 0], F32))
    v0 = 1.0
    for _ in range(120):
        state = step(params, state, q0)
    v1 = float(jnp.linalg.norm(state.ball_vel[:2]))
    assert v1 < v0
    assert float(state.ball_pos[0]) > 1.05  # it did roll forward


def test_joint_limits_and_velocity_cap(setup, model):
    cfg, params, q0, step = setup
    state = default_state(model, cfg, q0, (0, 0, 0.34), (0, 0, 0, 1))
    # Command far beyond the limit of left_leg_motor_3 ([-2.793, 0]).
    targets = q0.at[model.joint_index("left_leg_motor_3")].set(3.0)
    for _ in range(60):
        state = step(params, state, targets)
        assert float(jnp.abs(state.qd).max()) <= cfg.max_joint_vel + 1e-4
    q = np.asarray(state.q)
    assert np.all(q >= np.asarray(model.dof_lower) - 1e-5)
    assert np.all(q <= np.asarray(model.dof_upper) + 1e-5)


def test_vmap_batch(setup, model):
    """Env-axis vmap: the canonical single-chip parallelism (SURVEY.md §2.4)."""
    cfg, params, q0, step = setup
    n = 8
    state = default_state(model, cfg, q0, (0, 0, 0.34), (0, 0, 0, 1))
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), state)
    targets = jnp.broadcast_to(q0, (n, model.nq))
    vstep = jax.jit(jax.vmap(make_step_fn(model, cfg), in_axes=(None, 0, 0)))
    for _ in range(30):
        batch = vstep(params, batch, targets)
    h = np.asarray(batch.base_pos[:, 2])
    assert np.all(np.abs(h - READY_HEIGHT) < 0.02)
    # All envs identical inputs -> identical outputs (determinism).
    np.testing.assert_allclose(h, h[0], atol=0)
