"""RL stack tests: networks, PPO mechanics, players, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.rl.networks import (ActorCritic, RunningMeanStd,
                                          gaussian_kl, gaussian_logp)
from bez_isaacgym_tpu.rl.ppo import PPOConfig, make_ppo
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask


def test_actor_critic_shapes():
    net = ActorCritic(num_actions=18)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((4, 54)))
    mu, log_std, value = net.apply(params, jnp.zeros((4, 54)))
    assert mu.shape == (4, 18) and value.shape == (4,)
    np.testing.assert_allclose(np.asarray(log_std), 0.0)  # sigma_init 0
    # Reference MLP sizes [400,200,100] (bez_kickPPO.yaml:26).
    shapes = jax.tree.map(lambda x: x.shape, params)["params"]
    assert shapes["Dense_0"]["kernel"] == (54, 400)
    assert shapes["Dense_2"]["kernel"] == (200, 100)


def test_running_mean_std_converges():
    rms = RunningMeanStd.create((3,))
    rng = np.random.default_rng(0)
    data = rng.normal(loc=[1.0, -2.0, 5.0], scale=[0.5, 2.0, 1.0],
                      size=(50, 64, 3)).astype(np.float32)
    for batch in data:
        rms = rms.update(jnp.asarray(batch))
    np.testing.assert_allclose(np.asarray(rms.mean), [1.0, -2.0, 5.0],
                               atol=0.1)
    np.testing.assert_allclose(np.sqrt(np.asarray(rms.var)),
                               [0.5, 2.0, 1.0], atol=0.1)
    normed = np.asarray(rms.normalize(jnp.asarray(data[0])))
    assert abs(normed.mean()) < 0.2 and abs(normed.std() - 1.0) < 0.2


def test_gaussian_logp_kl():
    mu = jnp.zeros((2, 3))
    log_std = jnp.zeros((2, 3))
    a = jnp.zeros((2, 3))
    lp = np.asarray(gaussian_logp(mu, log_std, a))
    np.testing.assert_allclose(lp, 3 * -0.5 * np.log(2 * np.pi), atol=1e-4)
    kl = np.asarray(gaussian_kl(mu, log_std, mu, log_std))
    np.testing.assert_allclose(kl, 0.0, atol=1e-6)
    kl2 = np.asarray(gaussian_kl(mu, log_std, mu + 1.0, log_std))
    np.testing.assert_allclose(kl2, 1.5, atol=1e-5)  # 3 * 0.5


@pytest.mark.slow
def test_ppo_train_iter_and_player(tmp_path):
    task = KickTask(TaskConfig(substeps=2))
    cfg = PPOConfig(horizon=3, minibatch_size=12, mini_epochs=2,
                    units=(32, 32))
    num_envs = 4
    init_fn, train_iter, act_fn = make_ppo(task, num_envs, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), num_envs)
    env_state = jax.jit(jax.vmap(task.reset_one))(keys)
    obs = jnp.zeros((num_envs, task.num_obs), jnp.float32)
    jit_iter = jax.jit(train_iter)
    ts2, env_state, obs, metrics = jit_iter(ts, env_state, obs)
    assert int(ts2.epoch) == 1
    for v in metrics.values():
        assert np.isfinite(float(v))
    # Params actually changed.
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         ts.params, ts2.params)
    assert max(jax.tree.leaves(delta)) > 0

    # Checkpoint round trip through the player.
    from bez_isaacgym_tpu.rl.players import PpoPlayerContinuous
    from bez_isaacgym_tpu.utils import checkpoint as ckpt

    path = str(tmp_path / "test.ckpt")
    ckpt.save(path, ts2)
    player = PpoPlayerContinuous(task, cfg)
    player.restore(path)
    a = player.get_action(np.zeros((2, 54), np.float32))
    assert a.shape == (2, 18)
    assert float(jnp.abs(a).max()) <= task.cfg.clip_actions + 1e-6
    # Deterministic action equals mu-path of act_fn on restored state.
    a2 = act_fn(ts2, jnp.zeros((2, 54)), deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2), atol=1e-6)


@pytest.mark.slow
def test_ppo_central_value_option(tmp_path):
    """Runner central-value parity (torch_runner.py:78-84): a separate
    critic net supplies the value; training runs, params of BOTH nets
    update, and checkpoints round-trip the nested params."""
    task = KickTask(TaskConfig(substeps=1, use_pallas=False))
    cfg = PPOConfig(horizon=2, minibatch_size=8, mini_epochs=1,
                    units=(16, 16), central_value=True,
                    central_value_units=(24,))
    num_envs = 4
    init_fn, train_iter, act_fn = make_ppo(task, num_envs, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    assert set(ts.params.keys()) == {"ac", "cv"}
    keys = jax.random.split(jax.random.PRNGKey(1), num_envs)
    env_state = jax.jit(jax.vmap(task.reset_one))(keys)
    obs = jnp.zeros((num_envs, task.num_obs), jnp.float32)
    ts2, env_state, obs, metrics = jax.jit(train_iter)(ts, env_state, obs)
    for v in metrics.values():
        assert np.isfinite(float(v))
    for part in ("ac", "cv"):
        delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             ts.params[part], ts2.params[part])
        assert max(jax.tree.leaves(delta)) > 0, part

    from bez_isaacgym_tpu.utils import checkpoint as ckpt
    path = str(tmp_path / "cv.ckpt")
    ckpt.save(path, ts2)
    ts3 = ckpt.restore(path, init_fn(jax.random.PRNGKey(9)))
    a = act_fn(ts3, jnp.zeros((2, 54)), deterministic=True)
    a2 = act_fn(ts2, jnp.zeros((2, 54)), deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2), atol=1e-6)


def test_checkpoint_name_parity():
    from bez_isaacgym_tpu.utils.checkpoint import checkpoint_name, latest
    assert checkpoint_name("Bez_Kick", 33, 5981.31) == \
        "Bez_Kick_33_rew_5981.31.ckpt"


def test_running_mean_std_psum_matches_global():
    """Sharded update with axis_name == single update on the full batch
    (round-2 fix: replicated stats stay identical under DP)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from bez_isaacgym_tpu.parallel.mesh import env_mesh

    devices = jax.devices("cpu")
    mesh = env_mesh(devices[:8])
    rng = np.random.default_rng(3)
    batch = jnp.asarray(rng.normal(2.0, 3.0, size=(64, 5)).astype(np.float32))
    rms0 = RunningMeanStd.create((5,))

    def upd(rms, x):
        return rms.update(x, axis_name="env")

    sharded = shard_map(upd, mesh=mesh, in_specs=(P(), P("env")),
                        out_specs=P(), check_rep=False)
    rms_sh = jax.jit(sharded)(rms0, batch)
    rms_ref = rms0.update(batch)
    np.testing.assert_allclose(np.asarray(rms_sh.mean),
                               np.asarray(rms_ref.mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rms_sh.var),
                               np.asarray(rms_ref.var), rtol=1e-4)
    np.testing.assert_allclose(float(rms_sh.count), float(rms_ref.count),
                               rtol=1e-6)


@pytest.mark.slow
def test_adaptive_lr_rises_when_kl_small():
    """Pins the adaptive-KL LR schedule (rl-games AdaptiveScheduler):
    near-zero KL (tiny lr -> policy barely moves) must raise the LR by the
    1.5x rule, and the LR must live in TrainState (no optax internals)."""
    task = KickTask(TaskConfig(substeps=1))
    # normalize_input=False so the first minibatch's policy is bit-identical
    # to the rollout policy -> kl == 0 exactly.
    cfg = PPOConfig(horizon=2, minibatch_size=8, mini_epochs=1,
                    units=(16, 16), learning_rate=1e-6,
                    normalize_input=False)
    num_envs = 4
    init_fn, train_iter, _ = make_ppo(task, num_envs, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), num_envs)
    env_state = jax.jit(jax.vmap(task.reset_one))(keys)
    obs = jnp.zeros((num_envs, task.num_obs), jnp.float32)
    ts2, *_ = jax.jit(train_iter)(ts, env_state, obs)
    # kl ~= 0 < 0.5*threshold on the single minibatch -> lr *= 1.5.
    np.testing.assert_allclose(float(ts2.lr), 1.5e-6, rtol=1e-5)


@pytest.mark.slow
def test_ppo_rnn_train_iter():
    """LSTM PPO (bez_kickPPO.yaml:34-40 option): one recurrent train_iter
    runs, params update, and the rollout carry resets on done."""
    from bez_isaacgym_tpu.rl.ppo_rnn import make_ppo_rnn

    task = KickTask(TaskConfig(substeps=1))
    cfg = PPOConfig(horizon=4, seq_len=2, minibatch_size=8, mini_epochs=1,
                    units=(16, 16), rnn_units=8)
    num_envs = 4
    init_fn, train_iter, act_fn, initial_carry = make_ppo_rnn(
        task, num_envs, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), num_envs)
    env_state = jax.jit(jax.vmap(task.reset_one))(keys)
    obs = jnp.zeros((num_envs, task.num_obs), jnp.float32)
    carry = initial_carry()
    ts2, env_state, obs, carry, metrics = jax.jit(train_iter)(
        ts, env_state, obs, carry)
    assert int(ts2.epoch) == 1
    for v in metrics.values():
        assert np.isfinite(float(v))
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         ts.params, ts2.params)
    assert max(jax.tree.leaves(delta)) > 0
    # act_fn threads the carry.
    a, carry2 = act_fn(ts2, obs, carry)
    assert a.shape == (num_envs, 18)
    assert carry2[0].shape == (num_envs, cfg.rnn_units)
    # Carry evolves with observations.
    a2, carry3 = act_fn(ts2, obs + 1.0, carry2)
    assert float(jnp.abs(carry3[0] - carry2[0]).max()) > 0


def test_discrete_and_sac_players(tmp_path):
    """Discrete/SAC player surfaces (players.py:77-219 parity)."""
    from bez_isaacgym_tpu.rl.players import PpoPlayerDiscrete, SACPlayer

    p = PpoPlayerDiscrete(num_obs=10, actions_num=5, units=(16,))
    a = p.get_action(np.zeros((3, 10), np.float32))
    assert a.shape == (3,) and int(a.max()) < 5
    # Masked: only action 2 allowed.
    mask = np.zeros((3, 5), bool)
    mask[:, 2] = True
    am = p.get_masked_action(np.zeros((3, 10), np.float32), mask)
    assert np.all(np.asarray(am) == 2)

    pm = PpoPlayerDiscrete(num_obs=10, actions_num=(4, 3), units=(16,))
    amd = pm.get_action(np.zeros((2, 10), np.float32))
    assert amd.shape == (2, 2)
    assert int(np.asarray(amd)[:, 0].max()) < 4
    assert int(np.asarray(amd)[:, 1].max()) < 3

    task = KickTask(TaskConfig(substeps=1))
    sac = SACPlayer(task, units=(16, 16))
    a = sac.get_action(np.zeros((2, task.num_obs), np.float32))
    assert a.shape == (2, 18)
    assert float(jnp.abs(a).max()) <= 1.0 + 1e-6
    # Checkpoint round trip (actor/critic/critic_target layout).
    from bez_isaacgym_tpu.utils import checkpoint as ckpt
    path = str(tmp_path / "sac.ckpt")
    ckpt.save(path, {"actor": sac.actor_params, "critic": sac.critic_params,
                     "critic_target": sac.critic_target_params})
    sac2 = SACPlayer(task, units=(16, 16), seed=7)
    sac2.restore(path)
    a2 = sac2.get_action(np.zeros((2, task.num_obs), np.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2), atol=1e-6)
