"""PPO, fully jitted: rollout (lax.scan over env steps) + GAE + minibatch SGD.

Replaces the reference's external rl-games A2CAgent with the exact training
spec of /root/reference/bez_isaacgym/cfg/train/bez_kickPPO.yaml:45-79 —
gamma 0.99, GAE tau 0.95, adaptive-KL LR from 3e-4 (threshold 0.008),
e_clip 0.2, horizon 32, minibatch 32768, 5 mini-epochs, critic_coef 2,
clipped value loss, grad-norm 1.0, entropy 0, bounds loss 1e-3, reward scale
0.01, obs/value running normalization, value bootstrap on timeouts.

One `train_iter` call = one full PPO epoch (rollout + update) as a single
XLA program.  For multi-chip data parallelism, wrap with
`bez_isaacgym_tpu.parallel.data_parallel_train` — gradients and batch stats
are psum-reduced over the mesh's ICI (the TPU-native analog of the
reference's optional Horovod allreduce, rlgames_utils.py:71-81).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from bez_isaacgym_tpu.rl.networks import (ActorCritic, RunningMeanStd,
                                          gaussian_kl, gaussian_logp)
from bez_isaacgym_tpu.tasks.base import BezTask

F32 = jnp.float32


@dataclass(frozen=True)
class PPOConfig:
    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 3e-4
    lr_max: float = 1e-2        # adaptive-KL LR ceiling.  Lower it (e.g.
                                # 2e-5) when fine-tuning a restored
                                # checkpoint: on resume the KL starts tiny,
                                # the adaptive rule balloons the LR to the
                                # ceiling, and a converged policy gets
                                # destroyed before KL pressure reins it in
                                # (measured: the round-4 goalie
                                # continuation collapsed ep_reward +997 ->
                                # -1643 within 16k iters this way).
    kl_threshold: float = 0.008
    e_clip: float = 0.2
    horizon: int = 32
    minibatch_size: int = 32768
    mini_epochs: int = 5
    critic_coef: float = 2.0
    grad_norm: float = 1.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.001
    reward_scale: float = 0.01       # reward_shaper scale_value
    normalize_input: bool = True
    normalize_value: bool = True
    # Recurrent policy option (bez_kickPPO.yaml:34-40 commented rnn block):
    # rnn_units > 0 selects the LSTM actor-critic (rl/ppo_rnn.py) trained
    # with truncated BPTT over seq_len windows (yaml :78 seq_len 4).
    rnn_units: int = 0
    seq_len: int = 4
    normalize_advantage: bool = True
    value_bootstrap: bool = True
    clip_value: bool = True
    units: tuple = (400, 200, 100)
    # Central-value option (torch_runner.py:78-84 builds an optional
    # separate central_value_config network): a detached critic MLP whose
    # output replaces the shared value head.  The Bez tasks expose no
    # privileged state, so it sees the same observations (DEVIATIONS.md).
    central_value: bool = False
    central_value_units: tuple = (400, 200, 100)


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    lr: jnp.ndarray
    epoch: jnp.ndarray
    key: jnp.ndarray


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray
    mu: jnp.ndarray
    log_std: jnp.ndarray
    ep_ret: jnp.ndarray       # cumulative unscaled episode reward incl. this
                              # step (valid as episode return where done)
    ep_len: jnp.ndarray       # steps since episode start (valid where done)


def make_ppo(task: BezTask, num_envs: int, cfg: PPOConfig = PPOConfig(),
             axis_name: str | None = None):
    """Returns (init_fn, train_iter_fn, act_fn).

    axis_name: mesh axis for cross-chip psum of gradients/stats (None =
    single chip).
    """
    net = ActorCritic(num_actions=task.num_actions, units=cfg.units)
    if cfg.central_value:
        from bez_isaacgym_tpu.rl.networks import CentralValue
        cv_net = CentralValue(units=cfg.central_value_units)

        def _apply(params, x):
            mu, log_std, _ = net.apply(params["ac"], x)
            return mu, log_std, cv_net.apply(params["cv"], x)
    else:
        def _apply(params, x):
            return net.apply(params, x)
    # The adaptive-KL learning rate lives in TrainState.lr and is applied
    # explicitly to the updates below — no optax internals are touched
    # (robust across optax versions; pinned by tests/test_rl.py).
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.scale_by_adam(),
    )
    # rl-games action-space parity: the env's action space is Box(-1, 1)
    # (vec_task.py:95) and rescale_actions with low/high = +-1 is the
    # identity (players.py:11-15, a2c clip_actions), so env actions are
    # clip(sampled, -1, 1) — joint-position offsets in [-1, 1] rad.  The
    # env-side clip_actions=3.9 clamp (vec_task.py:317) happens inside the
    # task's _pre_physics and is a no-op on these.
    action_limit = 1.0

    def _pmean(x):
        if axis_name is None:
            return x
        return jax.lax.pmean(x, axis_name)

    def init_fn(key) -> TrainState:
        k_net, k_cv, k_state = jax.random.split(key, 3)
        zero_obs = jnp.zeros((1, task.num_obs), F32)
        if cfg.central_value:
            params = {"ac": net.init(k_net, zero_obs),
                      "cv": cv_net.init(k_cv, zero_obs)}
        else:
            params = net.init(k_net, zero_obs)
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            obs_rms=RunningMeanStd.create((task.num_obs,)),
            value_rms=RunningMeanStd.create(()),
            lr=jnp.asarray(cfg.learning_rate, F32),
            epoch=jnp.zeros((), jnp.int32),
            key=k_state,
        )

    def act_fn(ts: TrainState, obs, key=None, deterministic=True):
        """Policy action for play/eval (players.py:41-66 parity: mu when
        deterministic, env action = limit * clip(a, -1, 1))."""
        x = ts.obs_rms.normalize(obs) if cfg.normalize_input else obs
        mu, log_std, _ = _apply(ts.params, x)
        a = mu if deterministic else mu + jnp.exp(log_std) * \
            jax.random.normal(key, mu.shape, F32)
        return action_limit * jnp.clip(a, -1.0, 1.0)

    def _policy(params, obs_rms, obs):
        x = obs_rms.normalize(obs) if cfg.normalize_input else obs
        return _apply(params, x)

    def rollout(ts: TrainState, env_state, last_obs):
        """Collect cfg.horizon steps from all envs (scan, fully on device)."""

        def step(carry, _):
            env_s, obs, key = carry
            key, k_act = jax.random.split(key)
            mu, log_std, value = _policy(ts.params, ts.obs_rms, obs)
            eps = jax.random.normal(k_act, mu.shape, F32)
            action = mu + jnp.exp(log_std) * eps
            logp = gaussian_logp(mu, log_std, action)
            env_action = action_limit * jnp.clip(action, -1.0, 1.0)
            out = task.step_batch(env_s, env_action)
            tr = Transition(obs=obs, action=action, logp=logp, value=value,
                            reward=out.reward, done=out.done,
                            time_out=out.time_out, mu=mu, log_std=log_std,
                            ep_ret=out.state.ep_reward,
                            ep_len=out.state.progress.astype(F32))
            return (out.state, out.obs, key), tr

        (env_state, last_obs, key), traj = jax.lax.scan(
            step, (env_state, last_obs, ts.key), None, length=cfg.horizon)
        ts = ts._replace(key=key)
        return ts, env_state, last_obs, traj

    def compute_gae(ts: TrainState, traj: Transition, last_obs):
        _, _, last_value = _policy(ts.params, ts.obs_rms, last_obs)
        values = traj.value
        if cfg.normalize_value:
            values = ts.value_rms.denormalize(values)
            last_value = ts.value_rms.denormalize(last_value)
        rewards = traj.reward * cfg.reward_scale
        if cfg.value_bootstrap:
            # rl-games value_bootstrap: add gamma*V on timeout resets.
            rewards = rewards + cfg.gamma * values * \
                traj.time_out.astype(F32) * traj.done.astype(F32)
        not_done = 1.0 - traj.done.astype(F32)

        def body(carry, xs):
            gae = carry
            reward, value, next_value, nd = xs
            delta = reward + cfg.gamma * next_value * nd - value
            gae = delta + cfg.gamma * cfg.tau * nd * gae
            return gae, gae

        next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
        _, adv = jax.lax.scan(
            body, jnp.zeros_like(last_value),
            (rewards, values, next_values, not_done), reverse=True)
        returns = adv + values
        return adv, returns

    def update(ts: TrainState, batch, adv, returns):
        """cfg.mini_epochs passes of minibatch SGD with adaptive-KL LR."""
        n = adv.shape[0]
        num_mb = max(1, n // cfg.minibatch_size)

        if cfg.normalize_value:
            ts = ts._replace(
                value_rms=ts.value_rms.update(returns, axis_name=axis_name))
            returns_n = ts.value_rms.normalize(returns)
        else:
            returns_n = returns
        # batch.value is already in the network's (normalized) output space.
        old_values_n = batch.value

        if cfg.normalize_advantage:
            mean = _pmean(adv.mean())
            std = jnp.sqrt(_pmean(((adv - mean) ** 2).mean()))
            adv = (adv - mean) / (std + 1e-8)

        def loss_fn(params, mb):
            obs, action, old_logp, old_v, mb_adv, mb_ret, old_mu, old_sigma = mb
            x = ts.obs_rms.normalize(obs) if cfg.normalize_input else obs
            mu, log_std, value = _apply(params, x)
            logp = gaussian_logp(mu, log_std, action)
            ratio = jnp.exp(logp - old_logp)
            surr1 = mb_adv * ratio
            surr2 = mb_adv * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
            a_loss = -jnp.minimum(surr1, surr2).mean()

            if cfg.clip_value:
                v_clipped = old_v + jnp.clip(value - old_v,
                                             -cfg.e_clip, cfg.e_clip)
                c_loss = jnp.maximum((value - mb_ret) ** 2,
                                     (v_clipped - mb_ret) ** 2).mean()
            else:
                c_loss = ((value - mb_ret) ** 2).mean()

            entropy = jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e),
                              axis=-1).mean()
            b_loss = jnp.sum(
                jnp.maximum(mu - 1.1, 0.0) ** 2
                + jnp.maximum(-mu - 1.1, 0.0) ** 2, axis=-1).mean()
            total = (a_loss + 0.5 * cfg.critic_coef * c_loss
                     - cfg.entropy_coef * entropy
                     + cfg.bounds_loss_coef * b_loss)
            kl = gaussian_kl(old_mu, old_sigma, mu, log_std).mean()
            return total, (a_loss, c_loss, entropy, kl)

        def mb_step(carry, idx):
            params, opt_state, lr, key = carry
            mb = jax.tree.map(lambda x: x[idx],
                              (batch.obs, batch.action, batch.logp,
                               old_values_n, adv, returns_n, batch.mu,
                               batch.log_std))
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb)
            grads = _pmean_tree(grads, axis_name)
            kl = _pmean(aux[3])
            # Adaptive LR (rl-games AdaptiveScheduler).
            lr = jnp.where(kl > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
            lr = jnp.where(kl < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
            lr = jnp.clip(lr, 1e-6, cfg.lr_max)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state2, lr, key), (loss, aux[0], aux[1],
                                                   aux[2], kl)

        key = ts.key
        params, opt_state, lr = ts.params, ts.opt_state, ts.lr

        metrics = []
        for _ in range(cfg.mini_epochs):
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)
            idxs = perm[: num_mb * cfg.minibatch_size].reshape(num_mb, -1)
            (params, opt_state, lr, key), ms = jax.lax.scan(
                mb_step, (params, opt_state, lr, key), idxs)
            metrics.append(ms)

        loss, a_loss, c_loss, entropy, kl = jax.tree.map(
            lambda *xs: jnp.concatenate(xs).mean(), *metrics)
        ts = ts._replace(params=params, opt_state=opt_state, lr=lr, key=key,
                         epoch=ts.epoch + 1)
        return ts, {"loss": loss, "a_loss": a_loss, "c_loss": c_loss,
                    "entropy": entropy, "kl": kl, "lr": lr}

    def train_iter(ts: TrainState, env_state, last_obs):
        """One PPO epoch: rollout horizon steps, GAE, minibatch updates."""
        ts, env_state, last_obs, traj = rollout(ts, env_state, last_obs)
        if cfg.normalize_input:
            ts = ts._replace(obs_rms=ts.obs_rms.update(
                traj.obs.reshape(-1, task.num_obs), axis_name=axis_name))
        adv, returns = compute_gae(ts, traj, last_obs)

        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        ts, metrics = update(ts, flat, adv.reshape(-1), returns.reshape(-1))
        done_f = traj.done.astype(F32)
        n_done = done_f.sum()
        metrics.update({
            "reward_mean": traj.reward.mean(),
            "done_frac": done_f.mean(),
            "value_mean": traj.value.mean(),
            # Mean return/length of episodes that completed this iter
            # (RLGPUAlgoObserver's episode means, rlgames_utils.py:130-154).
            "ep_reward_mean": jnp.where(
                n_done > 0, (traj.ep_ret * done_f).sum() / n_done.clip(1), 0.0),
            "ep_len_mean": jnp.where(
                n_done > 0, (traj.ep_len * done_f).sum() / n_done.clip(1), 0.0),
            "ep_count": n_done,
        })
        return ts, env_state, last_obs, metrics

    return init_fn, train_iter, act_fn


def _pmean_tree(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), tree)
