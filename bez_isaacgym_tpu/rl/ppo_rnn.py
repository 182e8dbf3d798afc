"""Recurrent PPO: LSTM policy with truncated BPTT over seq_len windows.

Implements the reference's commented-out rnn training option
(cfg/train/bez_kickPPO.yaml:34-40 lstm 128/1-layer/before_mlp/concat_input,
seq_len 4 at :78) the rl-games way:

- the rollout threads a per-env LSTM carry, zeroed when an episode ends
  (the player-side analog is play.py:196-199);
- training splits the horizon into seq_len windows, stores the carry at
  each window start, and replays the cell through the window (truncated
  BPTT) with the same done-zeroing — so minibatches are sampled over
  *sequences*, not steps;
- everything else (GAE, clipped losses, adaptive-KL LR, running norms,
  psum-for-DP) matches rl/ppo.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from bez_isaacgym_tpu.rl.networks import (ActorCriticLSTM, RunningMeanStd,
                                          gaussian_kl, gaussian_logp)
from bez_isaacgym_tpu.rl.ppo import PPOConfig, TrainState
from bez_isaacgym_tpu.tasks.base import BezTask

F32 = jnp.float32


class TransitionRNN(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray
    mu: jnp.ndarray
    log_std: jnp.ndarray
    carry_h: jnp.ndarray     # LSTM carry entering this step
    carry_c: jnp.ndarray
    ep_ret: jnp.ndarray      # episode return incl. this step (where done)
    ep_len: jnp.ndarray      # episode length (where done)


def make_ppo_rnn(task: BezTask, num_envs: int, cfg: PPOConfig,
                 axis_name: str | None = None):
    """Returns (init_fn, train_iter, act_fn, initial_carry).

    train_iter(ts, env_state, last_obs, carry) ->
        (ts, env_state, last_obs, carry, metrics)
    act_fn(ts, obs, carry, key=None, deterministic=True) -> (action, carry)
    """
    assert cfg.rnn_units > 0
    assert cfg.horizon % cfg.seq_len == 0, (cfg.horizon, cfg.seq_len)
    net = ActorCriticLSTM(num_actions=task.num_actions, units=cfg.units,
                          lstm_units=cfg.rnn_units)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.scale_by_adam(),
    )
    action_limit = 1.0   # act_space Box(-1,1) parity (see rl/ppo.py)

    def _pmean(x):
        if axis_name is None:
            return x
        return jax.lax.pmean(x, axis_name)

    def initial_carry(n: int | None = None):
        return net.initial_carry(n or num_envs)

    def init_fn(key) -> TrainState:
        k_net, k_state = jax.random.split(key)
        params = net.init(k_net, jnp.zeros((1, task.num_obs), F32),
                          net.initial_carry(1))
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            obs_rms=RunningMeanStd.create((task.num_obs,)),
            value_rms=RunningMeanStd.create(()),
            lr=jnp.asarray(cfg.learning_rate, F32),
            epoch=jnp.zeros((), jnp.int32),
            key=k_state,
        )

    def _apply(params, obs_rms, obs, carry):
        x = obs_rms.normalize(obs) if cfg.normalize_input else obs
        return net.apply(params, x, carry)

    def act_fn(ts: TrainState, obs, carry, key=None, deterministic=True):
        carry, mu, log_std, _ = _apply(ts.params, ts.obs_rms, obs, carry)
        a = mu if deterministic else mu + jnp.exp(log_std) * \
            jax.random.normal(key, mu.shape, F32)
        return action_limit * jnp.clip(a, -1.0, 1.0), carry

    def rollout(ts, env_state, last_obs, carry):
        def step(sc, _):
            env_s, obs, carry, key = sc
            key, k_act = jax.random.split(key)
            new_carry, mu, log_std, value = _apply(ts.params, ts.obs_rms,
                                                   obs, carry)
            eps = jax.random.normal(k_act, mu.shape, F32)
            action = mu + jnp.exp(log_std) * eps
            logp = gaussian_logp(mu, log_std, action)
            env_action = action_limit * jnp.clip(action, -1.0, 1.0)
            out = task.step_batch(env_s, env_action)
            tr = TransitionRNN(obs=obs, action=action, logp=logp, value=value,
                               reward=out.reward, done=out.done,
                               time_out=out.time_out, mu=mu, log_std=log_std,
                               carry_h=carry[1], carry_c=carry[0],
                               ep_ret=out.state.ep_reward,
                               ep_len=out.state.progress.astype(F32))
            # RNN-state reset on done (play.py:196-199 parity).
            d = out.done[:, None]
            new_carry = jax.tree.map(
                lambda c: jnp.where(d, 0.0, c), new_carry)
            return (out.state, out.obs, new_carry, key), tr

        (env_state, last_obs, carry, key), traj = jax.lax.scan(
            step, (env_state, last_obs, carry, ts.key), None,
            length=cfg.horizon)
        ts = ts._replace(key=key)
        return ts, env_state, last_obs, carry, traj

    def compute_gae(ts, traj, last_obs, carry):
        _, _, _, last_value = _apply(ts.params, ts.obs_rms, last_obs, carry)
        values = traj.value
        if cfg.normalize_value:
            values = ts.value_rms.denormalize(values)
            last_value = ts.value_rms.denormalize(last_value)
        rewards = traj.reward * cfg.reward_scale
        if cfg.value_bootstrap:
            rewards = rewards + cfg.gamma * values * \
                traj.time_out.astype(F32) * traj.done.astype(F32)
        not_done = 1.0 - traj.done.astype(F32)

        def body(gae, xs):
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

    def _to_sequences(x):
        """(H, N, ...) -> (num_seqs, seq_len, ...) with num_seqs = W*N."""
        H, N = x.shape[0], x.shape[1]
        W = H // cfg.seq_len
        x = x.reshape((W, cfg.seq_len, N) + x.shape[2:])
        x = jnp.moveaxis(x, 2, 0)                  # (N, W, L, ...)
        return x.reshape((N * W, cfg.seq_len) + x.shape[3:])

    def update(ts, traj, adv, returns):
        H, N = traj.reward.shape
        W = H // cfg.seq_len
        num_seqs = N * W
        mb_seqs = max(1, cfg.minibatch_size // cfg.seq_len)
        num_mb = max(1, num_seqs // mb_seqs)

        if cfg.normalize_value:
            ts = ts._replace(
                value_rms=ts.value_rms.update(returns, axis_name=axis_name))
            returns_n = ts.value_rms.normalize(returns)
        else:
            returns_n = returns

        if cfg.normalize_advantage:
            mean = _pmean(adv.mean())
            std = jnp.sqrt(_pmean(((adv - mean) ** 2).mean()))
            adv = (adv - mean) / (std + 1e-8)

        # Sequence-major views; window-start carries.
        seq = jax.tree.map(_to_sequences, traj)
        adv_s = _to_sequences(adv)
        ret_s = _to_sequences(returns_n)
        carry0 = (seq.carry_c[:, 0], seq.carry_h[:, 0])

        def loss_fn(params, mb):
            (obs, action, old_logp, old_v, mb_adv, mb_ret, old_mu,
             old_sigma, done, c0) = mb

            def cell_step(carry, xs):
                ob, dn = xs
                x = ts.obs_rms.normalize(ob) if cfg.normalize_input else ob
                carry2, mu, log_std, value = net.apply(params, x, carry)
                carry2 = jax.tree.map(
                    lambda c: jnp.where(dn[:, None], 0.0, c), carry2)
                return carry2, (mu, log_std, value)

            # scan over the seq_len axis (time within window).
            obs_t = jnp.swapaxes(obs, 0, 1)       # (L, mb, obs)
            done_t = jnp.swapaxes(done, 0, 1)
            _, (mu, log_std, value) = jax.lax.scan(
                cell_step, c0, (obs_t, done_t))
            mu = jnp.swapaxes(mu, 0, 1)
            log_std = jnp.swapaxes(log_std, 0, 1)
            value = jnp.swapaxes(value, 0, 1)

            logp = gaussian_logp(mu, log_std, action)
            ratio = jnp.exp(logp - old_logp)
            surr1 = mb_adv * ratio
            surr2 = mb_adv * jnp.clip(ratio, 1.0 - cfg.e_clip,
                                      1.0 + cfg.e_clip)
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
            mb = jax.tree.map(
                lambda x: x[idx],
                (seq.obs, seq.action, seq.logp, seq.value, adv_s, ret_s,
                 seq.mu, seq.log_std, seq.done))
            mb = mb + (jax.tree.map(lambda x: x[idx], carry0),)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb)
            if axis_name is not None:
                grads = jax.tree.map(
                    lambda g: jax.lax.pmean(g, axis_name), grads)
            kl = _pmean(aux[3])
            lr = jnp.where(kl > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
            lr = jnp.where(kl < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
            lr = jnp.clip(lr, 1e-6, cfg.lr_max)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, lr, key), (loss, aux[0], aux[1],
                                                  aux[2], kl)

        key = ts.key
        params, opt_state, lr = ts.params, ts.opt_state, ts.lr
        metrics = []
        for _ in range(cfg.mini_epochs):
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, num_seqs)
            idxs = perm[: num_mb * mb_seqs].reshape(num_mb, -1)
            (params, opt_state, lr, key), ms = jax.lax.scan(
                mb_step, (params, opt_state, lr, key), idxs)
            metrics.append(ms)

        loss, a_loss, c_loss, entropy, kl = jax.tree.map(
            lambda *xs: jnp.concatenate(xs).mean(), *metrics)
        ts = ts._replace(params=params, opt_state=opt_state, lr=lr, key=key,
                         epoch=ts.epoch + 1)
        return ts, {"loss": loss, "a_loss": a_loss, "c_loss": c_loss,
                    "entropy": entropy, "kl": kl, "lr": lr}

    def train_iter(ts, env_state, last_obs, carry):
        ts, env_state, last_obs, carry, traj = rollout(
            ts, env_state, last_obs, carry)
        if cfg.normalize_input:
            ts = ts._replace(obs_rms=ts.obs_rms.update(
                traj.obs.reshape(-1, task.num_obs), axis_name=axis_name))
        adv, returns = compute_gae(ts, traj, last_obs, carry)
        ts, metrics = update(ts, traj, adv, returns)
        done_f = traj.done.astype(F32)
        n_done = done_f.sum()
        metrics.update({
            "reward_mean": traj.reward.mean(),
            "done_frac": done_f.mean(),
            "value_mean": traj.value.mean(),
            "ep_reward_mean": jnp.where(
                n_done > 0, (traj.ep_ret * done_f).sum() / n_done.clip(1),
                0.0),
            "ep_len_mean": jnp.where(
                n_done > 0, (traj.ep_len * done_f).sum() / n_done.clip(1),
                0.0),
            "ep_count": n_done,
        })
        return ts, env_state, last_obs, carry, metrics

    return init_fn, train_iter, act_fn, initial_carry
