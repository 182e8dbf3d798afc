"""Actor-critic network + running normalization.

Parity with the reference rl-games model spec
(/root/reference/bez_isaacgym/cfg/train/bez_kickPPO.yaml): shared MLP
[400, 200, 100], ELU, continuous head with state-independent log-std
initialized to 0 (`fixed_sigma: True`, sigma_init 0, :14-28), input and value
running normalization (:51-52).

The MLP is sized for the MXU: batched over thousands of envs the three
matmuls dominate and XLA fuses the ELUs into them.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

F32 = jnp.float32


class ActorCritic(nn.Module):
    num_actions: int
    units: Sequence[int] = (400, 200, 100)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for u in self.units:
            x = nn.elu(nn.Dense(u)(x))
        mu = nn.Dense(self.num_actions)(x)
        value = nn.Dense(1)(x)[..., 0]
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.num_actions,))
        return mu, jnp.broadcast_to(log_std, mu.shape), value


class CentralValue(nn.Module):
    """Standalone value network for the runner's central-value option.

    The reference runner builds an optional separate central-value network
    from the train config (torch_runner.py:78-84); none of the shipped Bez
    configs enable it, so the minimal faithful surface is a detached critic
    MLP trained on the same observations (the Bez tasks expose no privileged
    state tensor to feed it — documented in docs/DEVIATIONS.md)."""

    units: Sequence[int] = (400, 200, 100)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for u in self.units:
            x = nn.elu(nn.Dense(u)(x))
        return nn.Dense(1)(x)[..., 0]


class RunningMeanStd(NamedTuple):
    """Streaming mean/var (rl-games running_mean_std parity)."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(shape=()) -> "RunningMeanStd":
        return RunningMeanStd(mean=jnp.zeros(shape, F32),
                              var=jnp.ones(shape, F32),
                              count=jnp.asarray(1e-4, F32))

    def update(self, batch: jnp.ndarray,
               axis_name: str | None = None) -> "RunningMeanStd":
        """Merge batch moments (batch axis 0 ... -2) via Chan's algorithm.

        axis_name: mesh axis to psum the batch moments over, so every data-
        parallel shard folds in the *global* batch and the replicated stats
        stay bit-identical across shards (single-host equivalence)."""
        axes = tuple(range(batch.ndim - self.mean.ndim))
        b_mean = jnp.mean(batch, axis=axes)
        b_var = jnp.var(batch, axis=axes)
        b_count = jnp.asarray(batch.size / max(1, self.mean.size), F32)
        if axis_name is not None:
            tot = jax.lax.psum(b_count, axis_name)
            g_mean = jax.lax.psum(b_mean * b_count, axis_name) / tot
            g_var = jax.lax.psum(
                (b_var + (b_mean - g_mean) ** 2) * b_count, axis_name) / tot
            b_mean, b_var, b_count = g_mean, g_var, tot
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta * delta * self.count * b_count / tot
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip((x - self.mean) * jax.lax.rsqrt(self.var + 1e-5),
                        -5.0, 5.0)

    def denormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jnp.sqrt(self.var + 1e-5) + self.mean


def gaussian_logp(mu, log_std, action):
    """Diagonal Gaussian log-density."""
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(-0.5 * ((action - mu) ** 2) / var - log_std
                   - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def gaussian_kl(mu1, log_std1, mu2, log_std2):
    """KL(p1 || p2) between diagonal Gaussians (rl-games adaptive-LR metric)."""
    v1, v2 = jnp.exp(2.0 * log_std1), jnp.exp(2.0 * log_std2)
    return jnp.sum(log_std2 - log_std1
                   + (v1 + (mu1 - mu2) ** 2) / (2.0 * v2) - 0.5, axis=-1)


class ActorCriticLSTM(nn.Module):
    """Recurrent actor-critic: LSTM before the MLP, input concatenated —
    the reference's commented-out rnn spec (bez_kickPPO.yaml:34-40: lstm,
    128 units, 1 layer, before_mlp, concat_input, no layer_norm)."""

    num_actions: int
    units: Sequence[int] = (400, 200, 100)
    lstm_units: int = 128
    concat_input: bool = True

    @nn.compact
    def __call__(self, obs, carry):
        """obs (B, num_obs), carry ((B, lstm), (B, lstm)) -> (carry', mu,
        log_std, value)."""
        cell = nn.OptimizedLSTMCell(self.lstm_units)
        carry, y = cell(carry, obs)
        x = jnp.concatenate([y, obs], axis=-1) if self.concat_input else y
        for u in self.units:
            x = nn.elu(nn.Dense(u)(x))
        mu = nn.Dense(self.num_actions)(x)
        value = nn.Dense(1)(x)[..., 0]
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.num_actions,))
        return carry, mu, jnp.broadcast_to(log_std, mu.shape), value

    def initial_carry(self, batch: int):
        z = jnp.zeros((batch, self.lstm_units), F32)
        return (z, z)
