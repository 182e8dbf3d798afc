"""Parallel-in-time Riccati == sequential Riccati (solvers/riccati.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.solvers.riccati import (parallel_backward,
                                              sequential_backward)


def _random_lqt(key, T, n, m, scale=0.9):
    ks = jax.random.split(key, 4)
    # Contractive A keeps the recursion well-conditioned in f32.
    A = scale * jax.random.orthogonal(ks[0], n, shape=(T,))
    B = jax.random.normal(ks[1], (T, n, m)) / jnp.sqrt(n)
    cx = jax.random.normal(ks[2], (T, n))
    cu = jax.random.normal(ks[3], (T, m))
    return A, B, cx, cu


@pytest.mark.parametrize("T,n,m", [(8, 6, 3), (32, 12, 5)])
def test_parallel_matches_sequential(T, n, m):
    A, B, cx, cu = _random_lqt(jax.random.PRNGKey(0), T, n, m)
    reg = 1e-2
    seq = jax.jit(lambda: sequential_backward(A, B, cx, cu, reg))()
    par = jax.jit(lambda: parallel_backward(A, B, cx, cu, reg))()
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(seq.k),
                               rtol=2e-3, atol=2e-4)


def test_parallel_matches_sequential_batched():
    """vmap over a solve batch (the SQP usage pattern)."""
    S, T, n, m = 4, 16, 8, 4
    keys = jax.random.split(jax.random.PRNGKey(1), S)
    A, B, cx, cu = jax.vmap(lambda k: _random_lqt(k, T, n, m))(keys)
    reg = 1e-3
    seq = jax.jit(jax.vmap(lambda a, b, x, u:
                           sequential_backward(a, b, x, u, reg)))(A, B, cx, cu)
    par = jax.jit(jax.vmap(lambda a, b, x, u:
                           parallel_backward(a, b, x, u, reg)))(A, B, cx, cu)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(seq.k),
                               rtol=5e-3, atol=5e-4)
