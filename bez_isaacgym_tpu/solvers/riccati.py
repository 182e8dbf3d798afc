"""Riccati backward passes: sequential scan + parallel-in-time associative scan.

The LQ subproblem solved each SQP iteration (solvers/sqp.py) is a
linear-quadratic tracking problem in deviation coordinates:

    dx_{t+1} = A_t dx_t + B_t du_t            (defect-free: linearized about
                                               the rolled-out nominal)
    cost_t   = cx_t^T dx_t + cu_t^T du_t
               + 1/2 reg (|dx_t|^2 + |du_t|^2)   (Gauss-Newton + LM)

`sequential_backward` is the classic O(T) Riccati recursion (lax.scan).
`parallel_backward` evaluates the same recursion in O(log T) parallel depth
with `jax.lax.associative_scan`, using the conditional-value-function
5-tuple elements of Särkkä & García-Fernández, "Temporal Parallelization of
Dynamic Programming and Linear Quadratic Control" (IEEE TAC 2021): each
element e = (A, b, C, eta, J) represents the control-minimized cost-to-go
between two times as a function of boundary states; composition is
associative, so the suffix value functions V_t for every t come out of one
associative scan.  On TPU this turns 32 dependent 58x58 steps into ~5
rounds of batched matmuls on the MXU (SURVEY.md §7 hard part 3).

Both return identical gains (tests/test_riccati.py asserts allclose).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bez_isaacgym_tpu.ops.linalg import cholesky_solve_unrolled


class LQGains(NamedTuple):
    k: jnp.ndarray    # (T, m) feedforward
    K: jnp.ndarray    # (T, m, n) feedback


@jax.default_matmul_precision("float32")
def sequential_backward(A, B, cx, cu, reg: float) -> LQGains:
    """Classic Riccati recursion (the round-1 sqp.py backward pass)."""
    T, n, _ = A.shape
    m = B.shape[-1]
    I_n = jnp.eye(n, dtype=A.dtype)

    def body(carry, inp):
        Vx, Vxx = carry
        A_t, B_t, cx_t, cu_t = inp
        Qx = cx_t + A_t.T @ Vx
        Qu = cu_t + B_t.T @ Vx
        Qxx = A_t.T @ Vxx @ A_t + reg * I_n
        Quu = B_t.T @ Vxx @ B_t + reg * jnp.eye(m, dtype=A.dtype)
        Qux = B_t.T @ Vxx @ A_t
        # Quu is SPD (Gauss-Newton + LM reg): one unrolled Cholesky with
        # [Qu | Qux] as stacked RHS — XLA's inv/LU custom calls inside the
        # scan are the slow path on TPU (ops/linalg.py module docstring).
        kK = -cholesky_solve_unrolled(
            Quu, jnp.concatenate([Qu[:, None], Qux], axis=1))
        k = kK[:, 0]
        K = kK[:, 1:]
        Vx_new = Qx + K.T @ Qu
        Vxx_new = Qxx + K.T @ Qux
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        return (Vx_new, Vxx_new), (k, K)

    init = (jnp.zeros(n, A.dtype), reg * I_n)
    _, (ks, Ks) = jax.lax.scan(body, init, (A, B, cx, cu), reverse=True)
    return LQGains(k=ks, K=Ks)


class _Elem(NamedTuple):
    """Conditional value function between two times (Särkkä-GF 2021 §III)."""

    A: jnp.ndarray     # (n, n)
    b: jnp.ndarray     # (n,)
    C: jnp.ndarray     # (n, n)
    eta: jnp.ndarray   # (n,)
    J: jnp.ndarray     # (n, n)


def _combine(ei: _Elem, ej: _Elem) -> _Elem:
    """e_i covers [s, t), e_j covers [t, r) -> combined covers [s, r)."""
    n = ei.A.shape[-1]
    I = jnp.eye(n, dtype=ei.A.dtype)
    # (I + C_i J_j) and (I + J_j C_i) solves shared by all five outputs.
    M1 = jnp.linalg.solve(I + ei.C @ ej.J, jnp.concatenate(
        [ei.A, (ei.b + ei.C @ ej.eta)[:, None], ei.C], axis=1))
    S_A = M1[:, :n]
    S_b = M1[:, n]
    S_C = M1[:, n + 1:]
    M2 = jnp.linalg.solve(I + ej.J @ ei.C, jnp.concatenate(
        [(ej.eta - ej.J @ ei.b)[:, None], ej.J @ ei.A], axis=1))
    T_eta = M2[:, 0]
    T_JA = M2[:, 1:]
    return _Elem(
        A=ej.A @ S_A,
        b=ej.A @ S_b + ej.b,
        C=ej.A @ S_C @ ej.A.T + ej.C,
        eta=ei.A.T @ T_eta + ei.eta,
        J=ei.A.T @ T_JA + ei.J,
    )


@jax.default_matmul_precision("float32")
def parallel_backward(A, B, cx, cu, reg: float) -> LQGains:
    """Associative-scan Riccati: same gains as sequential_backward.

    Matmul precision is pinned to f32: the suffix composition chain
    amplifies the TPU's default bf16 matmul rounding into percent-level
    gain errors.

    Element init (control linear term cu absorbed via the shift
    v = du + U^{-1} cu, which only changes constants):
      A_t   = A_t
      b_t   = -B_t U^{-1} cu_t
      C_t   = B_t U^{-1} B_t^T           (U = reg I)
      eta_t = -cx_t                       (V linear term: Vx = J x - eta)
      J_t   = reg I                       (LM state cost)
    Terminal element: (0, 0, 0, 0, reg I).
    """
    T, n, _ = A.shape
    m = B.shape[-1]
    dt = A.dtype
    inv_reg = 1.0 / reg

    elems = _Elem(
        A=A,
        b=-inv_reg * jnp.einsum("tnm,tm->tn", B, cu),
        C=inv_reg * jnp.einsum("tnm,tkm->tnk", B, B),
        eta=-cx,
        J=jnp.broadcast_to(reg * jnp.eye(n, dtype=dt), (T, n, n)),
    )
    terminal = _Elem(
        A=jnp.zeros((1, n, n), dt), b=jnp.zeros((1, n), dt),
        C=jnp.zeros((1, n, n), dt), eta=jnp.zeros((1, n), dt),
        J=reg * jnp.eye(n, dtype=dt)[None],
    )
    all_elems = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                             elems, terminal)

    # NB: with reverse=True, associative_scan feeds the operator
    # (later-suffix, earlier-element); _combine expects (earlier, later).
    suffix = jax.lax.associative_scan(
        jax.vmap(lambda a, b: _combine(b, a)), all_elems, reverse=True)
    # V_{t+1}: quadratic J, linear -eta, for t = 0..T-1.
    J_next = suffix.J[1:]
    eta_next = suffix.eta[1:]

    # Recover gains exactly as the sequential pass would:
    #   Vx_{t+1} = -eta_{t+1}; Vxx_{t+1} = J_{t+1}
    Qu = cu + jnp.einsum("tnm,tn->tm", B, -eta_next)
    Quu = reg * jnp.eye(m, dtype=dt)[None] \
        + jnp.einsum("tnm,tnk,tkl->tml", B, J_next, B)
    Qux = jnp.einsum("tnm,tnk,tkl->tml", B, J_next, A)
    # SPD Quu: unrolled Cholesky with stacked RHS (no LU custom calls).
    kK = -jax.vmap(cholesky_solve_unrolled)(
        Quu, jnp.concatenate([Qu[..., None], Qux], axis=-1))
    return LQGains(k=kK[..., 0], K=kK[..., 1:])
