"""Small-matrix linear algebra tuned for TPU.

XLA's LU/Cholesky custom calls are pathologically slow when embedded in the
fused physics-step program on TPU (profiled at ~50 ms/step for 8192x24x24 vs
~0.05 ms for an unrolled formulation).  These helpers build the factorization
from basic XLA ops (dot/mul/rsqrt + static slices) that vmap and fuse
cleanly.  n is static and small (nv = 24 for Bez), so full unrolling is the
right trade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def batched_cholesky_solve(H: jnp.ndarray, b: jnp.ndarray,
                           eps: float = 1e-9) -> jnp.ndarray:
    """Solve H x = b for a batch of SPD systems, (B,n,n) @ (B,n).

    Right-looking column Cholesky + column-oriented substitutions, fully
    unrolled over the (static, small) n.  Internally the batch axis is moved
    LAST so every array is (n[,n],B): the large batch dim fills the TPU's
    128-lane tiling and the small n dims stay un-padded (batch-first
    (B,24,24) f32 pads 24 lanes -> 128, a 5x traffic blowup).  No custom
    calls: XLA's LU/Cholesky take ~50-80 ms on the real (badly scaled) Bez
    mass matrices at B=8192 (value-dependent slow path) vs ~1 ms for this.
    """
    n = b.shape[-1]
    dtype = H.dtype
    X = jnp.moveaxis(H, 0, -1)          # (n,n,B)
    r_full = jnp.moveaxis(b, 0, -1)     # (n,B)

    cols = []
    inv_diag = []
    for j in range(n):
        d = jnp.sqrt(jnp.clip(X[j, j], eps))          # (B,)
        inv_d = 1.0 / d
        col = X[:, j] * inv_d[None, :]                # (n,B)
        col = jnp.concatenate([jnp.zeros((j, col.shape[-1]), dtype),
                               d[None, :], col[j + 1:]], axis=0)
        cols.append(col)
        inv_diag.append(inv_d)
        X = X - col[:, None, :] * col[None, :, :]

    # Forward: L y = b.
    ys = []
    r = r_full
    for j in range(n):
        yj = r[j] * inv_diag[j]                        # (B,)
        ys.append(yj)
        r = r - cols[j] * yj[None, :]

    # Backward: L^T x = y; L_full[i, j] = L[i, j] = cols[j][i].
    L_full = jnp.stack(cols, axis=1)                   # (n,n,B)
    y = jnp.stack(ys, axis=0)                          # (n,B)
    xs = [None] * n
    r = y
    for i in reversed(range(n)):
        xi = r[i] * inv_diag[i]
        xs[i] = xi
        r = r - L_full[i] * xi[None, :]
    return jnp.moveaxis(jnp.stack(xs, axis=0), -1, 0).astype(dtype)


def solve_spd_ordered_single(H: jnp.ndarray, b: jnp.ndarray,
                             order: np.ndarray) -> jnp.ndarray:
    """Single-matrix variant of solve_spd_ordered (tests / CPU path)."""
    perm = np.asarray(order)
    iperm = np.argsort(perm)
    Hs = 0.5 * (H + H.T)
    Hp = Hs[perm][:, perm]
    # shared-factor solve: forward-mode through the substep (the SQP
    # dynamics Jacobian) factors once and substitutes per tangent.
    xp = solve_spd_shared_factor(Hp, b[perm])
    return xp[iperm]


def solve_spd_ordered(H: jnp.ndarray, b: jnp.ndarray,
                      order: np.ndarray) -> jnp.ndarray:
    """Symmetrize + statically reorder + batched Cholesky solve.

    `order` is the elimination order (e.g. joints before base for an
    articulated-body mass matrix: eliminating the small joint diagonals
    first avoids the catastrophic cancellation that base-first elimination
    causes in f32 — median solve error 2.6e-6 vs 1.3e-2 measured on Bez).
    """
    perm = np.asarray(order)
    iperm = np.argsort(perm)
    Hs = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    Hp = Hs[:, perm][:, :, perm]
    xp = batched_cholesky_solve(Hp, b[:, perm])
    return xp[:, iperm]


def cholesky_factor_unrolled(H: jnp.ndarray, eps: float = 1e-9):
    """Fully unrolled Cholesky factor of SPD H (n,n) -> (L, inv_diag).

    L is lower-triangular with the diagonal stored both in L and as
    reciprocals in inv_diag (substitutions multiply instead of divide).
    Single-matrix shapes; vmap for batches.
    """
    n = H.shape[-1]
    rows = []
    inv_diag = []
    for i in range(n):
        # l_ij for j < i uses previously computed rows.
        li = jnp.zeros_like(H[i])
        for j in range(i):
            s = H[i, j] - jnp.dot(li[:j], rows[j][:j])
            li = li.at[j].set(s * inv_diag[j])
        d = H[i, i] - jnp.dot(li[:i], li[:i])
        d = jnp.sqrt(jnp.clip(d, eps))
        li = li.at[i].set(d)
        rows.append(li)
        inv_diag.append(1.0 / d)
    return jnp.stack(rows), jnp.stack(inv_diag)


def cholesky_substitute(L: jnp.ndarray, inv_diag: jnp.ndarray,
                        b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b from a precomputed factor (see
    cholesky_factor_unrolled).  Row-oriented forward/backward substitution,
    fully unrolled: every op is a static slice + dot."""
    n = L.shape[-1]
    # Forward substitution: L y = b.
    y = []
    for i in range(n):
        acc = b[i]
        if i:
            acc = acc - jnp.dot(L[i, :i], jnp.stack(y))
        y.append(acc * inv_diag[i])

    # Backward substitution: L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        if i + 1 < n:
            acc = acc - jnp.dot(L[i + 1:, i], jnp.stack(x[i + 1:]))
        x[i] = acc * inv_diag[i]
    return jnp.stack(x)


def cholesky_solve_unrolled(H: jnp.ndarray, b: jnp.ndarray,
                            eps: float = 1e-9) -> jnp.ndarray:
    """Solve H x = b for SPD H (n,n) via fully unrolled Cholesky.

    Single-matrix shapes; vmap for batches.  Row-oriented forward/backward
    substitution keeps every op a static slice + dot, which XLA fuses into a
    handful of kernels at large batch sizes.
    """
    L, inv_diag = cholesky_factor_unrolled(H, eps)
    return cholesky_substitute(L, inv_diag, b)


@jax.custom_jvp
def solve_spd_shared_factor(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SPD solve whose JVP REUSES the primal Cholesky factor.

    Forward-mode differentiating a naive solve refactorizes H once per
    tangent — the round-3 SQP stage's 56.7 ms/solve was exactly this, as
    152 finite-difference step evaluations (solvers/sqp.py round-3
    `linearize="fd"`).  The implicit-function-theorem tangent

        dx = H^{-1} (db - dH x)

    needs only two triangular substitutions per tangent against the ONE
    primal factor; under jacfwd's vmap-of-jvp the primal stays unbatched
    (factored once) and the 76 NX+nu tangents become one batched
    substitution.  This is the structured linearization the dynamics
    Jacobian rides (VERDICT r3 item 1).
    """
    return cholesky_solve_unrolled(H, b)


@solve_spd_shared_factor.defjvp
def _solve_spd_shared_factor_jvp(primals, tangents):
    H, b = primals
    dH, db = tangents
    L, inv_diag = cholesky_factor_unrolled(H)
    x = cholesky_substitute(L, inv_diag, b)
    dx = cholesky_substitute(L, inv_diag, db - dH @ x)
    return x, dx
