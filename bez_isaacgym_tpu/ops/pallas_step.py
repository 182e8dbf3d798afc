"""Fused Pallas TPU kernel for the physics substep.

The XLA path (ops.engine) spends ~93% of its time on HBM layout copies and
padding around small (B,19,...) tensors (profiled 17.5 ms/substep at
B=8192 on v5e, vs ~1 ms of theoretical traffic).  This kernel runs the
ENTIRE substep — FK, Jacobian columns, mass matrix, bias forces, contacts,
implicit LHS, Cholesky solve, integration — inside VMEM for a tile of
environments, with the batch dimension living in the TPU's 128-lane axis.

Data layout: every quantity is a python-level structure (tuples/lists) of
(bT,) lane-vectors; per-env "scalars" are lanes.  The kernel is generated
from the RobotModel's static topology (ancestor lists, contact tables), so
all loops unroll at trace time and there is no dynamic control flow.

Numerics match ops.engine._substep (same formulation, same joints-first
Cholesky ordering); tests/test_pallas.py checks agreement to f32 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bez_isaacgym_tpu.models.robot import RobotModel
from bez_isaacgym_tpu.ops.engine import PhysicsState, SceneConfig

# ---------------------------------------------------------------------------
# Small vector/matrix helpers over lane-vectors.
# Vec3 = [x, y, z] (each (bT,)); Mat3 = [[...3 rows of Vec3...]].
# ---------------------------------------------------------------------------


def v(*xs):
    return list(xs)


def v_add(a, b):
    return [a[i] + b[i] for i in range(3)]


def v_sub(a, b):
    return [a[i] - b[i] for i in range(3)]


def v_scale(a, s):
    return [a[i] * s for i in range(3)]


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def m_vec(M, x):
    return [v_dot(M[i], x) for i in range(3)]


def m_tvec(M, x):
    """M^T x."""
    return [M[0][i] * x[0] + M[1][i] * x[1] + M[2][i] * x[2]
            for i in range(3)]


def m_mul(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def m_const(M_np, like):
    """Static numpy 3x3 -> Mat3 of broadcast lane-vectors."""
    return [[jnp.full_like(like, float(M_np[i, j])) for j in range(3)]
            for i in range(3)]


def quat_to_mat(qx, qy, qz, qw):
    two_s = 2.0 / (qx * qx + qy * qy + qz * qz + qw * qw)
    return [
        [1 - two_s * (qy * qy + qz * qz), two_s * (qx * qy - qz * qw),
         two_s * (qx * qz + qy * qw)],
        [two_s * (qx * qy + qz * qw), 1 - two_s * (qx * qx + qz * qz),
         two_s * (qy * qz - qx * qw)],
        [two_s * (qx * qz - qy * qw), two_s * (qy * qz + qx * qw),
         1 - two_s * (qx * qx + qy * qy)],
    ]


def axis_angle_mat(axis_np, theta):
    """Rotation about a STATIC unit axis by a lane-vector angle."""
    ax, ay, az = (float(axis_np[0]), float(axis_np[1]), float(axis_np[2]))
    c, s = jnp.cos(theta), jnp.sin(theta)
    C = 1.0 - c
    return [
        [c + ax * ax * C, ax * ay * C - az * s, ax * az * C + ay * s],
        [ay * ax * C + az * s, c + ay * ay * C, ay * az * C - ax * s],
        [az * ax * C - ay * s, az * ay * C + ax * s, c + az * az * C],
    ]


def _ancestors(model: RobotModel) -> list[list[int]]:
    """Per body: list of ancestor DOF indices (root-to-leaf order)."""
    out = []
    for b in range(model.nb):
        anc = []
        cur = b
        while cur > 0:
            anc.append(cur - 1)
            cur = int(model.parent[cur])
        out.append(sorted(anc))
    return out


# ---------------------------------------------------------------------------
# Kernel body generator.
# ---------------------------------------------------------------------------

def _substep_kernel(model: RobotModel, cfg: SceneConfig, h: float,
                    # refs (all (d, bT) in VMEM):
                    q_ref, qd_ref, bpos_ref, bquat_ref, bu_ref,
                    ballp_ref, ballq_ref, ballv_ref, ballw_ref,
                    kp_ref, kd_ref, eff_ref, arm_ref, jfric_ref,
                    mscale_ref, mu_ref, grav_ref, tgt_ref,
                    lolim_ref, uplim_ref,
                    # outputs:
                    oq_ref, oqd_ref, obpos_ref, obquat_ref, obu_ref,
                    oballp_ref, oballq_ref, oballv_ref, oballw_ref,
                    osens_ref, obcf_ref):
    nb, nq = model.nb, model.nq
    nv = 6 + nq
    anc = _ancestors(model)
    coeffs = cfg.coeffs

    q = [q_ref[j] for j in range(nq)]
    qd = [qd_ref[j] for j in range(nq)]
    base_pos = [bpos_ref[i] for i in range(3)]
    bq = [bquat_ref[i] for i in range(4)]
    u = [bu_ref[i] for i in range(6)] + qd
    w0 = u[3:6]
    v0 = u[0:3]
    grav = [grav_ref[i] for i in range(3)]
    mu = mu_ref[0]

    # ---------------- FK ---------------------------------------------------
    R = [None] * nb
    P = [None] * nb
    C = [None] * nb
    AXW = [None] * nq     # world joint axes
    ANC = [None] * nq     # world anchors
    R[0] = quat_to_mat(bq[0], bq[1], bq[2], bq[3])
    P[0] = base_pos
    for b in range(1, nb):
        p = int(model.parent[b])
        d = b - 1
        tp = model.tree_pos[b]
        anchor = v_add(P[p], m_vec(R[p], [jnp.full_like(q[0], float(tp[0])),
                                          jnp.full_like(q[0], float(tp[1])),
                                          jnp.full_like(q[0], float(tp[2]))]))
        R_pre = m_mul(R[p], m_const(model.tree_rot[b], q[0]))
        Rj = axis_angle_mat(model.axis[d], q[d])
        R[b] = m_mul(R_pre, Rj)
        P[b] = anchor
        ax = model.axis[d]
        AXW[d] = m_vec(R_pre, [jnp.full_like(q[0], float(ax[0])),
                               jnp.full_like(q[0], float(ax[1])),
                               jnp.full_like(q[0], float(ax[2]))])
        ANC[d] = anchor
    for b in range(nb):
        cm = model.com[b]
        C[b] = v_add(P[b], m_vec(R[b], [jnp.full_like(q[0], float(cm[0])),
                                        jnp.full_like(q[0], float(cm[1])),
                                        jnp.full_like(q[0], float(cm[2]))]))

    # ---------------- body velocities & bias accelerations -----------------
    W = [None] * nb       # angular velocity
    Vc = [None] * nb      # COM linear velocity
    AL0 = [None] * nb     # alpha0 (qdd=0)
    AC0 = [None] * nb     # a_com0
    W[0] = w0
    r0 = v_sub(C[0], P[0])
    Vc[0] = v_add(v0, v_cross(w0, r0))
    AL0[0] = [jnp.zeros_like(q[0])] * 3
    AC0[0] = v_cross(w0, v_cross(w0, r0))
    for b in range(1, nb):
        p = int(model.parent[b])
        d = b - 1
        W[b] = v_add(W[p], v_scale(AXW[d], qd[d]))
        r_pa = v_sub(ANC[d], C[p])
        r_ac = v_sub(C[b], ANC[d])
        Vc[b] = v_add(v_add(Vc[p], v_cross(W[p], r_pa)),
                      v_cross(W[b], r_ac))
        AL0[b] = v_add(AL0[p], v_cross(W[p], v_scale(AXW[d], qd[d])))
        a_anchor = v_add(v_add(AC0[p], v_cross(AL0[p], r_pa)),
                         v_cross(W[p], v_cross(W[p], r_pa)))
        AC0[b] = v_add(v_add(a_anchor, v_cross(AL0[b], r_ac)),
                       v_cross(W[b], v_cross(W[b], r_ac)))

    # ---------------- contacts (plane) -------------------------------------
    # Per-body accumulators: force F_b, torque N_b, 6x6 damping W_b.
    zero = jnp.zeros_like(q[0])
    F = [[zero, zero, zero] for _ in range(nb)]
    N = [[zero, zero, zero] for _ in range(nb)]
    # W_b stored via moment sums (same decomposition as ops.engine).
    Wm = [{k: zero for k in ("dt", "x", "y", "z", "xx", "yy", "zz", "xy",
                             "xz", "yz", "g", "gx", "gy", "gxx", "gyy",
                             "gxy")} for _ in range(nb)]
    sens = [zero] * 8
    kn, cn, vt_eps = coeffs.kn, coeffs.cn, coeffs.vt_eps

    for ci in range(len(model.cpoint_body)):
        b = int(model.cpoint_body[ci])
        cp = model.cpoint_pos[ci]
        slot = int(model.cpoint_sensor[ci])
        pw = v_add(P[b], m_vec(R[b], [jnp.full_like(zero, float(cp[0])),
                                      jnp.full_like(zero, float(cp[1])),
                                      jnp.full_like(zero, float(cp[2]))]))
        r = v_sub(pw, C[b])
        vp = v_add(Vc[b], v_cross(W[b], r))
        pen = -pw[2]
        active = pen > 0.0
        fn = jnp.maximum(kn * pen - cn * vp[2], 0.0) * active
        # sqrt(ssq + eps^2): matches ops.contact._friction_dir (smooth form)
        vt_norm = jnp.sqrt(vp[0] * vp[0] + vp[1] * vp[1] + vt_eps * vt_eps)
        scale = -mu * fn / vt_norm
        f = [vp[0] * scale, vp[1] * scale, fn]
        F[b] = v_add(F[b], f)
        N[b] = v_add(N[b], v_cross(r, f))
        if slot >= 0:
            sens[slot] = sens[slot] + fn
        # implicit damping moments
        fn_est = jnp.maximum(kn * pen, 0.0) * active
        d_t = mu * fn_est / vt_norm
        d_n = cn * active
        g = d_n - d_t
        M = Wm[b]
        x, y, z = r
        M["dt"] += d_t
        M["x"] += d_t * x; M["y"] += d_t * y; M["z"] += d_t * z
        M["xx"] += d_t * x * x; M["yy"] += d_t * y * y; M["zz"] += d_t * z * z
        M["xy"] += d_t * x * y; M["xz"] += d_t * x * z; M["yz"] += d_t * y * z
        M["g"] += g; M["gx"] += g * x; M["gy"] += g * y
        M["gxx"] += g * x * x; M["gyy"] += g * y * y; M["gxy"] += g * x * y

    # ---------------- ball -------------------------------------------------
    ballp = [ballp_ref[i] for i in range(3)]
    ballv = [ballv_ref[i] for i in range(3)]
    ballw = [ballw_ref[i] for i in range(3)]
    ball_F = [zero, zero, zero]
    ball_N = [zero, zero, zero]
    if cfg.has_ball:
        rad = cfg.ball_radius
        bkn, bcn = coeffs.ball_kn, coeffs.ball_cn
        # sphere-plane
        pen = rad - ballp[2]
        cpnt = [ballp[0], ballp[1], ballp[2] - rad]
        vp = v_add(ballv, v_cross(ballw, v_sub(cpnt, ballp)))
        fn = jnp.maximum(bkn * pen - bcn * vp[2], 0.0) * (pen > 0.0)
        vt_norm = jnp.sqrt(vp[0] * vp[0] + vp[1] * vp[1] + vt_eps * vt_eps)
        s = -mu * fn / vt_norm
        fpl = [vp[0] * s, vp[1] * s, fn]
        ball_F = v_add(ball_F, fpl)
        ball_N = v_add(ball_N, v_cross(v_sub(cpnt, ballp), fpl))
        wn = jnp.sqrt(v_dot(ballw, ballw) + 1e-12)
        roll = -cfg.ball_rolling_friction * fn * rad
        ball_N = v_add(ball_N, v_scale(ballw, roll / wn))
        # sphere-box per robot box
        for k in range(len(model.box_body)):
            b = int(model.box_body[k])
            bp = model.box_pos[k]
            br = model.box_rot[k]
            half = model.box_half[k]
            box_c = v_add(P[b], m_vec(R[b], [jnp.full_like(zero, float(bp[0])),
                                             jnp.full_like(zero, float(bp[1])),
                                             jnp.full_like(zero, float(bp[2]))]))
            Rbox = m_mul(R[b], m_const(np.asarray(br), zero))
            local = m_tvec(Rbox, v_sub(ballp, box_c))
            cl = [jnp.clip(local[i], -float(half[i]), float(half[i]))
                  for i in range(3)]
            closest = v_add(box_c, m_vec(Rbox, cl))
            delta = v_sub(ballp, closest)
            dist = jnp.sqrt(v_dot(delta, delta) + 1e-12)
            inv = 1.0 / (dist + 1e-9)
            n_ok = dist > 1e-6
            nrm = [jnp.where(n_ok, delta[0] * inv, 0.0),
                   jnp.where(n_ok, delta[1] * inv, 0.0),
                   jnp.where(n_ok, delta[2] * inv, 1.0)]
            pen = rad - dist
            vbp = v_add(ballv, v_cross(ballw, v_sub(closest, ballp)))
            rb = v_sub(closest, C[b])
            vrp = v_add(Vc[b], v_cross(W[b], rb))
            rel = v_sub(vbp, vrp)
            vn = v_dot(rel, nrm)
            fn = jnp.maximum(bkn * pen - bcn * vn, 0.0) * (pen > 0.0)
            vt = v_sub(rel, v_scale(nrm, vn))
            vtn = jnp.sqrt(v_dot(vt, vt) + vt_eps * vt_eps)
            fb = v_sub(v_scale(nrm, fn), v_scale(vt, mu * fn / vtn))
            ball_F = v_add(ball_F, fb)
            ball_N = v_add(ball_N, v_cross(v_sub(closest, ballp), fb))
            F[b] = v_sub(F[b], fb)
            N[b] = v_sub(N[b], v_cross(rb, fb))
        ball_F = v_add(ball_F, v_scale(grav, cfg.ball_mass))

    # ---------------- Jacobian columns per body ----------------------------
    # col v in 0..nv-1: (lin Vec3, ang Vec3); only active columns stored.
    e = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]

    def cols_of(b):
        cols = {}
        rb0 = v_sub(C[b], P[0])
        for k in range(3):
            ek = [jnp.full_like(zero, e[k][i]) for i in range(3)]
            cols[k] = (ek, [zero, zero, zero])
            cols[3 + k] = (v_cross(ek, rb0), ek)
        for d in anc[b]:
            lin = v_cross(AXW[d], v_sub(C[b], ANC[d]))
            cols[6 + d] = (lin, AXW[d])
        return cols

    # ---------------- per-body spatial inertia G ---------------------------
    def G_of(b):
        ms = mscale_ref[b]
        m_b = float(model.mass[b]) * ms
        # I_w = R I R^T * mass_scale
        I_b = m_const(model.inertia[b], zero)
        I_w = m_mul(m_mul(R[b], I_b), [[R[b][j][i] for j in range(3)]
                                       for i in range(3)])
        I_w = [[I_w[i][j] * ms for j in range(3)] for i in range(3)]
        # contact damping 6x6 from moments
        M = Wm[b]
        A = [[h * M["dt"] + m_b, zero, zero],
             [zero, h * M["dt"] + m_b, zero],
             [zero, zero, h * (M["dt"] + M["g"]) + m_b]]
        B = [[zero, h * M["z"], -h * M["y"]],
             [-h * M["z"], zero, h * M["x"]],
             [h * (M["y"] + M["gy"]), -h * (M["x"] + M["gx"]), zero]]
        E = [[h * (M["zz"] + M["yy"] + M["gyy"]) + I_w[0][0],
              -h * (M["xy"] + M["gxy"]) + I_w[0][1],
              -h * M["xz"] + I_w[0][2]],
             [None,
              h * (M["zz"] + M["xx"] + M["gxx"]) + I_w[1][1],
              -h * M["yz"] + I_w[1][2]],
             [None, None, h * (M["xx"] + M["yy"]) + I_w[2][2]]]
        E[1][0] = E[0][1]
        E[2][0] = E[0][2]
        E[2][1] = E[1][2]
        return A, B, E

    # ---------------- assemble H (upper triangle) + rhs --------------------
    H = [[None] * nv for _ in range(nv)]
    tau = [None] * nv

    # actuation rhs
    for j in range(nq):
        kpj, kdj = kp_ref[j], kd_ref[j]
        effj = eff_ref[j]
        t_pd = kpj * (tgt_ref[j] - q[j]) - (h * kpj + kdj) * qd[j]
        t_pd = jnp.clip(t_pd, -effj, effj)
        c_f = jfric_ref[j] / (jnp.abs(qd[j]) + cfg.friction_vel_scale)
        tau[6 + j] = t_pd - c_f * qd[j]
    for vk in range(6):
        tau[vk] = zero

    for b in range(nb):
        cols = cols_of(b)
        A, B, E = G_of(b)
        ms = mscale_ref[b]
        m_b = float(model.mass[b]) * ms
        # rhs wrench: f_net = F - m(a0 - g); n_net = N - I alpha0 - w x I w
        I_b = m_const(model.inertia[b], zero)
        I_w = m_mul(m_mul(R[b], I_b), [[R[b][j][i] for j in range(3)]
                                       for i in range(3)])
        I_w = [[I_w[i][j] * ms for j in range(3)] for i in range(3)]
        f_net = v_sub(F[b], v_scale(v_sub(AC0[b], grav), m_b))
        n_net = v_sub(v_sub(N[b], m_vec(I_w, AL0[b])),
                      v_cross(W[b], m_vec(I_w, W[b])))
        keys = sorted(cols.keys())
        # G @ col for each active col (6-vector)
        Gcol = {}
        for ck in keys:
            lin, ang = cols[ck]
            top = v_add(m_vec(A, lin), m_vec(B, ang))
            bot = v_add(m_tvec(B, lin), m_vec(E, ang))
            Gcol[ck] = (top, bot)
        for i1, ck in enumerate(keys):
            lin, ang = cols[ck]
            tau[ck] = tau[ck] + v_dot(lin, f_net) + v_dot(ang, n_net)
            for ck2 in keys[i1:]:
                t2, b2 = Gcol[ck2]
                val = v_dot(lin, t2) + v_dot(ang, b2)
                if H[ck][ck2] is None:
                    H[ck][ck2] = val
                else:
                    H[ck][ck2] = H[ck][ck2] + val

    # diagonal extras
    for j in range(nq):
        kpj, kdj = kp_ref[j], kd_ref[j]
        c_f = jfric_ref[j] / (jnp.abs(qd[j]) + cfg.friction_vel_scale)
        extra = arm_ref[j] + h * (h * kpj + kdj + c_f)
        H[6 + j][6 + j] = (H[6 + j][6 + j] + extra
                          if H[6 + j][6 + j] is not None else extra)

    def H_at(i, j):
        i2, j2 = (i, j) if i <= j else (j, i)
        val = H[i2][j2]
        return val if val is not None else zero

    # ---------------- Cholesky solve (joints-first order) ------------------
    order = list(range(6, nv)) + list(range(6))
    Hp = [[H_at(order[i], order[j]) for j in range(nv)] for i in range(nv)]
    bp = [tau[order[i]] for i in range(nv)]

    L = [[None] * nv for _ in range(nv)]
    inv_d = [None] * nv
    X = Hp
    for j in range(nv):
        dval = jnp.sqrt(jnp.maximum(X[j][j], 1e-9))
        invd = 1.0 / dval
        inv_d[j] = invd
        L[j][j] = dval
        for i in range(j + 1, nv):
            L[i][j] = X[i][j] * invd
        newX = [[None] * nv for _ in range(nv)]
        for i in range(j + 1, nv):
            for k in range(j + 1, i + 1):
                newX[i][k] = X[i][k] - L[i][j] * L[k][j]
        X = newX
    y = [None] * nv
    r = bp
    for j in range(nv):
        yj = r[j] * inv_d[j]
        y[j] = yj
        r = [r[i] - L[i][j] * yj if i > j else r[i] for i in range(nv)]
    xs = [None] * nv
    r = y
    for i in reversed(range(nv)):
        xi = r[i] * inv_d[i]
        xs[i] = xi
        r = [r[k] - L[i][k] * xi if k < i else r[k] for k in range(nv)]
    udot = [None] * nv
    for i in range(nv):
        udot[order[i]] = xs[i]

    # ---------------- integrate -------------------------------------------
    u_new = [u[i] + h * udot[i] for i in range(nv)]
    cap = cfg.max_joint_vel
    for j in range(nq):
        qdn = jnp.clip(u_new[6 + j], -cap, cap)
        qn = q[j] + h * qdn
        lo, hi = lolim_ref[j], uplim_ref[j]   # per-env DR-able joint limits
        qc = jnp.clip(qn, lo, hi)
        at_lim = (qn < lo) | (qn > hi)
        qdn = jnp.where(at_lim, 0.0, qdn)
        oq_ref[j] = qc
        oqd_ref[j] = qdn
    # Base velocity caps (extreme-impact stability guards; see
    # ops.engine.SceneConfig.max_base_*).
    for i in range(3):
        u_new[i] = jnp.clip(u_new[i], -cfg.max_base_lin_vel,
                            cfg.max_base_lin_vel)
        u_new[3 + i] = jnp.clip(u_new[3 + i], -cfg.max_base_ang_vel,
                                cfg.max_base_ang_vel)
    for i in range(3):
        obpos_ref[i] = base_pos[i] + h * u_new[i]
    # quaternion exp-map integration
    wx, wy, wz = u_new[3], u_new[4], u_new[5]
    ang = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    half = 0.5 * ang * h
    sinc = jnp.where(ang > 1e-9, jnp.sin(half) / jnp.maximum(ang, 1e-9),
                     0.5 * h)
    dq = [wx * sinc, wy * sinc, wz * sinc, jnp.cos(half)]
    qx, qy, qz, qw = bq
    nqx = dq[3] * qx + dq[0] * qw + dq[1] * qz - dq[2] * qy
    nqy = dq[3] * qy - dq[0] * qz + dq[1] * qw + dq[2] * qx
    nqz = dq[3] * qz + dq[0] * qy - dq[1] * qx + dq[2] * qw
    nqw = dq[3] * qw - dq[0] * qx - dq[1] * qy - dq[2] * qz
    qnorm = jax.lax.rsqrt(nqx * nqx + nqy * nqy + nqz * nqz + nqw * nqw)
    obquat_ref[0] = nqx * qnorm
    obquat_ref[1] = nqy * qnorm
    obquat_ref[2] = nqz * qnorm
    obquat_ref[3] = nqw * qnorm
    for i in range(6):
        obu_ref[i] = u_new[i]

    if cfg.has_ball:
        bm, bi = cfg.ball_mass, cfg.ball_inertia
        bv_new = [jnp.clip(ballv[i] + h * ball_F[i] / bm,
                           -cfg.max_ball_vel, cfg.max_ball_vel)
                  for i in range(3)]
        bw_new = [ballw[i] + h * ball_N[i] / bi for i in range(3)]
        for i in range(3):
            oballv_ref[i] = bv_new[i]
            oballw_ref[i] = bw_new[i]
            oballp_ref[i] = ballp[i] + h * bv_new[i]
        # ball quaternion
        wx, wy, wz = bw_new
        ang = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        half = 0.5 * ang * h
        sinc = jnp.where(ang > 1e-9, jnp.sin(half) / jnp.maximum(ang, 1e-9),
                         0.5 * h)
        dq = [wx * sinc, wy * sinc, wz * sinc, jnp.cos(half)]
        qx, qy, qz, qw = (ballq_ref[0], ballq_ref[1], ballq_ref[2],
                          ballq_ref[3])
        nx = dq[3] * qx + dq[0] * qw + dq[1] * qz - dq[2] * qy
        ny = dq[3] * qy - dq[0] * qz + dq[1] * qw + dq[2] * qx
        nz = dq[3] * qz + dq[0] * qy - dq[1] * qx + dq[2] * qw
        nw = dq[3] * qw - dq[0] * qx - dq[1] * qy - dq[2] * qz
        nn = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + nw * nw)
        oballq_ref[0] = nx * nn
        oballq_ref[1] = ny * nn
        oballq_ref[2] = nz * nn
        oballq_ref[3] = nw * nn
    else:
        for i in range(3):
            oballv_ref[i] = ballv[i]
            oballw_ref[i] = ballw[i]
            oballp_ref[i] = ballp[i]
        for i in range(4):
            oballq_ref[i] = ballq_ref[i]

    for s in range(8):
        osens_ref[s] = sens[s]
    for b in range(nb):
        for i in range(3):
            obcf_ref[3 * b + i] = F[b][i]


# ---------------------------------------------------------------------------
# Host wrapper.
# ---------------------------------------------------------------------------

def make_pallas_step_fn(model: RobotModel, cfg: SceneConfig,
                        block_b: int = 256, interpret: bool = False):
    """Batched step via the fused Pallas kernel.

    Returns step_fn(params, states, targets) with the same signature/layout
    as ops.engine.make_batched_step_fn (leading env axis, batched params).
    """
    nb, nq = model.nb, model.nq
    h = cfg.dt / cfg.substeps

    kernel = functools.partial(_substep_kernel, model, cfg, h)

    in_dims = [nq, nq, 3, 4, 6, 3, 4, 3, 3,              # state
               nq, nq, nq, nq, nq, nb, 1, 3, nq, nq, nq]  # params + targets
                                                          # + joint limits
    out_dims = [nq, nq, 3, 4, 6, 3, 4, 3, 3, 8, 3 * nb]

    def call(*flat_inputs):
        B = flat_inputs[0].shape[-1]
        grid = (B // block_b,)
        in_specs = [pl.BlockSpec((d, block_b), lambda i: (0, i),
                                 memory_space=pltpu.VMEM) for d in in_dims]
        out_specs = [pl.BlockSpec((d, block_b), lambda i: (0, i),
                                  memory_space=pltpu.VMEM) for d in out_dims]
        out_shape = [jax.ShapeDtypeStruct((d, B), jnp.float32)
                     for d in out_dims]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*flat_inputs)

    def to_bl(x):   # (B, d) -> (d, B)
        return jnp.swapaxes(jnp.asarray(x, jnp.float32), 0, 1)

    def step_fn(params, states: PhysicsState, targets):
        B = states.q.shape[0]
        pad = (-B) % block_b
        if pad:
            def padded(x):
                x = jnp.asarray(x)
                if x.ndim == 0 or x.shape[0] != B:
                    return x
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], 0)
            states = jax.tree.map(padded, states)
            params = jax.tree.map(padded, params)
            targets = padded(targets)
        return_slice = slice(0, B)
        B = B + pad
        mu = jnp.broadcast_to(
            jnp.asarray(params.ground_friction, jnp.float32).reshape(-1, 1),
            (B, 1))
        flat = [
            to_bl(states.q), to_bl(states.qd), to_bl(states.base_pos),
            to_bl(states.base_quat), to_bl(states.base_u),
            to_bl(states.ball_pos), to_bl(states.ball_quat),
            to_bl(states.ball_vel), to_bl(states.ball_ang),
            to_bl(params.kp), to_bl(params.kd), to_bl(params.effort),
            to_bl(params.armature), to_bl(params.joint_friction),
            to_bl(params.mass_scale), to_bl(mu), to_bl(params.gravity),
            to_bl(targets),
            to_bl(params.dof_lower if params.dof_lower is not None
                  else jnp.broadcast_to(
                      jnp.asarray(model.dof_lower, jnp.float32), (B, nq))),
            to_bl(params.dof_upper if params.dof_upper is not None
                  else jnp.broadcast_to(
                      jnp.asarray(model.dof_upper, jnp.float32), (B, nq))),
        ]
        for _ in range(cfg.substeps):
            out = call(*flat)
            flat = list(out[:9]) + flat[9:]
        (q, qd, bpos, bquat, bu, ballp, ballq, ballv, ballw,
         sens, bcf) = out
        back = lambda x: jnp.swapaxes(x, 0, 1)[return_slice]
        return PhysicsState(
            q=back(q), qd=back(qd), base_pos=back(bpos),
            base_quat=back(bquat), base_u=back(bu),
            ball_pos=back(ballp), ball_quat=back(ballq),
            ball_vel=back(ballv), ball_ang=back(ballw),
            sensor_normal=back(sens),
            body_contact_force=back(bcf).reshape(-1, nb, 3),
        )

    return step_fn


def pallas_available() -> bool:
    """The fused kernel targets real TPU backends (incl. the axon tunnel)."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform in ("tpu", "axon")
