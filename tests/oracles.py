"""Independent numpy (float64) oracles used to validate the JAX kernels."""

import numpy as np


def rodrigues(axis, th):
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def fk_oracle(model, q, base_pos, R0):
    """Float64 forward kinematics mirror of ops.kinematics.forward_kinematics."""
    rot = [np.asarray(R0, float)]
    pos = [np.asarray(base_pos, float)]
    axes, anchors = [], []
    for b in range(1, model.nb):
        p = int(model.parent[b])
        d = b - 1
        anchor = pos[p] + rot[p] @ model.tree_pos[b]
        R_pre = rot[p] @ model.tree_rot[b]
        rot.append(R_pre @ rodrigues(model.axis[d], q[d]))
        pos.append(anchor)
        axes.append(R_pre @ model.axis[d])
        anchors.append(anchor)
    com = np.array([pos[b] + rot[b] @ model.com[b] for b in range(model.nb)])
    return (np.array(rot), np.array(pos), com,
            np.array(axes), np.array(anchors))


def com_jacobian_oracle(model, mask, com, axes, anchors, base_pos):
    """Float64 world COM Jacobian: v_com_i = J[i] @ [v0, w, qd]."""
    nv = 6 + model.nq
    J = np.zeros((model.nb, 3, nv))
    skew = lambda v: np.array([[0, -v[2], v[1]],
                               [v[2], 0, -v[0]],
                               [-v[1], v[0], 0]])
    for b in range(model.nb):
        J[b, :, 0:3] = np.eye(3)
        J[b, :, 3:6] = -skew(com[b] - base_pos)
        for d in range(model.nq):
            if mask[b, d]:
                J[b, :, 6 + d] = np.cross(axes[d], com[b] - anchors[d])
    return J
