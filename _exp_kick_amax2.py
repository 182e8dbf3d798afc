import json
import numpy as np, jax, jax.numpy as jnp
from bez_isaacgym_tpu.control.controller import id_feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.eval.tracking import _drive, _rel_err
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask
from bez_isaacgym_tpu.ops import dynamics as dyn, kinematics as kin

def oracle_va(plan, dt, vmax, amax):
    out = np.zeros_like(plan); out[0] = plan[0]
    qd = np.zeros(plan.shape[1])
    for i in range(1, len(plan)):
        qd_want = np.clip((plan[i] - out[i-1]) / dt, -vmax, vmax)
        qd = np.clip(qd_want, qd - amax*dt, qd + amax*dt)
        out[i] = out[i-1] + qd*dt
    return out

task = KickTask(TaskConfig(substeps=4))
model, params = task.model, task.base_params
mask = kin.ancestor_mask(model)
q0 = task.default_dof_pos
frames = kin.forward_kinematics(model, q0, jnp.asarray(task.cfg.bez_init_pos, jnp.float32), jnp.asarray(task.cfg.bez_init_rot, jnp.float32))
J_lin, J_ang = kin.com_jacobians(model, frames, mask)
m, I_w = dyn.world_inertias(model, frames, jnp.asarray(params.mass_scale, jnp.float32))
H = dyn.mass_matrix(J_lin, J_ang, m, I_w, jnp.asarray(params.armature, jnp.float32))
Hjj = np.asarray(jnp.diag(H))[6:]
amax = np.asarray(params.effort) / Hjj

tr = Trajectory("simulation_rightkick")
t60 = np.arange(0.0, tr.max_time, 1 / 60)
raw = np.stack([tr.angles_at(t) for t in t60])
cmd = id_feedforward_targets(task, t60, raw)
ach, _ = _drive(task, cmd)
for scale in (0.5, 0.3, 0.2, 0.1):
    orc = oracle_va(raw, 1/60, 2*np.pi, amax * scale)
    rel, _ = _rel_err(ach, orc)
    print(json.dumps({"amax_scale": scale, "rel": round(rel, 4)}))
