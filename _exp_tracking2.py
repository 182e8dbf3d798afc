"""Which constraint binds: effort clamp, velocity clamp, or gains?"""
import json
import jax, jax.numpy as jnp, numpy as np
from bez_isaacgym_tpu.control.controller import feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

F32 = jnp.float32

def drive(task, plan, desired, dyn_mod=None):
    state = task.reset_one(jax.random.PRNGKey(0))
    if dyn_mod:
        state = state._replace(dyn=dyn_mod(state.dyn))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)
    achieved = np.zeros_like(plan)
    for i, target in enumerate(plan):
        out = step(state, jnp.asarray(target - default, F32))
        state = out.state
        achieved[i] = np.asarray(state.physics.q)
    err = achieved[1:] - desired[:-1]
    joint_range = desired.max(0) - desired.min(0) + 1e-6
    rms = np.sqrt((err ** 2).mean(0))
    moving = joint_range > 0.05
    rel = (rms[moving] / joint_range[moving])
    return float(rel.mean()), rms, joint_range, moving

tr = Trajectory("simulation_rightkick")
rate, substeps = 60, 4
tgrid = np.arange(0.0, tr.max_time, 1.0 / rate)
plan = np.stack([tr.angles_at(t) for t in tgrid])
task = KickTask(TaskConfig(substeps=substeps))
h = (1.0 / rate) / substeps
ff = feedforward_targets(tgrid, plan, h=h)

cases = {
  "ff": None,
  "ff+effort100": lambda d: d._replace(effort=jnp.full(18, 100.0)),
  "ff+kp400": lambda d: d._replace(kp=jnp.full(18, 400.0), kd=jnp.full(18, 15.0)),
  "ff+effort100+kp400": lambda d: d._replace(effort=jnp.full(18, 100.0), kp=jnp.full(18, 400.0), kd=jnp.full(18, 15.0)),
  "ff+nofric": lambda d: d._replace(joint_friction=jnp.zeros(18)),
}
for name, mod in cases.items():
    # feedforward lead must match the gains used
    if "kp400" in name:
        ffp = feedforward_targets(tgrid, plan, kp=400.0, kd=15.0, h=h)
    else:
        ffp = ff
    rel, rms, jr, mv = drive(task, ffp, plan, mod)
    print(json.dumps({"case": name, "rel": round(rel, 4)}))
# worst joints for plain ff
rel, rms, jr, mv = drive(task, ff, plan, None)
worst = np.argsort(-(rms / jr) * mv)[:5]
print("worst joints:", worst.tolist(), (rms/jr)[worst].round(3).tolist(), "ranges", jr[worst].round(2).tolist())
