import json
import jax, jax.numpy as jnp, numpy as np
from bez_isaacgym_tpu.control.controller import id_feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask
from bez_isaacgym_tpu.ops.engine import SceneConfig

F32 = jnp.float32
tr = Trajectory("simulation_rightkick")
tgrid = np.arange(0.0, tr.max_time, 1.0 / 60)
plan = np.stack([tr.angles_at(t) for t in tgrid])
task = KickTask(TaskConfig(substeps=4))
print("max_joint_vel:", task.scene.max_joint_vel if hasattr(task.scene, 'max_joint_vel') else SceneConfig().max_joint_vel)
qd = np.gradient(plan, tgrid, axis=0)
print("peak |qd_des| per joint (top5):", np.sort(np.abs(qd).max(0))[-5:].round(2))
lo, hi = np.asarray(task.dof_lower), np.asarray(task.dof_upper)
ff = id_feedforward_targets(task, tgrid, plan)
clip_frac = ((ff < lo) | (ff > hi)).mean(0)
print("target-clip fraction (top5 joints):", np.argsort(-clip_frac)[:5], np.sort(clip_frac)[-5:].round(3))
# error profile joint 2
def run(plan_cmd):
    state = task.reset_one(jax.random.PRNGKey(0))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)
    ach = np.zeros_like(plan_cmd); qds = np.zeros_like(plan_cmd)
    for i, target in enumerate(plan_cmd):
        out = step(state, jnp.asarray(target - default, F32))
        ach[i] = np.asarray(out.state.physics.q); qds[i] = np.asarray(out.state.physics.qd)
        state = out.state
    return ach, qds
ach, qds = run(ff)
e2 = np.abs(ach[:,2] - plan[:,2])
tmax = np.argmax(e2)
print("joint2: max err", e2.max().round(3), "at t index", int(tmax), "of", len(tgrid))
print("joint2 qd_des at tmax:", qd[tmax,2].round(2), "achieved qd:", qds[tmax,2].round(2))
print("err profile every 8:", e2[::8].round(3).tolist())
