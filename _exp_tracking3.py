"""Is tracking error a pure delay? RMS vs command/achieved shift."""
import json
import jax, jax.numpy as jnp, numpy as np
from bez_isaacgym_tpu.control.controller import feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

F32 = jnp.float32
tr = Trajectory("simulation_rightkick")
tgrid = np.arange(0.0, tr.max_time, 1.0 / 60)
plan = np.stack([tr.angles_at(t) for t in tgrid])
task = KickTask(TaskConfig(substeps=4))
h = (1.0 / 60) / 4

def run(plan_cmd):
    state = task.reset_one(jax.random.PRNGKey(0))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)
    achieved = np.zeros_like(plan_cmd)
    for i, target in enumerate(plan_cmd):
        out = step(state, jnp.asarray(target - default, F32))
        achieved[i] = np.asarray(out.state.physics.q)
        state = out.state
    return achieved

ach = run(feedforward_targets(tgrid, plan, h=h))
joint_range = plan.max(0) - plan.min(0) + 1e-6
moving = joint_range > 0.05
for shift in range(0, 5):
    if shift == 0:
        err = ach - plan
    else:
        err = ach[shift:] - plan[:-shift]
    rms = np.sqrt((err ** 2).mean(0))
    rel = (rms[moving] / joint_range[moving]).mean()
    print(json.dumps({"shift": shift, "rel": round(float(rel), 4)}))
