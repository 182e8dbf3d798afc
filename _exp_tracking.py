"""Tracking experiments: feedforward lead + control rate."""
import json
import jax, jax.numpy as jnp, numpy as np
from bez_isaacgym_tpu.control.controller import SoccerbotController, feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

F32 = jnp.float32

def drive(task, plan, desired):
    state = task.reset_one(jax.random.PRNGKey(0))
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
    return float((rms[moving] / joint_range[moving]).mean()), state

tr = Trajectory("simulation_rightkick")

for rate, substeps in ((60, 4), (120, 2)):
    tgrid = np.arange(0.0, tr.max_time, 1.0 / rate)
    plan = np.stack([tr.angles_at(t) for t in tgrid])
    task = KickTask(TaskConfig(substeps=substeps, dt=1.0 / rate))
    h = (1.0 / rate) / substeps
    base_rel, _ = drive(task, plan, plan)
    ff = feedforward_targets(tgrid, plan, h=h)
    ff_rel, _ = drive(task, ff, plan)
    print(json.dumps({"rate": rate, "kick_rel_base": round(base_rel, 4),
                      "kick_rel_ff": round(ff_rel, 4)}))
