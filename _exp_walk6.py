import json
import numpy as np, jax, jax.numpy as jnp
from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.walk import WalkTask

F32 = jnp.float32
for goal in (0.5, 1.0):
    ctrl = SoccerbotController()
    times, angles = ctrl.plan_joint_trajectory(Transformation.from_xy_theta(goal, 0.0, 0.0))
    # commanded body x over time from the crotch path
    bot = ctrl.soccerbot
    t60 = np.arange(0, times[-1], 1 / 60)
    raw = np.stack([np.interp(t60, times, angles[:, j]) for j in range(18)], axis=1)
    task = WalkTask(TaskConfig(substeps=4, episode_length_s=60.0))
    state = task.reset_one(jax.random.PRNGKey(0))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)
    xs = []
    for i, target in enumerate(raw):
        out = step(state, jnp.asarray(target - default, F32))
        state = out.state
        xs.append(float(state.physics.base_pos[0]))
    xs = np.array(xs)
    n = len(xs)
    print(json.dumps({"goal": goal, "final_x": round(xs[-1], 3),
        "err_frac": round(abs(xs[-1]-goal)/goal, 4),
        "x_profile_eighths": [round(v,3) for v in xs[::max(1,n//8)]]}))
