import json
import numpy as np, jax, jax.numpy as jnp
from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.eval.tracking import rate_limited_oracle
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.walk import WalkTask

F32 = jnp.float32
ctrl = SoccerbotController()
times, angles = ctrl.plan_joint_trajectory(Transformation.from_xy_theta(0.5, 0.0, 0.0))
t60 = np.arange(0, times[-1], 1 / 60)
raw = np.stack([np.interp(t60, times, angles[:, j]) for j in range(18)], axis=1)
oracle = rate_limited_oracle(raw, 1 / 60)
task = WalkTask(TaskConfig(substeps=4, episode_length_s=30.0))
jr = oracle.max(0) - oracle.min(0) + 1e-6
mv = jr > 0.05

def drive_integral(ki, leak=1.0):
    state = task.reset_one(jax.random.PRNGKey(0))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)
    ach = np.zeros_like(raw)
    corr = np.zeros(18)
    for i, target in enumerate(raw):
        out = step(state, jnp.asarray(target + corr - default, F32))
        state = out.state
        ach[i] = np.asarray(state.physics.q)
        corr = leak * corr + ki * (oracle[i] - ach[i])
    rms = np.sqrt(((ach - oracle) ** 2).mean(0))
    rel = float((rms[mv]/jr[mv]).mean())
    return rel, float(state.physics.base_pos[0]), float(state.physics.base_pos[2])

for ki in (0.0, 0.2, 0.5, 0.8):
    rel, fx, h = drive_integral(ki)
    print(json.dumps({"ki": ki, "rel": round(rel, 4), "final_x": round(fx, 3), "height": round(h, 3)}))
