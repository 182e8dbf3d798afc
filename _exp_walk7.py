import json
import numpy as np, jax, jax.numpy as jnp
from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.eval.tracking import rate_limited_oracle, _drive, _rel_err
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.walk import WalkTask
from bez_isaacgym_tpu.ops.engine import SceneConfig, make_step_fn
from bez_isaacgym_tpu.ops.contact import ContactCoeffs

ctrl = SoccerbotController()
times, angles = ctrl.plan_joint_trajectory(Transformation.from_xy_theta(0.5, 0.0, 0.0))
t60 = np.arange(0, times[-1], 1 / 60)
raw = np.stack([np.interp(t60, times, angles[:, j]) for j in range(18)], axis=1)
oracle = rate_limited_oracle(raw, 1 / 60)

for eps in (0.02, 0.01, 0.005, 0.002):
    task = WalkTask(TaskConfig(substeps=4, episode_length_s=30.0))
    import dataclasses
    task.scene = dataclasses.replace(task.scene, coeffs=ContactCoeffs(vt_eps=eps))
    task._step_physics = make_step_fn(task.model, task.scene)
    ach, state = _drive(task, raw)
    rel, _ = _rel_err(ach, oracle)
    print(json.dumps({"vt_eps": eps, "rel": round(rel, 4),
                      "final_x": round(float(state.physics.base_pos[0]), 3),
                      "h": round(float(state.physics.base_pos[2]), 3)}))
