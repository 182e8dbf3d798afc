import json
import numpy as np
from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.eval.tracking import _drive
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.walk import WalkTask

CAL = 0.5 / 0.465   # measured stride gain for this engine config
for goal in (0.5, 1.0):
    ctrl = SoccerbotController()
    times, angles = ctrl.plan_joint_trajectory(
        Transformation.from_xy_theta(goal * CAL, 0.0, 0.0))
    t60 = np.arange(0, times[-1], 1 / 60)
    raw = np.stack([np.interp(t60, times, angles[:, j]) for j in range(18)], axis=1)
    task = WalkTask(TaskConfig(substeps=4, episode_length_s=60.0))
    ach, state = _drive(task, raw)
    fx = float(state.physics.base_pos[0])
    print(json.dumps({"goal": goal, "final_x": round(fx, 3),
                      "err_frac": round(abs(fx - goal) / goal, 4),
                      "h": round(float(state.physics.base_pos[2]), 3)}))
