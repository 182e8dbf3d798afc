import json
import numpy as np
from bez_isaacgym_tpu.control.controller import (SoccerbotController,
    feedforward_targets, id_feedforward_targets)
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.eval.tracking import rate_limited_oracle, _drive, _rel_err
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.walk import WalkTask

ctrl = SoccerbotController()
times, angles = ctrl.plan_joint_trajectory(Transformation.from_xy_theta(0.5, 0.0, 0.0))
t60 = np.arange(0, times[-1], 1 / 60)
raw = np.stack([np.interp(t60, times, angles[:, j]) for j in range(18)], axis=1)
oracle = rate_limited_oracle(raw, 1 / 60)
task = WalkTask(TaskConfig(substeps=4, episode_length_s=30.0))
h = (1/60)/4

cases = {
  "plain": raw,
  "vel_ff": feedforward_targets(t60, raw, h=h),
  "id_ff": id_feedforward_targets(task, t60, raw),
  "id_ff_nobias": id_feedforward_targets(task, t60, raw, include_bias=False),
}
for name, cmd in cases.items():
    ach, state = _drive(task, cmd)
    rel, _ = _rel_err(ach, oracle)
    fx = float(state.physics.base_pos[0])
    print(json.dumps({name: round(rel, 4), "final_x": round(fx, 3),
                      "h": round(float(state.physics.base_pos[2]), 3)}))
