import json
import numpy as np
from bez_isaacgym_tpu.control.controller import SoccerbotController
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
ach, state = _drive(task, raw)
err = ach - oracle
jr = oracle.max(0) - oracle.min(0) + 1e-6
rms = np.sqrt((err ** 2).mean(0))
mv = jr > 0.05
rel = rms / jr
print("moving joints:", np.where(mv)[0].tolist())
print("rel per joint:", [(int(j), round(float(rel[j]),3), round(float(jr[j]),2)) for j in np.where(mv)[0]])
# error over time for worst
w = np.where(mv)[0][np.argmax(rel[mv])]
e = np.abs(err[:, w])
print("worst joint", int(w), "err every 20:", e[::20].round(3).tolist())
