import json
import numpy as np
from bez_isaacgym_tpu.control.controller import id_feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.eval.tracking import rate_limited_oracle, _drive, _rel_err
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

tr = Trajectory("simulation_rightkick")
t60 = np.arange(0.0, tr.max_time, 1 / 60)
raw60 = np.stack([tr.angles_at(t) for t in t60])
oracle60 = rate_limited_oracle(raw60, 1 / 60)

t240 = np.arange(0.0, tr.max_time, 1 / 240)
raw240 = np.stack([tr.angles_at(t) for t in t240])
task = KickTask(TaskConfig(substeps=1, dt=1/240))
cmd = id_feedforward_targets(task, t240, raw240)
ach240, _ = _drive(task, cmd)
# take every 4th sample, aligned with end-of-60Hz-frames
ach60 = ach240[3::4][:len(oracle60)]
o = oracle60[:len(ach60)]
rel, _ = _rel_err(ach60, o)
print(json.dumps({"drive240_vs_oracle60": round(rel, 4)}))
