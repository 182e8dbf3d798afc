import json
import numpy as np
from bez_isaacgym_tpu.control.controller import id_feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.eval.tracking import rate_limited_oracle, _drive, _rel_err
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

tr = Trajectory("simulation_rightkick")
t60 = np.arange(0.0, tr.max_time, 1 / 60)
raw = np.stack([tr.angles_at(t) for t in t60])
oracle = rate_limited_oracle(raw, 1 / 60)
task = KickTask(TaskConfig(substeps=4))
cmd = id_feedforward_targets(task, t60, raw)
ach, _ = _drive(task, cmd)
rel0, _ = _rel_err(ach, oracle)
# compare achieved[i] (state at t_{i+1}) to oracle interpolated at phases
for phase in (0.0, 0.5, 1.0):
    orc = (1 - phase) * oracle + phase * np.concatenate([oracle[1:], oracle[-1:]])
    rel, _ = _rel_err(ach, orc)
    print(json.dumps({"phase": phase, "rel": round(rel, 4)}))
