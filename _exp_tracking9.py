import json
import jax, jax.numpy as jnp, numpy as np
from bez_isaacgym_tpu.control.controller import id_feedforward_targets
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask

F32 = jnp.float32

def rate_limit(plan, dt, vmax):
    out = np.zeros_like(plan); out[0] = plan[0]
    for i in range(1, len(plan)):
        out[i] = out[i-1] + np.clip(plan[i] - out[i-1], -vmax*dt, vmax*dt)
    return out

tr = Trajectory("simulation_rightkick")
tgrid = np.arange(0.0, tr.max_time, 1.0 / 60)
raw = np.stack([tr.angles_at(t) for t in tgrid])
feasible = rate_limit(raw, 1/60, 2*np.pi)

for kp, kd in ((100.0, 7.5), (200.0, 10.0), (300.0, 12.0)):
    task = KickTask(TaskConfig(substeps=4, stiffness=kp, damping=kd))
    def run(plan_cmd):
        state = task.reset_one(jax.random.PRNGKey(0))
        state = state._replace(physics=state.physics._replace(
            q=task.default_dof_pos, qd=jnp.zeros(18)))
        step = jax.jit(task.step_one)
        default = np.asarray(task.default_dof_pos)
        ach = np.zeros_like(plan_cmd)
        for i, target in enumerate(plan_cmd):
            out = step(state, jnp.asarray(target - default, F32))
            ach[i] = np.asarray(out.state.physics.q)
            state = out.state
        return ach
    jr = feasible.max(0) - feasible.min(0) + 1e-6
    mv = jr > 0.05
    ach = run(id_feedforward_targets(task, tgrid, raw))
    rms = np.sqrt(((ach - feasible) ** 2).mean(0))
    rel = float((rms[mv] / jr[mv]).mean())
    print(json.dumps({"kp": kp, "rawff_vs_feasible": round(rel, 4)}))
