"""Headline benchmark: parallel Bez MPC solves/s + p50 solve latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

North star (BASELINE.md): >= 4096 parallel MPC solves/s on v5p-8 (8 chips)
with < 10 ms p50 at a 32-step horizon -> per-chip baseline 512 solves/s.
This script runs on however many chips are visible (the driver gives one).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the cold compile through the dev tunnel takes
# minutes; repeat runs (and the driver's round-end run) hit the cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from bez_isaacgym_tpu.solvers.mppi import MPPIConfig, MPPISolver
    from bez_isaacgym_tpu.tasks.kick import KickTask
    from bez_isaacgym_tpu.tasks.base import TaskConfig

    num_solves = 256          # parallel MPC problems on this chip
    mppi = MPPIConfig(horizon=32, num_samples=32)

    task = KickTask(TaskConfig(substeps=2))
    solver = MPPISolver(task, mppi)

    keys = jax.random.split(jax.random.PRNGKey(0), num_solves)
    env_state = jax.jit(jax.vmap(task.reset_one))(keys)
    mppi_state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_solves,) + x.shape),
        solver.init_state())

    solve = jax.jit(solver.solve)

    t0 = time.time()
    action, mppi_state, info = solve(env_state, mppi_state,
                                     jax.random.PRNGKey(1))
    jax.block_until_ready(action)
    compile_s = time.time() - t0

    # Timed runs: each call = num_solves MPC solves.
    lat = []
    iters = 10
    for i in range(iters):
        t0 = time.time()
        action, mppi_state, info = solve(env_state, mppi_state,
                                         jax.random.PRNGKey(2 + i))
        jax.block_until_ready(action)
        lat.append(time.time() - t0)

    lat = sorted(lat)
    p50 = lat[len(lat) // 2]
    solves_per_s = num_solves / p50
    baseline_per_chip = 4096 / 8.0   # v5p-8 target spread over 8 chips

    # Optional true single-solve latency (S=1; separate compile, and on
    # this rig it includes the dev tunnel's per-dispatch overhead of
    # ~1.5 ms x 64 sequential steps).  Enable with BEZ_BENCH_LATENCY=1.
    single_ms = None
    if os.environ.get("BEZ_BENCH_LATENCY") == "1":
        env1 = jax.tree.map(lambda x: x[:1], env_state)
        m1 = jax.tree.map(lambda x: x[:1], mppi_state)
        a1, m1b, _ = solve(env1, m1, jax.random.PRNGKey(99))
        jax.block_until_ready(a1)
        lat1 = []
        for i in range(5):
            t0 = time.time()
            a1, m1b, _ = solve(env1, m1b, jax.random.PRNGKey(100 + i))
            jax.block_until_ready(a1)
            lat1.append(time.time() - t0)
        single_ms = round(sorted(lat1)[2] * 1000, 2)

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / baseline_per_chip, 3),
        "p50_batch_latency_ms": round(p50 * 1000, 2),
        "throughput_per_solve_ms": round(p50 * 1000 / num_solves, 4),
        "single_solve_p50_ms": single_ms,
        "num_parallel_solves": num_solves,
        "horizon": mppi.horizon,
        "num_samples": mppi.num_samples,
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
