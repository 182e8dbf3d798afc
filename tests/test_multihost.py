"""REAL multi-process data-parallel test (round-3 VERDICT item 4).

The reference's only distributed capability is Horovod data parallelism —
one process per GPU, rank->device mapping, gradient allreduce inside
rl-games (/root/reference/bez_isaacgym/utils/rlgames_utils.py:71-81,
cfg/config.yaml:39-40).  Rounds 1-3 exercised our jax equivalent only on a
single-process virtual mesh; this test spawns an actual 2-process
jax.distributed CPU cluster on one machine (SURVEY.md §4's plan) and
asserts the sharded PPO update is identical to the single-process run on
the same 4-device mesh.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(nprocs: int, pid: int, port: int, out: str, local_devices: int):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",   # axon plugin must not hijack (conftest)
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={local_devices}",
        "PYTHONPATH": os.path.dirname(HERE),
    })
    return subprocess.Popen(
        [sys.executable, "-u", WORKER, str(nprocs), str(pid), str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    """2-process x 2-device == 1-process x 4-device PPO update.

    Same global mesh (4 CPU devices), same seeds: the distributed ranks
    must agree bit-for-bit with each other (the train state is replicated
    through psum), and with the single-process run up to f32 reduction
    order."""
    port = _free_port()
    outs = [str(tmp_path / f"mp{i}.npz") for i in range(2)]
    ref_out = str(tmp_path / "single.npz")

    procs = [_spawn(2, i, port, outs[i], local_devices=2) for i in range(2)]
    ref = _spawn(1, 0, port, ref_out, local_devices=4)

    logs = []
    for p in procs + [ref]:
        stdout, _ = p.communicate(timeout=1200)
        logs.append(stdout)
        assert p.returncode == 0, stdout[-3000:]

    r0, r1 = np.load(outs[0]), np.load(outs[1])
    single = np.load(ref_out)
    assert int(r0["process_count"]) == 2
    assert int(r0["global_devices"]) == 4
    assert int(single["process_count"]) == 1

    # Both ranks hold the same replicated post-update parameters.
    np.testing.assert_array_equal(r0["params"], r1["params"])

    # Multi-process == single-process on the same logical mesh.  The psum
    # reduction may associate differently across process boundaries, so
    # allow f32 reduction-order noise only.
    np.testing.assert_allclose(r0["params"], single["params"],
                               rtol=2e-5, atol=2e-6)
    for k in r0.files:
        if k.startswith("metric_"):
            np.testing.assert_allclose(r0[k], single[k], rtol=2e-4,
                                       atol=1e-5, err_msg=k)
