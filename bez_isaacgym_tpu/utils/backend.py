"""Backend bootstrap: make jax import/init un-killable on this dev rig.

The image force-registers a tunneled TPU backend ("axon") via sitecustomize
and ``JAX_PLATFORMS=axon``.  When the tunnel is down, *in-process* backend
init blocks for minutes inside C code (measured ~4 min on a dead tunnel), so
the only safe probe is a **subprocess with a timeout**.  Everything that must
never hang (bench.py, tests/conftest.py, __graft_entry__.py) calls
:func:`ensure_backend` BEFORE importing jax.

This module is pure stdlib — importing it never touches jax.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_SRC = "import jax; print(jax.devices()[0].platform)"


def tpu_env_requested() -> bool:
    """True when the process would try to initialize the tunneled TPU."""
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat in ("cpu",):
        return False
    # Default ('' / unset) lets the axon plugin register first; 'axon'/'tpu'
    # request it explicitly.
    return True


def probe_tpu(timeout_s: float = 90.0) -> tuple[bool, str]:
    """Probe TPU init in a subprocess.  Returns (ok, detail).

    A dead tunnel hangs C-level init, so the probe must be out-of-process
    and killed on timeout.
    """
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the plugin auto-register
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            env=env, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"TPU probe timed out after {timeout_s:.0f}s (tunnel down?)"
    if out.returncode != 0:
        tail = (out.stderr or out.stdout).strip().splitlines()
        return False, ("TPU probe failed: " + (tail[-1] if tail else "rc="
                                               + str(out.returncode)))[:300]
    plat = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    if plat in ("tpu", "axon"):
        return True, plat
    return False, f"probe found platform {plat!r}, not a TPU"


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Point this process at the CPU backend, bypassing the axon plugin.

    Must run before the first jax backend *initialization*.  Setting env
    vars alone is NOT enough on this image: the sitecustomize's
    ``axon.register`` import pulls in jax at interpreter startup, and jax
    snapshots JAX_PLATFORMS into its config at import — so when jax is
    already in sys.modules the live config must be updated too (this was
    the round-3 regression: env-only force_cpu left the default platform
    as axon and every jax.devices() hung on the dead tunnel).
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    if n_virtual_devices is not None:
        # Read from the env at backend init, so setting it post-import but
        # pre-init still works.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{n_virtual_devices}").strip()
    if "jax" in sys.modules:
        import jax
        jax.config.update("jax_platforms", "cpu")


def ensure_backend(prefer_tpu: bool = True,
                   probe_timeout_s: float = 90.0) -> dict:
    """Guarantee that the first jax call in this process cannot hang.

    Returns {"platform": "tpu"|"cpu", "degraded": bool, "detail": str}.
    Call before importing jax (jax import itself is safe; backend *init* is
    what hangs — but setting env here keeps both paths correct).
    """
    if not tpu_env_requested():
        force_cpu()
        return {"platform": "cpu", "degraded": False,
                "detail": "cpu requested via JAX_PLATFORMS"}
    if not prefer_tpu:
        force_cpu()
        return {"platform": "cpu", "degraded": False, "detail": "cpu forced"}
    ok, detail = probe_tpu(probe_timeout_s)
    if ok:
        return {"platform": "tpu", "degraded": False, "detail": detail}
    force_cpu()
    return {"platform": "cpu", "degraded": True, "detail": detail}
