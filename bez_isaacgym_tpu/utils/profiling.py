"""Profiling: per-op TPU timing + speed-of-light accounting.

The reference has no profiling at all (SURVEY.md §5.1 — TorchScript
profiling explicitly disabled, vec_task.py:170-172).  Here: capture a JAX
profiler trace of any jitted function, aggregate per-XLA-op device times
from the xplane proto, and report achieved fraction of peak FLOPs / HBM
bandwidth ("speed of light").

Usage:
    from bez_isaacgym_tpu.utils.profiling import profile_fn, sol_report
    ops = profile_fn(step_fn, args, iters=3)
    print(sol_report(ops, flops=..., bytes_moved=...))
"""

from __future__ import annotations

import glob
import os
import tempfile
import time
from collections import defaultdict
from dataclasses import dataclass

import jax

# Rough peaks for known chips (f32 TFLOPs, HBM GB/s).
CHIP_PEAKS = {
    "TPU v5 lite": (98.3, 819.0),     # v5e: 197 bf16 -> ~98 f32, 819 GB/s
    "TPU v5": (229.0, 1228.0),        # v5p half-precision halved, 1.2 TB/s
    "TPU v4": (137.5, 1200.0),
    "cpu": (0.2, 50.0),
}


@dataclass
class OpTime:
    name: str
    total_ms: float
    count: int


def _parse_xplane(path: str) -> list[OpTime]:
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        ev = dict(plane.event_metadata)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                n = ev[e.metadata_id].name
                agg[n] += e.duration_ps / 1e9
                cnt[n] += 1
    return sorted((OpTime(n, t, cnt[n]) for n, t in agg.items()),
                  key=lambda o: -o.total_ms)


def profile_fn(fn, args, iters: int = 3, trace_dir: str | None = None):
    """Run fn(*args) `iters` times under the profiler; returns per-op times.

    fn should already be jitted; a warmup call is made first.
    """
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="bez_trace_")
    out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        return []
    ops = _parse_xplane(paths[-1])
    # Normalize to per-iteration times.
    for o in ops:
        o.total_ms /= iters
    return ops


def measure_wall(fn, args, iters: int = 10) -> float:
    """Median wall time per call (s), after warmup."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]


def chip_peaks() -> tuple[float, float]:
    kind = jax.devices()[0].device_kind
    for key, peaks in CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return CHIP_PEAKS["cpu"]


def sol_report(wall_s: float, flops: float, bytes_moved: float,
               top_ops: list[OpTime] | None = None, top_n: int = 10) -> str:
    """Speed-of-light summary: achieved vs peak compute and bandwidth."""
    peak_tflops, peak_gbs = chip_peaks()
    achieved_tflops = flops / wall_s / 1e12
    achieved_gbs = bytes_moved / wall_s / 1e9
    lines = [
        f"wall: {wall_s * 1e3:.3f} ms",
        f"compute: {achieved_tflops:.3f} TFLOP/s "
        f"({100 * achieved_tflops / peak_tflops:.1f}% of {peak_tflops} peak)",
        f"bandwidth: {achieved_gbs:.1f} GB/s "
        f"({100 * achieved_gbs / peak_gbs:.1f}% of {peak_gbs} peak)",
    ]
    if top_ops:
        lines.append("top ops (device ms/iter):")
        for o in top_ops[:top_n]:
            lines.append(f"  {o.total_ms:8.3f} ms x{o.count:3d}  {o.name[:90]}")
    return "\n".join(lines)
