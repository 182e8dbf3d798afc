#!/usr/bin/env python3
"""Inference CLI (reference parity: bez_isaacgym/play.py LaunchModel).

    python play.py checkpoint=runs/Bez_Kick/..ckpt task=bez_kick num_envs=16
"""

import sys

# Probe the tunneled TPU out-of-process and fall back to CPU if it is
# unreachable — in-process init hangs ~4 min on a dead tunnel (STATUS #7).
from bez_isaacgym_tpu.utils.backend import ensure_backend

ensure_backend()

from bez_isaacgym_tpu.rl.runner import Runner  # noqa: E402
from bez_isaacgym_tpu.utils.config import parse_overrides  # noqa: E402


class LaunchModel:
    """Programmatic API parity with play.py:63-123."""

    def __init__(self, checkpoint: str = "", num_envs: int = 16,
                 task: str = "bez_kick"):
        overrides = [f"task={task}", f"num_envs={num_envs}", "test=True"]
        if checkpoint:
            overrides.append(f"checkpoint={checkpoint}")
        self.cfg = parse_overrides(overrides)
        self.runner = None

    def load_config(self):
        self.runner = Runner(self.cfg)

    def run_model(self, num_steps: int = 600):
        if self.runner is None:
            self.load_config()
        return self.runner.play(num_steps=num_steps)


def main(argv):
    cfg = parse_overrides(["test=True", "num_envs=16"] + argv)
    Runner(cfg).play()


if __name__ == "__main__":
    main(sys.argv[1:])
