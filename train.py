#!/usr/bin/env python3
"""Train CLI (reference parity: bez_isaacgym/train.py).

    python train.py task=bez_kick num_envs=4096 seed=42
    python train.py task=bez_walk test=True checkpoint=runs/.../x.ckpt
"""

import sys

# Probe the tunneled TPU out-of-process and fall back to CPU if it is
# unreachable — in-process init hangs ~4 min on a dead tunnel (STATUS #7).
from bez_isaacgym_tpu.utils.backend import ensure_backend

ensure_backend()

from bez_isaacgym_tpu.rl.runner import Runner  # noqa: E402
from bez_isaacgym_tpu.utils.config import parse_overrides  # noqa: E402


def main(argv):
    cfg = parse_overrides(argv)
    runner = Runner(cfg)
    if cfg.test:
        runner.play()
    else:
        runner.train()


if __name__ == "__main__":
    main(sys.argv[1:])
