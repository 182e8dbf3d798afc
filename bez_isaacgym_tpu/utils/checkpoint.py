"""Checkpoint save/restore for training state.

Parity with the reference's rl-games checkpointing (SURVEY.md §5.4):
periodic saves with epoch+reward in the filename
(`Bez_Kick_<epoch>.pth`-style, README.md:84), restore of model weights and
running mean/std (players.py:68-72).  Format: flax.serialization msgpack.
"""

from __future__ import annotations

import os
import re

import jax
from flax import serialization


def save(path: str, train_state) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(train_state)))


def restore(path: str, template):
    """Load a checkpoint into the structure of `template`."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def checkpoint_name(run_name: str, epoch: int, reward: float) -> str:
    return f"{run_name}_{epoch}_rew_{reward:.2f}.ckpt"


def latest(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    ckpts = [f for f in os.listdir(directory) if f.endswith(".ckpt")]
    if not ckpts:
        return None

    def epoch_of(name):
        m = re.search(r"_(\d+)_rew", name)
        return int(m.group(1)) if m else -1

    return os.path.join(directory, max(ckpts, key=epoch_of))
