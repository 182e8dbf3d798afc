"""Vectorized task library: kick / walk / orient / goalie.

TPU-native re-design of the reference task layer
(/root/reference/bez_isaacgym/tasks/): each task is a pure-functional
single-env program (reset / step / obs / reward) that the VecEnv wrapper
vmaps, jits and shards.  Registry parity with tasks/__init__.py:10-16 (plus
the goalie task, which is bit-rotted in the reference and restored here).
"""

from bez_isaacgym_tpu.tasks.registry import make_task, task_map  # noqa: F401
