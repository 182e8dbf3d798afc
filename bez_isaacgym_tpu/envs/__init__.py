"""Vectorized environment API (step/reset over batched pure tasks)."""

from bez_isaacgym_tpu.envs.vec_env import VecEnv  # noqa: F401
