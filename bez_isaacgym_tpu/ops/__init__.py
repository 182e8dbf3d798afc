"""Batched math + physics ops (pure JAX, jit/vmap-friendly)."""
