"""Domain-randomization engine: full parity with the reference DR spec.

TPU-native redesign of the reference randomization engine
(/root/reference/bez_isaacgym/tasks/base/vec_task.py:505-725, spec
cfg/task/bez_kick.yaml:151-219): per-parameter gaussian-or-uniform
distributions with additive/scaling operations and linear/constant
schedules, frequency gating, setup-only (randomize-once) properties, and
optional correlated noise — all as pure JAX sampling functions applied
per-env at reset (the reference is also limited to on-reset randomization
"due to current PhysX limitations", vec_task.py:508).

Deviations (documented in docs/DEVIATIONS.md):
- sim-params gravity is randomized per-env at reset instead of globally
  every `frequency` steps (strictly more diverse DR, no host sync);
- rigid-shape friction/restitution randomize the per-env contact material
  (our contact model has one robot/ground material per env) instead of
  per-shape; `num_buckets` is unnecessary (no PhysX material table).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

F32 = jnp.float32


@dataclass(frozen=True)
class RandSpec:
    """One randomized parameter (vec_task.py:544-618 semantics).

    range: (mu, std) for gaussian, (lo, hi) for uniform — exactly the
    reference YAML's `range` field (it feeds randn*var+mu, :586).
    operation: "additive" | "scaling" (applied to the base value).
    distribution: "gaussian" | "uniform".
    schedule: None | "linear" | "constant" — "linear" ramps the sample
    magnitude over schedule_steps env steps; "constant" switches on after
    schedule_steps (vec_task.py:556-561).
    range_correlated: per-env noise drawn once per randomization and held
    (vec_task.py:584-591); (0,0) disables it like the reference default.
    setup_only: randomize once per env before simulation, never again
    (bez_kick.yaml:175 mass).
    """

    range: tuple = (0.0, 0.0)
    operation: str = "additive"
    distribution: str = "gaussian"
    schedule: str | None = None
    schedule_steps: int = 3000
    range_correlated: tuple = (0.0, 0.0)
    setup_only: bool = False
    enabled: bool = True


def _sched_scaling(spec: RandSpec, step) -> jnp.ndarray:
    """vec_task.py:552-561."""
    step = jnp.asarray(step, F32)
    if spec.schedule == "linear":
        return jnp.minimum(step, spec.schedule_steps) / spec.schedule_steps
    if spec.schedule == "constant":
        return (step >= spec.schedule_steps).astype(F32)
    return jnp.ones((), F32)


def _draw(key, spec: RandSpec, rng: tuple, shape, s):
    """One sample of the randomization variable for `rng` = (a, b) under the
    schedule scaling s (vec_task.py:562-617)."""
    a, b = float(rng[0]), float(rng[1])
    if spec.distribution == "gaussian":
        mu, std = a, b
        if spec.operation == "additive":
            mu, std = mu * s, std * s
        else:  # scaling: std ramps, mean interpolates to 1
            mu, std = mu * s + (1.0 - s), std * s
        return mu + std * jax.random.normal(key, shape, F32)
    # uniform
    lo, hi = a, b
    if spec.operation == "additive":
        lo, hi = lo * s, hi * s
    else:
        lo, hi = lo * s + (1.0 - s), hi * s + (1.0 - s)
    return lo + (hi - lo) * jax.random.uniform(key, shape, F32)


def sample(key, spec: RandSpec, shape, step):
    """Draw the randomization variable (white + correlated components)."""
    s = _sched_scaling(spec, step)
    k_w, k_c = jax.random.split(key)
    val = _draw(k_w, spec, spec.range, shape, s)
    if tuple(spec.range_correlated) != (0.0, 0.0):
        # Correlated component: an extra draw added before the op
        # (vec_task.py:584-591; held fixed per randomization by the caller
        # passing the same key between randomizations).
        corr = _draw(k_c, spec, spec.range_correlated, shape, s)
        if spec.operation == "scaling":
            # reference composes op(tensor, corr + white); for scaling the
            # identity-centered parts add around 1, so recenter.
            val = val + corr - 1.0
        else:
            val = val + corr
    return val


def apply(key, spec: RandSpec, value, step):
    """Randomize `value` (any shape) according to spec at schedule `step`."""
    if not spec.enabled:
        return value
    r = sample(key, spec, jnp.shape(value), step)
    if spec.operation == "scaling":
        return value * r
    return value + r


@dataclass(frozen=True)
class DomainRandConfig:
    """Full DR block of bez_kick.yaml:151-219 as a typed tree.

    Field -> YAML mapping:
      observations/actions  -> additive gaussian white noise (σ .002/.02)
      gravity               -> sim_params.gravity additive gaussian σ .4
      body_mass             -> actor_params.bez.rigid_body_properties.mass
      shape_friction        -> ....rigid_shape_properties.friction
      shape_restitution     -> ....rigid_shape_properties.restitution
      dof_stiffness/damping -> ....dof_properties.{stiffness,damping} (PD
                               position-drive gains = our Kp/Kd)
      dof_lower/dof_upper   -> ....dof_properties.{lower,upper} joint limits
    """

    enabled: bool = False
    frequency: int = 600              # env steps between re-randomizations
    observations: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.0, 0.002)))
    actions: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.0, 0.02)))
    gravity: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.0, 0.4), schedule="linear"))
    body_mass: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.5, 1.5), operation="scaling", distribution="uniform",
        schedule="linear", setup_only=True))
    shape_friction: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.7, 1.3), operation="scaling", distribution="uniform",
        schedule="linear"))
    shape_restitution: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.0, 0.7), operation="scaling", distribution="uniform",
        schedule="linear"))
    dof_stiffness: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.5, 1.5), operation="scaling", distribution="uniform",
        schedule="linear"))
    dof_damping: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.5, 1.5), operation="scaling", distribution="uniform",
        schedule="linear"))
    dof_lower: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.0, 0.01), schedule="linear"))
    dof_upper: RandSpec = field(default_factory=lambda: RandSpec(
        range=(0.0, 0.01), schedule="linear"))
