"""bez_isaacgym_tpu — a TPU-native simulation, MPC and RL framework for the Bez humanoid.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
utra-robosoccer/Bez_IsaacGym (reference mounted at /root/reference):

- ``models``   — URDF -> flat articulated-body model, policy networks
- ``ops``      — quaternion/SE(3) math, Featherstone dynamics, contacts, sensors
- ``tasks``    — kick / walk / orient / goalie task definitions as pure functions
- ``envs``     — vectorized env API (step/reset) akin to the reference VecTask
- ``solvers``  — MPPI sampling and SQP/iLQR trajectory optimization
- ``control``  — classical walking engine (path planning, IK, PID) and
                 keyframe trajectory playback
- ``rl``       — PPO training stack (flax/optax) replacing rl-games
- ``parallel`` — device mesh / sharding utilities (pjit, shard_map)
- ``utils``    — config tree, checkpointing, logging, profiling
- ``native``   — C++ geometry library + bindings (host-side preprocessing)

Unlike the reference, which drives the closed-source Isaac Gym PhysX binary,
the physics step here (FK -> actuation -> contact -> integration) is
implemented in this package and compiles to a single fused XLA program,
vmapped over thousands of parallel environments per chip and sharded over a
``jax.sharding.Mesh`` for multi-chip scaling.
"""

__version__ = "0.1.0"
