"""Classical model-based control stack: walking engine, IK, PID, keyframes.

Re-implementation of the reference's sim-agnostic control library
(/root/reference/resources/library/): body-path planning (Bezier + rotate-in-
place), footstep phase machine with parabolic swing, torso sway, closed-form
6-DOF leg IK, IMU pitch PIDs, and CSV keyframe playback.

Planning runs host-side in numpy (as in the reference); the produced joint
trajectories are dense arrays consumed by the JAX env/solver stack (MPC warm
starts, tracking oracles).
"""

from bez_isaacgym_tpu.control.transformation import Transformation  # noqa: F401
from bez_isaacgym_tpu.control.soccerbot import Soccerbot  # noqa: F401
from bez_isaacgym_tpu.control.controller import SoccerbotController  # noqa: F401
