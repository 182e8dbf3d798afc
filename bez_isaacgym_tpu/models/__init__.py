"""Robot models: URDF parsing, flat articulated-body model, policy networks."""

from bez_isaacgym_tpu.models.robot import RobotModel, DynParams  # noqa: F401
from bez_isaacgym_tpu.models.urdf import RobotSpec, parse_urdf  # noqa: F401
