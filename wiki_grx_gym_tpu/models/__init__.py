from wiki_grx_gym_tpu.models.robot import RobotModel  # noqa: F401
from wiki_grx_gym_tpu.models.urdf import compile_robot, parse_urdf  # noqa: F401
