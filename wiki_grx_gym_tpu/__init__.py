"""wiki-grx-gym_tpu: TPU-native legged-locomotion RL framework.

Re-implements the capabilities of FFTAI/Wiki-GRx-Gym (IsaacGym PhysX sim +
legged_gym task layer + rsl_rl PPO learner) as a single pure-functional
JAX/XLA program designed for TPU device meshes.
"""

__version__ = "0.1.0"
