"""Task registration — mirrors `legged_gym/envs/__init__.py:30-55`: the
registered `GR1T1`/`GR1T2` tasks are the lower-limb variants; full-body
configs are additionally exposed under explicit names."""

from wiki_grx_gym_tpu.envs.legged_env import EnvState, LeggedEnv, StepOutput  # noqa: F401
from wiki_grx_gym_tpu.envs.gr1t1_config import (  # noqa: F401
    GR1T1Cfg,
    GR1T1CfgPPO,
    GR1T1FullCfg,
    GR1T1FullCfgPPO,
    GR1T1LowerLimbCfg,
    GR1T1LowerLimbCfgPPO,
    GR1T1LowerLimbCfgPPOLstm,
)
from wiki_grx_gym_tpu.envs.gr1t2_config import (  # noqa: F401
    GR1T2Cfg,
    GR1T2CfgPPO,
    GR1T2FullCfg,
    GR1T2FullCfgPPO,
    GR1T2LowerLimbCfg,
    GR1T2LowerLimbCfgPPO,
)
from wiki_grx_gym_tpu.utils.task_registry import task_registry

# registered aliases match the reference (envs/__init__.py:54-55:
# GR1T1 == lower-limb task)
task_registry.register("GR1T1", LeggedEnv, GR1T1LowerLimbCfg, GR1T1LowerLimbCfgPPO)
task_registry.register("GR1T2", LeggedEnv, GR1T2LowerLimbCfg, GR1T2LowerLimbCfgPPO)
task_registry.register("GR1T1_lower_limb", LeggedEnv, GR1T1LowerLimbCfg, GR1T1LowerLimbCfgPPO)
task_registry.register("GR1T2_lower_limb", LeggedEnv, GR1T2LowerLimbCfg, GR1T2LowerLimbCfgPPO)
task_registry.register("GR1T1_full", LeggedEnv, GR1T1FullCfg, GR1T1FullCfgPPO)
task_registry.register("GR1T2_full", LeggedEnv, GR1T2FullCfg, GR1T2FullCfgPPO)
task_registry.register("GR1T1_lstm", LeggedEnv, GR1T1LowerLimbCfg, GR1T1LowerLimbCfgPPOLstm)
