"""Task registry + factories — mirrors `legged_gym/utils/task_registry.py:45-160`.

``make_env`` resolves the compiled robot spec, builds the (optional) terrain
and returns a :class:`LeggedEnv`; ``make_alg_runner`` builds the PPO runner.
CLI overrides follow `legged_gym/utils/helpers.py:133-156`.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, Tuple, Type

from wiki_grx_gym_tpu.envs.base_config import LeggedRobotCfg, LeggedRobotCfgPPO

ROOT_DIR = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RESOURCES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "models", "resources"
)


class TaskRegistry:
    def __init__(self):
        self.task_classes: Dict[str, type] = {}
        self.env_cfgs: Dict[str, Type[LeggedRobotCfg]] = {}
        self.train_cfgs: Dict[str, Type[LeggedRobotCfgPPO]] = {}

    def register(self, name: str, task_class, env_cfg_class, train_cfg_class) -> None:
        self.task_classes[name] = task_class
        self.env_cfgs[name] = env_cfg_class
        self.train_cfgs[name] = train_cfg_class

    def get_task_names(self):
        return list(self.task_classes.keys())

    def get_cfgs(self, name: str) -> Tuple[LeggedRobotCfg, LeggedRobotCfgPPO]:
        return self.env_cfgs[name](), self.train_cfgs[name]()

    def make_env(self, name: str, args=None, env_cfg: LeggedRobotCfg = None):
        """Build the env (task_registry.py:66-102). Returns (env, env_cfg)."""
        from wiki_grx_gym_tpu.models.serialize import load_robot

        if name not in self.task_classes:
            raise ValueError(f"Task {name!r} not registered. Available: {self.get_task_names()}")
        task_class = self.task_classes[name]
        if env_cfg is None:
            env_cfg, _ = self.get_cfgs(name)
        if args is not None:
            update_cfg_from_args(env_cfg, None, args)

        model = load_robot(os.path.join(RESOURCES, env_cfg.asset.file + ".json"))

        terrain = None
        if env_cfg.terrain.mesh_type in ("heightfield", "trimesh"):
            from wiki_grx_gym_tpu.terrain.composer import Terrain

            terrain = Terrain(env_cfg.terrain)

        env = task_class(env_cfg, model, terrain=terrain)
        return env, env_cfg

    def make_alg_runner(self, env, name: str, args=None, train_cfg=None, log_root="default"):
        """Build the PPO runner (task_registry.py:105-156).

        Log dir layout matches the reference:
        ``logs/<experiment_name>/<date>_<run_name>``."""
        from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

        if train_cfg is None:
            _, train_cfg = self.get_cfgs(name)
        if args is not None:
            update_cfg_from_args(None, train_cfg, args)

        if log_root == "default":
            log_root = os.path.join(ROOT_DIR, "logs", train_cfg.runner.experiment_name)
        if log_root is None:
            log_dir = None
        else:
            log_dir = os.path.join(
                log_root,
                datetime.now().strftime("%b%d_%H-%M-%S") + "_" + train_cfg.runner.run_name,
            )

        # runner class dispatch by name (reference train.py eval idiom)
        rcn = str(getattr(train_cfg, "runner_class_name", "OnPolicyRunner"))
        if rcn != "OnPolicyRunner":
            raise ValueError(f"unknown runner_class_name {rcn!r}")
        runner = OnPolicyRunner(env, train_cfg, log_dir=log_dir)
        if train_cfg.runner.resume:
            resume_path = get_load_path(
                log_root,
                load_run=train_cfg.runner.load_run,
                checkpoint=train_cfg.runner.checkpoint,
            )
            print(f"Loading model from: {resume_path}")
            runner.load(resume_path)
        return runner, train_cfg


def get_load_path(root, load_run=-1, checkpoint=-1):
    """Latest-run / latest-checkpoint resolution (helpers.py:108-130)."""
    try:
        # runs are directories; stray files in the log root (eval logs,
        # dashboards) must not be picked as the "latest run"
        runs = sorted(
            (x for x in os.listdir(root) if os.path.isdir(os.path.join(root, x))),
            key=lambda x: os.path.getmtime(os.path.join(root, x)),
        )
        if "exported" in runs:
            runs.remove("exported")
        last_run = os.path.join(root, runs[-1])
    except (IndexError, FileNotFoundError):
        raise ValueError(f"No runs in this directory: {root}")
    if load_run == -1:
        load_run = last_run
    else:
        load_run = os.path.join(root, load_run)
    if checkpoint == -1:
        models = [f for f in os.listdir(load_run) if "model" in f]
        models.sort(key=lambda m: f"{m:0>15}")
        if not models:
            raise ValueError(f"No checkpoints in run directory: {load_run}")
        model = models[-1]
    else:
        # checkpoints are orbax directories named model_<iteration> (see
        # OnPolicyRunner.save); the reference's `.pt` suffix
        # (helpers.py:125-128) does not apply here
        model = f"model_{checkpoint}"
        if not os.path.isdir(os.path.join(load_run, model)):
            available = sorted(
                f for f in os.listdir(load_run) if f.startswith("model_")
            )
            raise ValueError(
                f"Checkpoint {checkpoint!r} not found in {load_run}; "
                f"available: {available}"
            )
    return os.path.join(load_run, model)


def update_cfg_from_args(env_cfg, cfg_train, args):
    """CLI overrides (helpers.py:133-156)."""
    if env_cfg is not None:
        if getattr(args, "num_envs", None) is not None:
            env_cfg.env.num_envs = args.num_envs
    if cfg_train is not None:
        if getattr(args, "seed", None) is not None:
            cfg_train.seed = args.seed
        if getattr(args, "max_iterations", None) is not None:
            cfg_train.runner.max_iterations = args.max_iterations
        if getattr(args, "resume", False):
            cfg_train.runner.resume = args.resume
        if getattr(args, "experiment_name", None) is not None:
            cfg_train.runner.experiment_name = args.experiment_name
        if getattr(args, "run_name", None) is not None:
            cfg_train.runner.run_name = args.run_name
        if getattr(args, "load_run", None) is not None:
            cfg_train.runner.load_run = args.load_run
        if getattr(args, "checkpoint", None) is not None:
            cfg_train.runner.checkpoint = args.checkpoint


# global singleton (task_registry.py:160)
task_registry = TaskRegistry()
