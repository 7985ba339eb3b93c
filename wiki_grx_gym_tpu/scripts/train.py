"""Training entry point — mirror of `legged_gym/scripts/train.py:40-47`.

    python -m wiki_grx_gym_tpu.scripts.train --task=GR1T1 [--num_envs N]
        [--seed S] [--max_iterations K] [--resume] [--num_mp M]
"""

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.utils.helpers import get_args, set_seed


def train(args):
    if args.distributed:
        from wiki_grx_gym_tpu.parallel.mesh import init_distributed

        init_distributed()

    from wiki_grx_gym_tpu.parallel.mesh import make_mesh

    _, train_cfg = task_registry.get_cfgs(args.task)
    seed = set_seed(args.seed if args.seed is not None else train_cfg.seed)
    args.seed = seed

    env, env_cfg = task_registry.make_env(args.task, args=args)
    mesh = make_mesh(num_mp=args.num_mp)
    runner, train_cfg = task_registry.make_alg_runner(env, args.task, args=args)
    runner.mesh = mesh
    runner.learn(
        num_learning_iterations=train_cfg.runner.max_iterations,
        init_at_random_ep_len=True,
    )


if __name__ == "__main__":
    train(get_args())
