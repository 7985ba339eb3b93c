"""Evaluation / deployment-export entry point — mirror of
`legged_gym/scripts/play.py:42-137`:

- overrides the config to a small, clean eval setup (<=50 envs, no noise, no
  DR, no pushes — play.py:46-56);
- loads the latest (or requested) checkpoint;
- exports the policy for deployment (the reference exports TorchScript for
  its C++ controller; we export a numpy .npz weight archive);
- rolls the policy and logs per-joint / base-velocity tracking via the eval
  Logger (utils/logger.py equivalent).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.utils.helpers import export_policy_npz, get_args, set_seed
from wiki_grx_gym_tpu.utils.task_registry import ROOT_DIR


def play(args, num_steps: int = 500, export: bool = True):
    env_cfg, train_cfg = task_registry.get_cfgs(args.task)

    # override some parameters for testing (play.py:46-56)
    env_cfg.env.num_envs = min(env_cfg.env.num_envs, 50)
    env_cfg.terrain.num_rows = 5
    env_cfg.terrain.num_cols = 5
    env_cfg.terrain.curriculum = False
    env_cfg.noise.add_noise = False
    dr = env_cfg.domain_rand
    dr.randomize_friction = dr.randomize_restitution = False
    dr.randomize_base_mass = dr.randomize_base_com = False
    dr.randomize_motor_strength = dr.push_robots = False
    dr.randomize_init_dof_pos = dr.randomize_init_base_velocity = False

    set_seed(args.seed if args.seed is not None else train_cfg.seed)
    env, env_cfg = task_registry.make_env(args.task, args=args, env_cfg=env_cfg)

    args.resume = True
    train_cfg.runner.resume = True
    runner, train_cfg = task_registry.make_alg_runner(
        env, args.task, args=args, train_cfg=train_cfg, log_root="default"
    )
    state = runner.init_state()
    resume_root = os.path.join(ROOT_DIR, "logs", train_cfg.runner.experiment_name)
    from wiki_grx_gym_tpu.utils.task_registry import get_load_path

    path = get_load_path(resume_root, train_cfg.runner.load_run, train_cfg.runner.checkpoint)
    print(f"Loading policy from: {path}")
    state = runner.load(path, state)
    policy = runner.get_inference_policy(state)

    if export:
        export_dir = os.path.join(resume_root, "exported", "policies")
        os.makedirs(export_dir, exist_ok=True)
        export_policy_npz(runner.net, state.ppo.params, os.path.join(export_dir, "policy.npz"))
        from wiki_grx_gym_tpu.deploy.runtime import export_policy_bin

        export_policy_bin(state.ppo.params, os.path.join(export_dir, "policy.grxpolicy"))
        print(f"Exported policy to {export_dir}/policy.npz and .grxpolicy")

    from wiki_grx_gym_tpu.utils.logger import EvalLogger

    logger = EvalLogger(env.dt)
    env_state, obs = state.env_state, state.obs
    step = env.step_jit
    # viewer.ref_env picks the robot the camera (here: the eval logger /
    # replay capture) follows (legged_robot_config.py viewer section; the
    # reference play.py hardcodes robot_index=0 and points the camera at
    # ref_env); an explicit --robot_index wins
    robot_index = getattr(
        args, "robot_index", int(getattr(env.cfg.viewer, "ref_env", 0))
    ) or 0
    robot_index = min(robot_index, env.num_envs - 1)
    # log a knee joint when the robot has one (the interesting tracking
    # channel for GRx gaits), else the reference's hard-coded joint 1
    # (play.py:88)
    knees = [i for i, nm in enumerate(env.model.dof_names) if "knee" in nm]
    joint_index = knees[0] if knees else min(1, env.num_dof - 1)

    record = bool(getattr(args, "record", False))
    traj = {"base_pos": [], "base_quat": [], "q": []} if record else None

    for i in range(num_steps):
        actions = policy(obs)
        env_state, out = step(env_state, actions)
        obs = out.obs
        if record:
            traj["base_pos"].append(np.asarray(env_state.physics.base_pos[robot_index]))
            traj["base_quat"].append(np.asarray(env_state.physics.base_quat[robot_index]))
            traj["q"].append(np.asarray(env_state.physics.q[robot_index]))
        # base velocities / contact forces come from the named eval channels
        # in extras — the counterparts of env.base_lin_vel / env.contact_forces
        # the reference logger reads (play.py:120-125)
        logger.log_states(
            {
                "dof_pos_target": float(actions[robot_index, joint_index])
                * env.cfg.control.action_scale,
                "dof_pos": float(env_state.physics.q[robot_index, joint_index]),
                "dof_vel": float(env_state.physics.qd[robot_index, joint_index]),
                "dof_torque": float(env_state.torques[robot_index, joint_index]),
                "command_x": float(env_state.commands[robot_index, 0]),
                "command_y": float(env_state.commands[robot_index, 1]),
                "command_yaw": float(env_state.commands[robot_index, 2]),
                "base_vel_x": float(out.extras["base_lin_vel"][robot_index, 0]),
                "base_vel_y": float(out.extras["base_lin_vel"][robot_index, 1]),
                "base_vel_z": float(out.extras["base_lin_vel"][robot_index, 2]),
                "base_vel_yaw": float(out.extras["base_ang_vel"][robot_index, 2]),
                "contact_forces_z": np.asarray(
                    out.extras["feet_contact_force"][robot_index, :, 2]
                ),
            }
        )
        logger.log_rewards({"rew_total": float(out.rew[robot_index])}, int(out.reset.sum()))
    logger.print_rewards()
    logger.save_plots(os.path.join(resume_root, "eval_plots.png"))
    if record:
        # replayable pose artifact: animate with
        #   python tools/visualize.py --task <task> --replay <traj.npz>
        # (the offline stand-in for the reference's live viewer,
        # base_task.py:89-150)
        traj_path = os.path.join(resume_root, "traj.npz")
        np.savez(
            traj_path,
            base_pos=np.stack(traj["base_pos"]),
            base_quat=np.stack(traj["base_quat"]),
            q=np.stack(traj["q"]),
            dt=np.float32(env.dt),
            task=np.str_(args.task),
        )
        print(f"Recorded {num_steps}-step trajectory to {traj_path}")
    return logger


if __name__ == "__main__":
    play(get_args())
