"""GR1T1 humanoid configs — full-body (32 DOF) and lower-limb (10 DOF, the
registered training task).

Values mirror `legged_gym/envs/gr1t1/gr1t1_config.py` and
`gr1t1_lower_limb_config.py`. Per-joint arrays (action boxes) are kept as
name-keyed dicts applied by joint-name match, so they are robust to DOF
ordering; the reference relies on positional arrays instead
(`gr1t1_lower_limb_config.py:83-104`).
"""

import math

import numpy as np

from wiki_grx_gym_tpu.envs.fftai_config import LeggedRobotFFTAICfg, LeggedRobotFFTAICfgPPO

_E = math.e
_D30 = np.deg2rad(30)


class GR1T1Cfg(LeggedRobotFFTAICfg):
    class sim(LeggedRobotFFTAICfg.sim):
        dt = 0.002

    class env(LeggedRobotFFTAICfg.env):
        num_envs = 8192
        episode_length_s = 20
        # the reference's full-body config claims num_obs=121
        # (gr1t1_config.py:18) but its own obs profile (gr1t1.py:281-295)
        # yields 9 + 3*32 = 105; the full-body task is unregistered there.
        # We declare the true layout.
        num_obs = 105
        num_pri_obs = 234
        num_actions = 32

    class terrain(LeggedRobotFFTAICfg.terrain):
        mesh_type = "plane"

    class asset(LeggedRobotFFTAICfg.asset):
        file = "gr1t1"   # compiled robot spec in models/resources/
        name = "GR1T1"

        torso_name = "torso"
        forehead_name = "head_pitch"
        imu_name = "IMU"
        waist_name = "waist"
        head_name = "head"
        thigh_name = "thigh"
        shank_name = "shank"
        foot_name = "foot_roll"
        sole_name = "sole"
        upper_arm_name = "upper_arm"
        lower_arm_name = "lower_arm"
        hand_name = "hand"

        hip_name = "hip"
        hip_roll_name = "hip_roll"
        hip_yaw_name = "hip_yaw"
        hip_pitch_name = "hip_pitch"
        knee_name = "knee"
        ankle_name = "ankle"
        ankle_pitch_name = "ankle_pitch"
        ankle_roll_name = "ankle_roll"

        penalize_contacts_on = []
        terminate_after_contacts_on = [
            "IMU", "torso", "head_pitch", "waist", "upper_arm", "lower_arm", "hand",
        ]

    class init_state(LeggedRobotFFTAICfg.init_state):
        pos = [0.0, 0.0, 0.95]
        rot = [0.0, 0.0, 0.0, 1.0]
        lin_vel = [0.0, 0.0, 0.0]
        ang_vel = [0.0, 0.0, 0.0]
        default_joint_angles = {
            "left_hip_roll_joint": 0.0,
            "left_hip_yaw_joint": 0.0,
            "left_hip_pitch_joint": -float(np.deg2rad(15)),
            "left_knee_pitch_joint": float(np.deg2rad(30)),
            "left_ankle_pitch_joint": -float(np.deg2rad(15)),
            "left_ankle_roll_joint": 0.0,
            "right_hip_roll_joint": 0.0,
            "right_hip_yaw_joint": 0.0,
            "right_hip_pitch_joint": -float(np.deg2rad(15)),
            "right_knee_pitch_joint": float(np.deg2rad(30)),
            "right_ankle_pitch_joint": -float(np.deg2rad(15)),
            "right_ankle_roll_joint": 0.0,
            "waist_yaw_joint": 0.0,
            "waist_pitch_joint": 0.0,
            "waist_roll_joint": 0.0,
            "head_yaw_joint": 0.0,
            "head_pitch_joint": 0.0,
            "head_roll_joint": 0.0,
            "left_shoulder_pitch_joint": 0.0,
            "left_shoulder_roll_joint": 0.2,
            "left_shoulder_yaw_joint": 0.0,
            "left_elbow_pitch_joint": -0.3,
            "left_wrist_yaw_joint": 0.0,
            "left_wrist_roll_joint": 0.0,
            "left_wrist_pitch_joint": 0.0,
            "right_shoulder_pitch_joint": 0.0,
            "right_shoulder_roll_joint": -0.2,
            "right_shoulder_yaw_joint": 0.0,
            "right_elbow_pitch_joint": -0.3,
            "right_wrist_yaw_joint": 0.0,
            "right_wrist_roll_joint": 0.0,
            "right_wrist_pitch_joint": 0.0,
        }

    class commands(LeggedRobotFFTAICfg.commands):
        curriculum = False
        curriculum_chg_lin_vel_x = 0.25
        curriculum_chg_lin_vel_y = 0.25
        curriculum_chg_ang_vel_yaw = 0.25
        curriculum_max_lin_vel_x = 1.00
        curriculum_max_lin_vel_y = 0.50
        curriculum_max_ang_vel_yaw = 1.00
        num_commands = 3
        resampling_command_interval_s = 10.0
        heading_command = False

        class ranges(LeggedRobotFFTAICfg.commands.ranges):
            lin_vel_x = [-1.00, 1.00]
            lin_vel_y = [-0.50, 0.50]
            ang_vel_yaw = [-1.00, 1.00]

    class control(LeggedRobotFFTAICfg.control):
        stiffness = {
            "hip_roll": 251.625, "hip_yaw": 362.5214, "hip_pitch": 200,
            "knee_pitch": 200,
            "ankle_pitch": 10.9805, "ankle_roll": 0.25,
            "waist_yaw": 362.5214, "waist_pitch": 362.5214, "waist_roll": 362.5214,
            "head_yaw": 10.0, "head_pitch": 10.0, "head_roll": 10.0,
            "shoulder_pitch": 92.85, "shoulder_roll": 92.85, "shoulder_yaw": 112.06,
            "elbow_pitch": 112.06,
            "wrist_yaw": 10.0, "wrist_roll": 10.0, "wrist_pitch": 10.0,
        }
        damping = {
            "hip_roll": 14.72, "hip_yaw": 10.0833, "hip_pitch": 11,
            "knee_pitch": 11,
            "ankle_pitch": 0.5991, "ankle_roll": 0.01,
            "waist_yaw": 10.0833, "waist_pitch": 10.0833, "waist_roll": 10.0833,
            "head_yaw": 1.0, "head_pitch": 1.0, "head_roll": 1.0,
            "shoulder_pitch": 2.575, "shoulder_roll": 2.575, "shoulder_yaw": 3.1,
            "elbow_pitch": 3.1,
            "wrist_yaw": 1.0, "wrist_roll": 1.0, "wrist_pitch": 1.0,
        }
        action_scale = 1.0
        decimation = 10

    class rewards(LeggedRobotFFTAICfg.rewards):
        only_positive_rewards = False

        base_height_target = 0.85
        swing_feet_height_target = 0.10
        feet_stumble_ratio = 5.0
        feet_air_time_target = 0.5
        feet_land_time_max = 1.0
        tracking_sigma = 1.0
        soft_dof_pos_limit = 0.95
        soft_dof_vel_limit = 0.95
        soft_torque_limit = 0.95
        max_contact_force = 500.0

        sigma_collision = -1.0 * _E
        sigma_stand_still = -1.0 * _E
        sigma_cmd_diff_lin_vel_x = -1.0 * _E * (1.0 / 0.50)
        sigma_cmd_diff_lin_vel_y = -1.0 * _E * (1.0 / 1.00)
        sigma_cmd_diff_lin_vel_z = -1.0 * _E
        sigma_cmd_diff_ang_vel_roll = -1.0 * _E
        sigma_cmd_diff_ang_vel_pitch = -1.0 * _E
        sigma_cmd_diff_ang_vel_yaw = -1.0 * _E * (1.0 / 3.00)
        sigma_cmd_diff_base_height = -10.0 * _E
        sigma_cmd_diff_base_orient = -20.0
        sigma_cmd_diff_torso_orient = -20.0
        sigma_cmd_diff_forehead_orient = -20.0
        sigma_action_diff = -0.1
        sigma_action_diff_knee = -1.0
        sigma_dof_vel_new = -0.01
        sigma_dof_vel_new_knee = -0.05
        sigma_dof_acc_new = -0.001 * _E
        sigma_dof_tor_new = -0.01 * _E
        sigma_dof_tor_new_hip_roll = -0.002
        sigma_dof_tor_ankle_feet_lift_up = -1.0
        sigma_pose_offset = -0.1
        sigma_pose_offset_hip_yaw = -0.1
        sigma_limits_dof_pos = -1.0
        sigma_limits_dof_vel = -10.0
        sigma_limits_dof_tor = -0.1
        sigma_feet_speed_xy_close_to_ground = -10.0
        sigma_feet_speed_z_close_to_height_target = -10.0
        sigma_feet_air_time = -1.0
        sigma_feet_air_time_mid = -10.0
        sigma_feet_air_height = -200.0
        sigma_feet_air_force = -0.05
        sigma_feet_land_time = -1.0
        sigma_on_the_air = -1.0
        sigma_feet_stumble = -1.0

        class scales(LeggedRobotFFTAICfg.rewards.scales):
            termination = 0.0

    class noise(LeggedRobotFFTAICfg.noise):
        add_noise = True
        noise_level = 1.0

        class noise_scales(LeggedRobotFFTAICfg.noise.noise_scales):
            action = 0.00
            lin_vel = 0.10
            ang_vel = 0.05
            gravity = 0.03
            dof_pos = 0.04
            dof_vel = 0.20
            height_measurements = 0.05

    class normalization(LeggedRobotFFTAICfg.normalization):
        class obs_scales(LeggedRobotFFTAICfg.normalization.obs_scales):
            action = 1.0
            lin_vel = 1.0
            ang_vel = 1.0
            gravity = 1.0
            dof_pos = 1.0
            dof_vel = 1.0
            height_measurements = 5.0

        clip_observations = 100.0
        # name-keyed joint-space action boxes; clip boxes are widened by 1% of
        # the span, matching gr1t1_config.py:302-307
        actions_max = {
            "left_hip_roll": 0.79, "left_hip_yaw": 0.7, "left_hip_pitch": 0.7,
            "left_knee_pitch": 1.92, "left_ankle_pitch": 0.52, "left_ankle_roll": 0.44,
            "right_hip_roll": 0.09, "right_hip_yaw": 0.7, "right_hip_pitch": 0.7,
            "right_knee_pitch": 1.92, "right_ankle_pitch": 0.52, "right_ankle_roll": 0.44,
            "waist_yaw": 1.05, "waist_pitch": 1.22, "waist_roll": 0.7,
            "head_yaw": 2.71, "head_roll": 0.35, "head_pitch": 0.35,
            "left_shoulder_pitch": 1.92, "left_shoulder_roll": 3.27, "left_shoulder_yaw": 2.97,
            "left_elbow_pitch": 2.27, "left_wrist_yaw": 2.97, "left_wrist_roll": 0.61,
            "left_wrist_pitch": 0.61,
            "right_shoulder_pitch": 1.92, "right_shoulder_roll": 0.57, "right_shoulder_yaw": 2.97,
            "right_elbow_pitch": 2.27, "right_wrist_yaw": 2.97, "right_wrist_roll": 0.61,
            "right_wrist_pitch": 0.61,
        }
        actions_min = {
            "left_hip_roll": -0.09, "left_hip_yaw": -0.7, "left_hip_pitch": -1.75,
            "left_knee_pitch": -0.09, "left_ankle_pitch": -1.05, "left_ankle_roll": -0.44,
            "right_hip_roll": -0.79, "right_hip_yaw": -0.7, "right_hip_pitch": -1.75,
            "right_knee_pitch": -0.09, "right_ankle_pitch": -1.05, "right_ankle_roll": -0.44,
            "waist_yaw": -1.05, "waist_pitch": -0.52, "waist_roll": -0.7,
            "head_yaw": -2.71, "head_roll": -0.35, "head_pitch": -0.52,
            "left_shoulder_pitch": -2.79, "left_shoulder_roll": -0.57, "left_shoulder_yaw": -2.97,
            "left_elbow_pitch": -2.27, "left_wrist_yaw": -2.97, "left_wrist_roll": -0.61,
            "left_wrist_pitch": -0.61,
            "right_shoulder_pitch": -2.79, "right_shoulder_roll": -3.27, "right_shoulder_yaw": -2.97,
            "right_elbow_pitch": -2.27, "right_wrist_yaw": -2.97, "right_wrist_roll": -0.61,
            "right_wrist_pitch": -0.61,
        }
        clip_margin_mode = "span"  # widen by 1% of |max|+|min| (gr1t1_config.py:302-307)


class GR1T1CfgPPO(LeggedRobotFFTAICfgPPO):
    runner_class_name = "OnPolicyRunner"

    class runner(LeggedRobotFFTAICfgPPO.runner):
        algorithm_class_name = "PPO"
        policy_class_name = "ActorCriticMLP"
        experiment_name = "GR1T1"
        num_steps_per_env = 64
        run_name = "gr1t1"
        max_iterations = 2000
        save_interval = 100

    class algorithm(LeggedRobotFFTAICfgPPO.algorithm):
        num_learning_epochs = 8
        num_mini_batches = 25
        learning_rate = 1.0e-4
        learning_rate_min = 1.0e-5
        learning_rate_max = 1.0e-3
        schedule = "adaptive"
        desired_kl = 0.01
        storage_class = "RolloutStorage"

    class policy(LeggedRobotFFTAICfgPPO.policy):
        actor_hidden_dims = [512, 256, 128]
        critic_hidden_dims = [512, 256, 128]
        activation = "elu"
        actor_output_activation = None
        critic_output_activation = None
        fixed_std = False
        init_noise_std = 0.2


class GR1T1LowerLimbCfg(GR1T1Cfg):
    class env(GR1T1Cfg.env):
        num_envs = 8192
        num_obs = 39
        num_pri_obs = 168
        num_actions = 10

    class terrain(GR1T1Cfg.terrain):
        mesh_type = "plane"

    class control(GR1T1Cfg.control):
        # torque-spec-derived PD gains (gr1t1_lower_limb_config.py:21-35)
        stiffness = {
            "hip_roll": 48 / _D30,
            "hip_yaw": 66 / _D30,
            "hip_pitch": 130 / _D30,
            "knee_pitch": 130 / _D30,
            "ankle_pitch": 15 / _D30,
        }
        damping = {
            "hip_roll": 48 / _D30 / 10 * 0.5,
            "hip_yaw": 66 / _D30 / 10 * 0.5,
            "hip_pitch": 130 / _D30 / 10 * 0.5,
            "knee_pitch": 130 / _D30 / 10 * 0.5,
            "ankle_pitch": 15 / _D30 / 10 * 0.5,
        }

    class asset(GR1T1Cfg.asset):
        file = "gr1t1_lower_limb"

    class rewards(GR1T1Cfg.rewards):
        class scales(GR1T1Cfg.rewards.scales):
            termination = -0.0
            collision = -0.0
            stand_still = 1.0
            cmd_diff_lin_vel_x = 1.00
            cmd_diff_lin_vel_y = 0.50
            cmd_diff_ang_vel_yaw = 0.75
            cmd_diff_lin_vel_z = 0.25
            cmd_diff_base_height = 0.50
            cmd_diff_base_orient = 0.25
            cmd_diff_torso_orient = 0.5
            action_diff = -5.0
            action_diff_diff = -1.0
            dof_acc_new = -0.25
            dof_tor_new = -0.05
            dof_tor_ankle_feet_lift_up = -0.5
            pose_offset = 1.0
            limits_dof_pos = -10.00
            limits_dof_vel = -5.00
            limits_dof_tor = -1.00
            feet_speed_xy_close_to_ground = 0.50
            feet_speed_z_close_to_height_target = 0.0
            feet_air_time = 2.0
            feet_air_height = 1.5
            feet_air_force = 1.0
            feet_land_time = -1.0
            on_the_air = -10.0
            feet_stumble = -0.2

    class normalization(GR1T1Cfg.normalization):
        actions_max = {
            "left_hip_roll": 0.79, "left_hip_yaw": 0.7, "left_hip_pitch": 0.7,
            "left_knee_pitch": 1.92, "left_ankle_pitch": 0.52,
            "right_hip_roll": 0.09, "right_hip_yaw": 0.7, "right_hip_pitch": 0.7,
            "right_knee_pitch": 1.92, "right_ankle_pitch": 0.52,
        }
        actions_min = {
            "left_hip_roll": -0.09, "left_hip_yaw": -0.7, "left_hip_pitch": -1.75,
            "left_knee_pitch": -0.09, "left_ankle_pitch": -1.05,
            "right_hip_roll": -0.79, "right_hip_yaw": -0.7, "right_hip_pitch": -1.75,
            "right_knee_pitch": -0.09, "right_ankle_pitch": -1.05,
        }
        clip_observations = 100.0
        clip_margin_mode = "deg30"  # widen by 30 deg (gr1t1_lower_limb_config.py:92-104)


class GR1T1LowerLimbCfgPPO(GR1T1CfgPPO):
    class runner(GR1T1CfgPPO.runner):
        run_name = "gr1t1_lower_limb"
        max_iterations = 1000

    class algorithm(GR1T1CfgPPO.algorithm):
        desired_kl = 0.03

    class policy(GR1T1CfgPPO.policy):
        pass


class GR1T1LowerLimbCfgPPOLstm(GR1T1LowerLimbCfgPPO):
    """Recurrent variant: LSTM memories ahead of the MLP heads
    (learn/recurrent.py; completes the reference's dormant LSTM scaffolding,
    rsl_rl utils.py:10-57 + helpers.py:204-231)."""

    class runner(GR1T1LowerLimbCfgPPO.runner):
        run_name = "gr1t1_lower_limb_lstm"
        experiment_name = "GR1T1_lstm"

    class policy(GR1T1LowerLimbCfgPPO.policy):
        rnn_type = "lstm"
        rnn_hidden_size = 256
        rnn_num_layers = 1


class GR1T1FullCfg(GR1T1Cfg):
    """Trainable full-body (32-DOF) task — an extension beyond the reference.

    The reference never registers the full-body config as a task
    (legged_gym/envs/__init__.py:42-54 maps "GR1T1" to the lower-limb
    variant) and leaves `GR1T1Cfg.rewards.scales` empty
    (gr1t1_config.py:258-259 sets only termination=0), so the full-body
    base cannot train as shipped. This config adopts the validated
    lower-limb reward recipe (gr1t1_lower_limb_config.py:41-69) over the
    full body: every term (tracking, pose offset, action smoothness,
    joint limits, feet gait shaping) is DOF-generic, so the same scales
    regularize the 22 extra waist/head/arm joints through pose_offset,
    action_diff, dof_acc/tor and the limit penalties."""

    class rewards(GR1T1Cfg.rewards):
        class scales(GR1T1LowerLimbCfg.rewards.scales):
            pass

    class normalization(GR1T1Cfg.normalization):
        # tight action boxes on the 22 non-leg joints: the policy commands
        # the full 32-DOF body, but waist/head/arm targets stay within
        # +-0.05 rad of the default pose. Measured (r4 .tpujobs/j15/j18):
        # with the lower-limb boxes open on all 32 joints, the summed
        # penalty terms dominate the 10-DOF-tuned reward recipe and PPO
        # plateaus at ~1.3 s episodes (with the default entropy the action
        # std then diverges 0.13 -> 1.24); the robot stands fine under PD
        # hold (j20), so locomotion is learned by the legs within the full
        # 32-DOF dynamics while the upper body holds pose.
        actions_max = dict(
            GR1T1Cfg.normalization.actions_max,
            **{k: 0.05 for k in (
                "waist_yaw", "waist_pitch", "waist_roll",
                "head_yaw", "head_roll", "head_pitch",
                "left_shoulder_pitch", "left_shoulder_roll", "left_shoulder_yaw",
                "left_elbow_pitch", "left_wrist_yaw", "left_wrist_roll",
                "left_wrist_pitch",
                "right_shoulder_pitch", "right_shoulder_roll", "right_shoulder_yaw",
                "right_elbow_pitch", "right_wrist_yaw", "right_wrist_roll",
                "right_wrist_pitch",
            )},
        )
        actions_min = dict(
            GR1T1Cfg.normalization.actions_min,
            **{k: -0.05 for k in (
                "waist_yaw", "waist_pitch", "waist_roll",
                "head_yaw", "head_roll", "head_pitch",
                "left_shoulder_pitch", "left_shoulder_roll", "left_shoulder_yaw",
                "left_elbow_pitch", "left_wrist_yaw", "left_wrist_roll",
                "left_wrist_pitch",
                "right_shoulder_pitch", "right_shoulder_roll", "right_shoulder_yaw",
                "right_elbow_pitch", "right_wrist_yaw", "right_wrist_roll",
                "right_wrist_pitch",
            )},
        )


class GR1T1FullCfgPPO(GR1T1CfgPPO):
    class runner(GR1T1CfgPPO.runner):
        run_name = "gr1t1_full"

    class policy(GR1T1CfgPPO.policy):
        # exploration floor (r5, .tpujobs/r5f_fullbody): with entropy_coef=0
        # (required — see algorithm below) the learnable std anneals to
        # ~0.04 by iter 2000 and exploration ends before velocity tracking
        # sharpens (vx tracking 18-47%, docs/TRAINING.md r4). Projecting
        # the std at 0.10 keeps exploring without the instability of a
        # fixed sigma=0.2 (which destabilized: 51-97% survival, j26).
        noise_std_floor = 0.10

    class algorithm(GR1T1CfgPPO.algorithm):
        # adopt the *validated* lower-limb recipe (desired_kl 0.03,
        # gr1t1_lower_limb_config.py:113) rather than the reference full
        # config's 0.01: at 0.01 the adaptive-KL rule pins the LR at its
        # 1e-5 floor for the whole run (measured KL ~0.015 never falls
        # below desired/2) and the 32-DOF policy cannot learn to walk
        desired_kl = 0.03
        # no entropy bonus: on the 20 tightly-boxed upper-body joints extra
        # Gaussian noise is clipped away by the action boxes, so entropy is
        # a free reward and the learnable std diverges (0.2 -> 1.27 within
        # 400 iterations, measured r4 .tpujobs/j24)
        entropy_coef = 0.0
