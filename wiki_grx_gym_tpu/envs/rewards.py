"""Reward library: every reward term of the FFTAI/GR1T1 stack as a pure
function ``(env, ctx) -> (num_envs,)``.

The reference discovers rewards by reflection over nonzero config scales
(`legged_robot.py:840-866`); here the same name-driven selection happens at
build time over the ``REWARDS`` registry, and the selected functions are
summed inside the jitted step.

Function semantics mirror, line for line in math (not in code):
- `legged_gym/envs/fftai/legged_robot_fftai.py:181-353`
- `legged_gym/envs/gr1t1/gr1t1.py:340-589`
- `legged_gym/envs/base/legged_robot.py:1277-1376` (the ETH originals)

All exp-shaped terms use per-term sigmas from ``cfg.rewards`` (e.g.
``sigma_cmd_diff_lin_vel_x``, `gr1t1_config.py:208-254`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RewardContext(NamedTuple):
    """Everything the reward stack reads, post-physics for one policy step."""

    commands: jax.Array             # (N, 3)
    base_lin_vel: jax.Array         # (N, 3) base frame
    base_ang_vel: jax.Array         # (N, 3) base frame
    base_projected_gravity: jax.Array  # (N, 3)
    base_heights_offset: jax.Array  # (N,) — pre-scaled by obs height scale (fftai:149-157)
    base_height: jax.Array          # (N,) raw mean(base_z - measured_heights) (legged_robot.py:1291)
    torso_projected_gravity: jax.Array     # (N, 3)
    forehead_projected_gravity: jax.Array  # (N, 3)
    dof_pos: jax.Array              # (N, D)
    dof_vel: jax.Array              # (N, D)
    dof_acc: jax.Array              # (N, D)
    torques: jax.Array              # (N, D)
    actions: jax.Array              # (N, A)
    last_actions: jax.Array         # (N, A)
    last_last_actions: jax.Array    # (N, A)
    feet_contact: jax.Array         # (N, F) bool
    feet_first_contact: jax.Array   # (N, F) bool/float
    feet_air_time: jax.Array        # (N, F)
    feet_land_time: jax.Array       # (N, F)
    feet_height: jax.Array          # (N, F) vs measured terrain
    feet_contact_force: jax.Array   # (N, F, 3) net per-foot contact force
    avg_feet_contact_force: jax.Array  # (N, F) decimation average of |force|
    avg_feet_speed_xyz: jax.Array   # (N, F, 3) decimation average of |v|
    penalized_contact_count: jax.Array  # (N,) links in penalize list with |F| > 0.1
    reset_buf: jax.Array            # (N,) bool
    time_out_buf: jax.Array         # (N,) bool


def _cmd_active(ctx):
    """No gait reward for near-zero commands (`gr1t1.py:498` etc.)."""
    return jnp.linalg.norm(ctx.commands[:, :2], axis=1) > 0.1


# ---------------------------------------------------------------------------
# FFTAI base terms (legged_robot_fftai.py:181-353)
# ---------------------------------------------------------------------------


def termination(env, ctx):
    return (ctx.reset_buf & ~ctx.time_out_buf).astype(jnp.float32)


def collision(env, ctx):
    sig = env.cfg.rewards.sigma_collision
    return 1.0 - jnp.exp(sig * ctx.penalized_contact_count)


def stand_still(env, ctx):
    sig = env.cfg.rewards.sigma_stand_still
    err = jnp.sum(jnp.abs(ctx.dof_pos - env.default_dof_pos), axis=1)
    sel = jnp.linalg.norm(ctx.commands[:, :2], axis=1) < 0.1
    return jnp.exp(sig * err) * sel


def cmd_diff_lin_vel_x(env, ctx):
    err = jnp.abs(ctx.commands[:, 0] - ctx.base_lin_vel[:, 0])
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_lin_vel_x * err)


def cmd_diff_lin_vel_y(env, ctx):
    err = jnp.abs(ctx.commands[:, 1] - ctx.base_lin_vel[:, 1])
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_lin_vel_y * err)


def cmd_diff_lin_vel_z(env, ctx):
    err = jnp.abs(ctx.base_lin_vel[:, 2])
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_lin_vel_z * err)


def cmd_diff_ang_vel_roll(env, ctx):
    err = jnp.abs(ctx.base_ang_vel[:, 0])
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_ang_vel_roll * err)


def cmd_diff_ang_vel_pitch(env, ctx):
    err = jnp.abs(ctx.base_ang_vel[:, 1])
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_ang_vel_pitch * err)


def cmd_diff_ang_vel_yaw(env, ctx):
    err = jnp.abs(ctx.commands[:, 2] - ctx.base_ang_vel[:, 2])
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_ang_vel_yaw * err)


def cmd_diff_base_height(env, ctx):
    # only heights below target are penalized (fftai:241-245)
    err = jnp.abs(ctx.base_heights_offset) * (ctx.base_heights_offset < 0)
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_base_height * err)


def cmd_diff_base_orient(env, ctx):
    err = jnp.sum(jnp.abs(ctx.base_projected_gravity[:, :2]), axis=1)
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_base_orient * err)


def cmd_diff_torso_orient(env, ctx):
    err = jnp.sum(jnp.abs(ctx.torso_projected_gravity[:, :2]), axis=1)
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_torso_orient * err)


def cmd_diff_forehead_orient(env, ctx):
    err = jnp.sum(jnp.abs(ctx.forehead_projected_gravity[:, :2]), axis=1)
    return jnp.exp(env.cfg.rewards.sigma_cmd_diff_forehead_orient * err)


def action_diff(env, ctx):
    err = (ctx.last_actions - ctx.actions) * env.cfg.control.action_scale
    err = jnp.sum(jnp.abs(err), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_action_diff * err)


def action_diff_diff(env, ctx):
    # NOTE: the reference updates last_last_actions *after* last_actions
    # every step (legged_robot_fftai.py:94 after legged_robot.py:299), so at
    # reward time last_last == last and this is a second action_diff with a
    # different sigma. Reproduced faithfully.
    d1 = (ctx.last_actions - ctx.actions) * env.cfg.control.action_scale
    d0 = (ctx.last_last_actions - ctx.last_actions) * env.cfg.control.action_scale
    err = jnp.sum(jnp.abs(d1 - d0), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_action_diff_diff * err)


def action_diff_knee(env, ctx):
    idx = jnp.asarray(env.knee_dofs, jnp.int32)
    err = (ctx.actions[:, idx] - ctx.last_actions[:, idx]) * env.cfg.control.action_scale
    err = jnp.sum(jnp.abs(err), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_action_diff_knee * err)


def dof_vel_new(env, ctx):
    err = jnp.sum(jnp.abs(ctx.dof_vel), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_dof_vel_new * err)


def dof_vel_new_knee(env, ctx):
    idx = jnp.asarray(env.knee_dofs, jnp.int32)
    err = jnp.sum(jnp.abs(ctx.dof_vel[:, idx]), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_dof_vel_new_knee * err)


def dof_acc_new(env, ctx):
    err = jnp.sum(jnp.abs(ctx.dof_acc), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_dof_acc_new * err)


def dof_tor_new(env, ctx):
    err = jnp.sum(jnp.abs(ctx.torques), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_dof_tor_new * err)


def dof_tor_new_hip_roll(env, ctx):
    idx = jnp.asarray(env.hip_roll_dofs, jnp.int32)
    err = jnp.sum(jnp.abs(ctx.torques[:, idx]), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_dof_tor_new_hip_roll * err)


def pose_offset(env, ctx):
    err = jnp.sum(jnp.abs(ctx.dof_pos - env.default_dof_pos), axis=1)
    return jnp.exp(env.cfg.rewards.sigma_pose_offset * err)


def pose_offset_hip_yaw(env, ctx):
    idx = jnp.asarray(env.hip_yaw_dofs, jnp.int32)
    err = jnp.sum(jnp.abs(ctx.dof_pos[:, idx] - env.default_dof_pos[idx]), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_pose_offset_hip_yaw * err)


def limits_dof_pos(env, ctx):
    lo = -jnp.clip(ctx.dof_pos - env.dof_pos_soft_lower, max=0.0)
    hi = jnp.clip(ctx.dof_pos - env.dof_pos_soft_upper, min=0.0)
    err = jnp.sum(jnp.abs(lo + hi), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_limits_dof_pos * err)


def limits_dof_vel(env, ctx):
    over = jnp.clip(
        jnp.abs(ctx.dof_vel) - env.dof_vel_limits * env.cfg.rewards.soft_dof_vel_limit,
        min=0.0,
        max=1.0,
    )
    err = jnp.sum(over, axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_limits_dof_vel * err)


def limits_dof_tor(env, ctx):
    over = jnp.clip(
        jnp.abs(ctx.torques) - env.torque_limits * env.cfg.rewards.soft_torque_limit,
        min=0.0,
    )
    err = jnp.sum(over, axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_limits_dof_tor * err)


# ---------------------------------------------------------------------------
# GR1T1 foot/gait terms (gr1t1.py:398-589)
# ---------------------------------------------------------------------------


def dof_tor_ankle_feet_lift_up(env, ctx):
    sig = env.cfg.rewards.sigma_dof_tor_ankle_feet_lift_up
    target = env.cfg.rewards.swing_feet_height_target
    ankles = env.ankle_dofs
    half = len(ankles) // 2
    left = jnp.asarray(ankles[:half], jnp.int32)
    right = jnp.asarray(ankles[half:], jnp.int32)
    lh, rh = ctx.feet_height[:, 0], ctx.feet_height[:, 1]
    err_l = (
        jnp.sum(jnp.abs(ctx.torques[:, left]), axis=1) * jnp.abs(lh) * (lh > target / 2)
    )
    err_r = (
        jnp.sum(jnp.abs(ctx.torques[:, right]), axis=1) * jnp.abs(rh) * (rh > target / 2)
    )
    return 1.0 - jnp.exp(sig * (err_l + err_r))


def feet_speed_xy_close_to_ground(env, ctx):
    sig = env.cfg.rewards.sigma_feet_speed_xy_close_to_ground
    quarter = env.cfg.rewards.swing_feet_height_target / 4
    h = ctx.feet_height                                  # (N, 2)
    closeness = jnp.abs(h - quarter) * (h < quarter) / quarter
    speed_xy = jnp.linalg.norm(ctx.avg_feet_speed_xyz[:, :, :2], axis=2)
    err = jnp.sum(speed_xy * closeness, axis=1)
    return jnp.exp(sig * err)


def feet_speed_z_close_to_height_target(env, ctx):
    sig = env.cfg.rewards.sigma_feet_speed_z_close_to_height_target
    target = env.cfg.rewards.swing_feet_height_target
    h = ctx.feet_height
    closeness = jnp.abs(h - target * 3 / 4) * (h > target * 3 / 4) / (target / 4)
    speed_z = jnp.abs(ctx.avg_feet_speed_xyz[:, :, 2])
    err = jnp.sum(speed_z * closeness, axis=1)
    return jnp.exp(sig * err)


def feet_air_time(env, ctx):
    sig = env.cfg.rewards.sigma_feet_air_time
    err = jnp.abs(ctx.feet_air_time - env.cfg.rewards.feet_air_time_target)
    rew = jnp.exp(sig * err) * ctx.feet_first_contact
    return jnp.sum(rew, axis=1) * _cmd_active(ctx)


def feet_air_height(env, ctx):
    sig = env.cfg.rewards.sigma_feet_air_height
    target = env.cfg.rewards.swing_feet_height_target
    min_h = jnp.min(ctx.feet_height, axis=1, keepdims=True)
    err_h = jnp.abs(ctx.feet_height - min_h - target)
    mid_err = jnp.abs(ctx.feet_air_time - env.cfg.rewards.feet_air_time_target / 2)
    rew = jnp.exp(sig * jnp.sum(mid_err * err_h, axis=1))
    return rew * _cmd_active(ctx)


def feet_air_force(env, ctx):
    sig = env.cfg.rewards.sigma_feet_air_force
    mid_err = jnp.abs(ctx.feet_air_time - env.cfg.rewards.feet_air_time_target / 2)
    err = jnp.sum(mid_err * ctx.avg_feet_contact_force, axis=1)
    return jnp.exp(sig * err) * _cmd_active(ctx)


def feet_land_time(env, ctx):
    sig = env.cfg.rewards.sigma_feet_land_time
    over = (ctx.feet_land_time - env.cfg.rewards.feet_land_time_max) * (
        ctx.feet_land_time > env.cfg.rewards.feet_land_time_max
    )
    rew = jnp.sum(1.0 - jnp.exp(sig * over), axis=1)
    return rew * _cmd_active(ctx)


def on_the_air(env, ctx):
    return (jnp.sum(ctx.feet_contact, axis=1) == 0).astype(jnp.float32)


def feet_stumble(env, ctx):
    sig = env.cfg.rewards.sigma_feet_stumble
    ratio = env.cfg.rewards.feet_stumble_ratio
    fxy = jnp.linalg.norm(ctx.feet_contact_force[:, :, :2], axis=2)
    fz = jnp.abs(ctx.feet_contact_force[:, :, 2])
    err = jnp.clip(fxy - ratio * fz, min=0.0)
    rew = jnp.sum(1.0 - jnp.exp(sig * err), axis=1)
    return rew


# ---------------------------------------------------------------------------
# ETH base terms (legged_robot.py:1277-1376), selectable for custom tasks
# ---------------------------------------------------------------------------


def lin_vel_z(env, ctx):
    return jnp.square(ctx.base_lin_vel[:, 2])


def ang_vel_xy(env, ctx):
    return jnp.sum(jnp.square(ctx.base_ang_vel[:, :2]), axis=1)


def orientation(env, ctx):
    return jnp.sum(jnp.square(ctx.base_projected_gravity[:, :2]), axis=1)


def torques(env, ctx):
    return jnp.sum(jnp.square(ctx.torques), axis=1)


def dof_vel(env, ctx):
    return jnp.sum(jnp.square(ctx.dof_vel), axis=1)


def dof_acc(env, ctx):
    return jnp.sum(jnp.square(ctx.dof_acc), axis=1)


def action_rate(env, ctx):
    return jnp.sum(jnp.square(ctx.last_actions - ctx.actions), axis=1)


def tracking_lin_vel(env, ctx):
    err = jnp.sum(jnp.square(ctx.commands[:, :2] - ctx.base_lin_vel[:, :2]), axis=1)
    return jnp.exp(-err / env.cfg.rewards.tracking_sigma)


def tracking_ang_vel(env, ctx):
    err = jnp.square(ctx.commands[:, 2] - ctx.base_ang_vel[:, 2])
    return jnp.exp(-err / env.cfg.rewards.tracking_sigma)


def feet_contact_forces(env, ctx):
    over = jnp.clip(
        jnp.linalg.norm(ctx.feet_contact_force, axis=-1) - env.cfg.rewards.max_contact_force,
        min=0.0,
    )
    return jnp.sum(over, axis=1)


def base_height(env, ctx):
    """legged_robot.py:1289-1292: squared distance of terrain-relative base
    height from the target."""
    return jnp.square(ctx.base_height - env.cfg.rewards.base_height_target)


def dof_pos_limits(env, ctx):
    """legged_robot.py:1317-1321: linear out-of-soft-limit excess (the soft
    scaling of `_process_dof_props`, legged_robot.py:594-615, is baked into
    ``env.dof_pos_soft_lower/upper``)."""
    under = jnp.clip(ctx.dof_pos - env.dof_pos_soft_lower, max=0.0)
    over = jnp.clip(ctx.dof_pos - env.dof_pos_soft_upper, min=0.0)
    return jnp.sum(over - under, axis=1)


def dof_vel_limits(env, ctx):
    """legged_robot.py:1323-1326: velocity excess, clipped to 1 rad/s/joint."""
    over = jnp.clip(
        jnp.abs(ctx.dof_vel) - env.dof_vel_limits * env.cfg.rewards.soft_dof_vel_limit,
        min=0.0,
        max=1.0,
    )
    return jnp.sum(over, axis=1)


def torque_limits(env, ctx):
    """legged_robot.py:1328-1330."""
    over = jnp.clip(
        jnp.abs(ctx.torques) - env.torque_limits * env.cfg.rewards.soft_torque_limit,
        min=0.0,
    )
    return jnp.sum(over, axis=1)


def limits_actions(env, ctx):
    """legged_robot_fftai.py:308-320: exp-shaped penalty on scaled actions
    outside the soft dof position limits (note the reference compares the
    scaled action directly, without the default-pose offset)."""
    scaled = ctx.actions * env.cfg.control.action_scale
    under = jnp.clip(scaled - env.dof_pos_soft_lower, max=0.0)
    over = jnp.clip(scaled - env.dof_pos_soft_upper, min=0.0)
    err = jnp.sum(jnp.square(over - under), axis=1)
    return 1.0 - jnp.exp(env.cfg.rewards.sigma_limits_actions * err)


def stumble(env, ctx):
    """ETH stumble (legged_robot.py:1354-1357): any foot whose tangential
    contact force exceeds 5x its normal force (hit a vertical surface)."""
    fxy = jnp.linalg.norm(ctx.feet_contact_force[:, :, :2], axis=2)
    fz = jnp.abs(ctx.feet_contact_force[:, :, 2])
    return jnp.any(fxy > 5.0 * fz, axis=1).astype(jnp.float32)


REWARDS = {
    "termination": termination,
    "collision": collision,
    "stand_still": stand_still,
    "cmd_diff_lin_vel_x": cmd_diff_lin_vel_x,
    "cmd_diff_lin_vel_y": cmd_diff_lin_vel_y,
    "cmd_diff_lin_vel_z": cmd_diff_lin_vel_z,
    "cmd_diff_ang_vel_roll": cmd_diff_ang_vel_roll,
    "cmd_diff_ang_vel_pitch": cmd_diff_ang_vel_pitch,
    "cmd_diff_ang_vel_yaw": cmd_diff_ang_vel_yaw,
    "cmd_diff_base_height": cmd_diff_base_height,
    "cmd_diff_base_orient": cmd_diff_base_orient,
    "cmd_diff_torso_orient": cmd_diff_torso_orient,
    "cmd_diff_forehead_orient": cmd_diff_forehead_orient,
    "action_diff": action_diff,
    "action_diff_diff": action_diff_diff,
    "action_diff_knee": action_diff_knee,
    "dof_vel_new": dof_vel_new,
    "dof_vel_new_knee": dof_vel_new_knee,
    "dof_acc_new": dof_acc_new,
    "dof_tor_new": dof_tor_new,
    "dof_tor_new_hip_roll": dof_tor_new_hip_roll,
    "pose_offset": pose_offset,
    "pose_offset_hip_yaw": pose_offset_hip_yaw,
    "limits_dof_pos": limits_dof_pos,
    "limits_dof_vel": limits_dof_vel,
    "limits_dof_tor": limits_dof_tor,
    "dof_tor_ankle_feet_lift_up": dof_tor_ankle_feet_lift_up,
    "feet_speed_xy_close_to_ground": feet_speed_xy_close_to_ground,
    "feet_speed_z_close_to_height_target": feet_speed_z_close_to_height_target,
    "feet_air_time": feet_air_time,
    "feet_air_height": feet_air_height,
    "feet_air_force": feet_air_force,
    "feet_land_time": feet_land_time,
    "on_the_air": on_the_air,
    "feet_stumble": feet_stumble,
    # ETH base terms
    "lin_vel_z": lin_vel_z,
    "ang_vel_xy": ang_vel_xy,
    "orientation": orientation,
    "torques": torques,
    "dof_vel": dof_vel,
    "dof_acc": dof_acc,
    "action_rate": action_rate,
    "tracking_lin_vel": tracking_lin_vel,
    "tracking_ang_vel": tracking_ang_vel,
    "feet_contact_forces": feet_contact_forces,
    "base_height": base_height,
    "dof_pos_limits": dof_pos_limits,
    "dof_vel_limits": dof_vel_limits,
    "torque_limits": torque_limits,
    "limits_actions": limits_actions,
    "stumble": stumble,
}
