"""Formula tests for the dormant base-env API: the six zero-scale ETH/FFTAI
reward terms and the 'V' (velocity-PD) control mode, each checked against a
literal numpy transcription of the reference math
(`legged_robot.py:697-707,1277-1376`, `legged_robot_fftai.py:308-320`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.envs.rewards import REWARDS, RewardContext


@pytest.fixture(scope="module")
def env():
    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 4
    e, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    return e


def _ctx(env, rng, **over):
    """RewardContext filled with random finite values of the right shapes."""
    n, d, f = 4, env.num_dof, env.num_feet
    fields = {
        "commands": (n, 3), "base_lin_vel": (n, 3), "base_ang_vel": (n, 3),
        "base_projected_gravity": (n, 3), "base_heights_offset": (n,),
        "base_height": (n,),
        "torso_projected_gravity": (n, 3), "forehead_projected_gravity": (n, 3),
        "dof_pos": (n, d), "dof_vel": (n, d), "dof_acc": (n, d),
        "torques": (n, d), "actions": (n, d), "last_actions": (n, d),
        "last_last_actions": (n, d), "feet_air_time": (n, f),
        "feet_land_time": (n, f), "feet_height": (n, f),
        "feet_contact_force": (n, f, 3), "avg_feet_contact_force": (n, f),
        "avg_feet_speed_xyz": (n, f, 3), "penalized_contact_count": (n,),
    }
    vals = {k: jnp.asarray(rng.randn(*shape).astype(np.float32)) for k, shape in fields.items()}
    vals["feet_contact"] = jnp.asarray(rng.rand(n, f) < 0.5)
    vals["feet_first_contact"] = jnp.asarray((rng.rand(n, f) < 0.5).astype(np.float32))
    vals["reset_buf"] = jnp.asarray(rng.rand(n) < 0.3)
    vals["time_out_buf"] = jnp.asarray(rng.rand(n) < 0.1)
    vals.update(over)
    return RewardContext(**vals)


def test_base_height(env):
    rng = np.random.RandomState(0)
    ctx = _ctx(env, rng)
    got = np.asarray(REWARDS["base_height"](env, ctx))
    want = np.square(np.asarray(ctx.base_height) - env.cfg.rewards.base_height_target)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dof_pos_limits(env):
    rng = np.random.RandomState(1)
    ctx = _ctx(env, rng, dof_pos=jnp.asarray(rng.randn(4, env.num_dof).astype(np.float32) * 3))
    got = np.asarray(REWARDS["dof_pos_limits"](env, ctx))
    q = np.asarray(ctx.dof_pos)
    lo = np.asarray(env.dof_pos_soft_lower)
    hi = np.asarray(env.dof_pos_soft_upper)
    out = -np.clip(q - lo, None, 0.0) + np.clip(q - hi, 0.0, None)
    np.testing.assert_allclose(got, out.sum(1), rtol=1e-5)
    # inside the soft limits the penalty is exactly zero
    ctx0 = _ctx(env, rng, dof_pos=jnp.asarray((lo + hi)[None, :] / 2 * np.ones((4, 1), np.float32)))
    assert np.all(np.asarray(REWARDS["dof_pos_limits"](env, ctx0)) == 0.0)


def test_dof_vel_limits(env):
    rng = np.random.RandomState(2)
    ctx = _ctx(env, rng, dof_vel=jnp.asarray(rng.randn(4, env.num_dof).astype(np.float32) * 20))
    got = np.asarray(REWARDS["dof_vel_limits"](env, ctx))
    want = np.clip(
        np.abs(np.asarray(ctx.dof_vel))
        - np.asarray(env.dof_vel_limits) * env.cfg.rewards.soft_dof_vel_limit,
        0.0, 1.0,   # clipped to 1 rad/s per joint (legged_robot.py:1325)
    ).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_torque_limits(env):
    rng = np.random.RandomState(3)
    ctx = _ctx(env, rng, torques=jnp.asarray(rng.randn(4, env.num_dof).astype(np.float32) * 200))
    got = np.asarray(REWARDS["torque_limits"](env, ctx))
    want = np.clip(
        np.abs(np.asarray(ctx.torques))
        - np.asarray(env.torque_limits) * env.cfg.rewards.soft_torque_limit,
        0.0, None,
    ).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_limits_actions(env):
    rng = np.random.RandomState(4)
    ctx = _ctx(env, rng, actions=jnp.asarray(rng.randn(4, env.num_dof).astype(np.float32) * 10))
    got = np.asarray(REWARDS["limits_actions"](env, ctx))
    scaled = np.asarray(ctx.actions) * env.cfg.control.action_scale
    lo = np.asarray(env.dof_pos_soft_lower)
    hi = np.asarray(env.dof_pos_soft_upper)
    out = -np.clip(scaled - lo, None, 0.0) + np.clip(scaled - hi, 0.0, None)
    err = np.square(out).sum(1)
    want = 1.0 - np.exp(env.cfg.rewards.sigma_limits_actions * err)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # with negative sigma the raw term lies in [0, 1); the config scale is
    # what makes it a penalty
    assert np.all((want >= 0.0) & (want <= 1.0))


def test_eth_stumble(env):
    rng = np.random.RandomState(5)
    # one env with a clearly tangential force, one with pure normal force
    f = np.zeros((4, env.num_feet, 3), np.float32)
    f[0, 0] = [10.0, 0.0, 1.0]   # tangential >> 5*normal -> stumble
    f[1, 0] = [0.1, 0.0, 50.0]   # normal dominated -> no stumble
    ctx = _ctx(env, rng, feet_contact_force=jnp.asarray(f))
    got = np.asarray(REWARDS["stumble"](env, ctx))
    np.testing.assert_array_equal(got[:2], [1.0, 0.0])


def test_all_registered_rewards_finite(env):
    """Every registry entry evaluates finite on a random context — the
    'non-GRx config can turn any term on' completeness contract."""
    rng = np.random.RandomState(6)
    ctx = _ctx(env, rng)
    for name, fn in REWARDS.items():
        r = np.asarray(fn(env, ctx))
        assert r.shape == (4,), name
        assert np.all(np.isfinite(r)), name


def test_v_mode_torques(env):
    """V control mode (legged_robot.py:697-701): velocity PD with
    finite-difference damping over sim dt."""
    import copy

    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 4
    env_cfg.control.control_type = "V"
    venv, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)

    rng = np.random.RandomState(7)
    d = venv.num_dof
    q = rng.randn(4, d).astype(np.float32) * 0.1
    qd = rng.randn(4, d).astype(np.float32)
    last_qd = rng.randn(4, d).astype(np.float32)
    actions = rng.randn(4, d).astype(np.float32)
    ms = np.ones((4, d), np.float32)

    got = np.asarray(
        venv._pd_torques(jnp.asarray(q), jnp.asarray(qd), jnp.asarray(actions),
                         jnp.asarray(ms), last_qd=jnp.asarray(last_qd))
    )
    scaled = actions * venv.cfg.control.action_scale
    p = np.asarray(venv.p_gains)
    dg = np.asarray(venv.d_gains)
    want = p * (scaled - qd) - dg * (qd - last_qd) / venv.sim_dt
    want = np.clip(want, -np.asarray(venv.torque_limits), np.asarray(venv.torque_limits))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # and a full step runs finite in V mode
    state = venv.init_state(jax.random.PRNGKey(0))
    state, out = jax.jit(venv.step)(state, jnp.zeros((4, d)))
    assert np.all(np.isfinite(np.asarray(out.obs)))
