"""Mirror-symmetry loss tests: reflection operators derived from the robot
model, and the PPO wiring (VERDICT round-1 item 7; reference scaffolding
`rsl_rl/runners/on_policy_runner.py:161-167`, `ppo.py:96,323`,
`utils.py:207-228`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.learn.symmetry import (
    build_mirror_spec,
    make_mirror_loss,
    mirror_actions,
    mirror_dof_map,
    mirror_obs,
)


@pytest.fixture(scope="module")
def env():
    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 4
    e, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    return e


def test_dof_map_pairs_and_signs(env):
    perm, sign = mirror_dof_map(env.model)
    names = list(env.model.dof_names)
    # involution pairing left <-> right
    for i, nm in enumerate(names):
        j = perm[i]
        assert perm[j] == i
        if "left" in nm:
            assert names[j] == nm.replace("left", "right")
    # humanoid convention falls out of the axis algebra: pitch joints keep
    # sign, roll/yaw joints flip
    for i, nm in enumerate(names):
        if "pitch" in nm:
            assert sign[i] == 1.0, nm
        else:
            assert sign[i] == -1.0, nm


def test_mirror_is_involution(env):
    spec = build_mirror_spec(env)
    rng = np.random.RandomState(0)
    obs = jnp.asarray(rng.randn(7, env.obs_dim).astype(np.float32))
    act = jnp.asarray(rng.randn(7, env.num_dof).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mirror_obs(spec, mirror_obs(spec, obs))), np.asarray(obs), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mirror_actions(spec, mirror_actions(spec, act))), np.asarray(act), atol=1e-6
    )


def test_mirror_obs_blocks(env):
    """Command/ang-vel/gravity blocks follow the sagittal reflection."""
    spec = build_mirror_spec(env)
    obs = np.zeros((1, env.obs_dim), np.float32)
    obs[0, :9] = [0.5, 0.2, 0.3,   # cmd vx, vy, wyaw
                  0.1, 0.4, 0.7,   # base ang vel (roll, pitch, yaw rates)
                  0.0, 0.2, -0.9]  # projected gravity
    m = np.asarray(mirror_obs(spec, jnp.asarray(obs)))[0]
    np.testing.assert_allclose(m[:9], [0.5, -0.2, -0.3, -0.1, 0.4, -0.7, 0.0, -0.2, -0.9],
                               atol=1e-6)


def test_loss_zero_for_symmetric_policy_positive_otherwise(env):
    _, train_cfg = task_registry.get_cfgs("GR1T1")
    from wiki_grx_gym_tpu.learn.networks import ActorCritic

    net = ActorCritic(env.obs_dim, env.pri_obs_dim, env.num_dof, train_cfg.policy)
    loss_fn = make_mirror_loss(env, net, coef=1.0)
    rng = np.random.RandomState(1)
    mb = {"obs": jnp.asarray(rng.randn(16, env.obs_dim).astype(np.float32))}

    # a zero-output policy is trivially mirror-equivariant
    params = net.init(jax.random.PRNGKey(0))
    (w, b) = params.actor[-1]
    sym_params = params.replace(
        actor=params.actor[:-1] + [(jnp.zeros_like(w), jnp.zeros_like(b))]
    )
    assert float(loss_fn(sym_params, mb)) == pytest.approx(0.0, abs=1e-10)

    # a random policy is not
    assert float(loss_fn(params, mb)) > 1e-6


@pytest.mark.slow
def test_training_with_symmetry_coef_runs(env):
    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 8
    train_cfg.runner.num_steps_per_env = 4
    train_cfg.algorithm.num_mini_batches = 2
    train_cfg.algorithm.num_learning_epochs = 1
    train_cfg.algorithm.symmetry_coef = 0.1
    e, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(e, train_cfg, log_dir=None)
    assert runner.alg.extra_loss_fn is not None
    state = runner.learn(1)
    assert np.isfinite(float(jax.device_get(state.ppo.learning_rate)))
