"""Pallas kernel-wrapper equivalence.

The scalarized *math* is oracle-tested in tests/test_scalarized.py; this
file checks the Pallas layer on top: component packing, (8,128)-tile
layout, env padding, and the kernel body itself (interpret mode on CPU —
with a shortened decimation so the interpreter finishes in seconds).

The full env.step kernel-vs-scan equivalence on real hardware is exercised
by test_env_step_pallas_matches_scan_on_tpu (runs whenever a TPU backend is
present; measured max deviation 1.4e-4 on v5e, see docs/STATUS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.sim.engine import BodyRandomization, PhysicsState
from wiki_grx_gym_tpu.sim.pallas_step import PallasDecimation
from wiki_grx_gym_tpu.sim.scalarized import (
    ScalarDecimation,
    ScalarSubstep,
    lanes_to_state,
    state_to_lanes,
)


@pytest.fixture(scope="module")
def env():
    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 8
    e, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    return e


def _random_inputs(env, n, seed=0):
    rng = np.random.RandomState(seed)
    m = env.model
    quat = rng.randn(n, 4).astype(np.float32) * 0.1 + np.array([0, 0, 0, 1], np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    phys = PhysicsState(
        base_pos=jnp.asarray(
            np.concatenate(
                [rng.randn(n, 2).astype(np.float32),
                 (0.9 + 0.1 * rng.rand(n, 1)).astype(np.float32)], axis=-1
            )
        ),
        base_quat=jnp.asarray(quat),
        base_lin_vel=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        base_ang_vel=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        q=jnp.asarray(
            np.asarray(env.default_dof_pos)[None]
            + rng.randn(n, m.num_dof).astype(np.float32) * 0.2
        ),
        qd=jnp.asarray(rng.randn(n, m.num_dof).astype(np.float32)),
        anchor=jnp.asarray(rng.randn(n, m.num_points, 3).astype(np.float32) * 0.01),
    )
    actions = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 0.3)
    last_actions = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 0.3)
    motor = jnp.asarray(0.9 + 0.2 * rng.rand(n, env.num_dof).astype(np.float32))
    delay = jnp.asarray(rng.rand(n).astype(np.float32) * 2.0)
    rand = BodyRandomization(
        friction=jnp.asarray(0.5 + rng.rand(n).astype(np.float32)),
        restitution=jnp.asarray(rng.rand(n).astype(np.float32) * 0.3),
        base_mass_scale=jnp.asarray(0.9 + 0.2 * rng.rand(n).astype(np.float32)),
        base_com_offset=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.02),
    )
    return phys, actions, last_actions, motor, delay, rand


def _make_deci(env, decimation):
    sub = ScalarSubstep(env.model, env.contact_params, env.sim_dt, env.self_pairs)
    return ScalarDecimation(
        sub, decimation, env.cfg.control.control_type,
        env.cfg.control.action_scale, np.asarray(env.p_gains),
        np.asarray(env.d_gains), np.asarray(env.default_dof_pos),
        np.asarray(env.torque_limits), env.feet_bodies, env.feet_point_groups,
    )


class _FakeRef:
    """Array-backed stand-in for a pl.Ref: lets the kernel body run as plain
    eager jnp ops (the Pallas interpreter's per-op overhead makes even a
    3-substep kernel take many minutes on CPU; this isolates the same code
    path minus the pallas_call machinery, which the TPU test covers)."""

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, val):
        self.arr = self.arr.at[idx].set(val)


def test_pallas_wrapper_matches_scalar_eager(env):
    """Kernel body + component packing/unpacking (incl. 1024-env padding)
    against ScalarDecimation run directly on (N,) lanes."""
    from wiki_grx_gym_tpu.sim import pallas_step as ps

    n = 8
    deci = _make_deci(env, decimation=3)
    pall = PallasDecimation(deci, interpret=True)
    phys, actions, last_actions, motor, delay, rand = _random_inputs(env, n)

    with jax.disable_jit():
        comp, nb, n_real = pall._pack(
            phys, actions, last_actions, motor, delay, rand, None
        )
        assert nb == 1 and n_real == n
        in_ref = _FakeRef(comp[:, 0:1].reshape(pall.c_in, 1, ps._SUB, ps._LANE))
        out_ref = _FakeRef(
            jnp.zeros((pall.c_out, 1, ps._SUB, ps._LANE), jnp.float32)
        )
        pall._kernel(in_ref, out_ref)
        flat = out_ref.arr.reshape(pall.c_out, ps.ENV_BLOCK)[:, :n]

        def take(name):
            off, cnt = pall.out_off[name]
            return flat[off: off + cnt].T

        got = (
            phys.replace(
                base_pos=take("pos"), base_quat=take("quat"),
                base_lin_vel=take("lin"), base_ang_vel=take("ang"),
                q=take("q"), qd=take("qd"),
                anchor=take("anchor").reshape(n, pall.np_, 3),
            ),
            take("force_sum"),
            take("vxyz_sum").reshape(n, pall.nf, 3),
            take("vrpy_sum").reshape(n, pall.nf, 3),
            take("tau"),
            take("point_force").reshape(n, pall.np_, 3),
        )

        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
        )
        want_lanes, acc = deci.run(
            lanes,
            [actions[..., i] for i in range(env.num_dof)],
            [last_actions[..., i] for i in range(env.num_dof)],
            [motor[..., i] for i in range(env.num_dof)],
            delay,
        )
    want_phys = lanes_to_state(want_lanes, PhysicsState)

    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel", "q", "qd", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(got[0], name)), np.asarray(getattr(want_phys, name)),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(jnp.stack(acc["force_sum"], axis=-1)),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got[4]), np.asarray(jnp.stack(acc["tau"], axis=-1)),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got[5]),
        np.asarray(jnp.stack([jnp.stack(p, axis=-1) for p in acc["point_force"]], axis=-2)),
        rtol=1e-5, atol=1e-4,
    )


def test_pallas_auto_gating(env):
    # auto on CPU -> scan backend
    assert env._pallas_mode() is None
    # heightfield terrain uses the local-plane kernel path (per-point ground
    # planes resampled per policy step); forcing the kernel on must build it
    cfg2, _ = task_registry.get_cfgs("GR1T1")
    cfg2.env.num_envs = 4
    cfg2.terrain.mesh_type = "heightfield"
    cfg2.sim.use_pallas = "interpret"
    env2, _ = task_registry.make_env("GR1T1", env_cfg=cfg2)
    assert env2._pallas_mode() == "interpret"
    assert env2._pallas_decimation.deci.sub.terrain_mode == "local_plane"


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs a TPU")
def test_env_step_pallas_matches_scan_on_tpu():
    """Compiled Mosaic kernel vs engine scan through the full env.step."""
    n = 2048

    def build(use_pallas):
        env_cfg, _ = task_registry.get_cfgs("GR1T1")
        env_cfg.env.num_envs = n
        env_cfg.sim.use_pallas = use_pallas
        e, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
        return e

    env_scan, env_pl = build(False), build(True)
    s0 = env_scan.init_state(jax.random.PRNGKey(0))
    s1 = env_pl.init_state(jax.random.PRNGKey(0))
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (n, env_scan.num_actions))
    s0, o0 = env_scan.step_jit(s0, actions)
    s1, o1 = env_pl.step_jit(s1, actions)
    np.testing.assert_allclose(np.asarray(o1.obs), np.asarray(o0.obs), atol=5e-4)
    np.testing.assert_allclose(np.asarray(o1.rew), np.asarray(o0.rew), atol=5e-4)


def test_pallas_post_fk_outputs_match_engine_fk(env):
    """The kernel's folded final-state FK (post_quat/post_rel of
    env.post_fk_bodies) must equal forward_kinematics on the final physics
    state — the quantity legged_env.step otherwise recomputes post-physics."""
    from wiki_grx_gym_tpu.sim import pallas_step as ps
    from wiki_grx_gym_tpu.sim.kinematics import forward_kinematics

    n = 8
    deci = _make_deci(env, decimation=3)
    deci.post_bodies = tuple(env.post_fk_bodies)
    pall = PallasDecimation(deci, interpret=True)
    assert pall.npost == len(env.post_fk_bodies) > 0
    phys, actions, last_actions, motor, delay, rand = _random_inputs(env, n)

    with jax.disable_jit():
        comp, nb, n_real = pall._pack(
            phys, actions, last_actions, motor, delay, rand, None
        )
        in_ref = _FakeRef(comp[:, 0:1].reshape(pall.c_in, 1, ps._SUB, ps._LANE))
        out_ref = _FakeRef(jnp.zeros((pall.c_out, 1, ps._SUB, ps._LANE), jnp.float32))
        pall._kernel(in_ref, out_ref)
        flat = out_ref.arr.reshape(pall.c_out, ps.ENV_BLOCK)[:, :n]

        def take(name):
            off, cnt = pall.out_off[name]
            return flat[off: off + cnt].T

        final = phys.replace(
            base_pos=take("pos"), base_quat=take("quat"),
            base_lin_vel=take("lin"), base_ang_vel=take("ang"),
            q=take("q"), qd=take("qd"),
        )
        post_quat = take("post_quat").reshape(n, pall.npost, 4)
        post_rel = take("post_rel").reshape(n, pall.npost, 3)

    kin = jax.vmap(forward_kinematics, in_axes=(None, 0, 0, 0, 0, 0))(
        env.model, final.base_quat, final.base_ang_vel, final.base_lin_vel,
        final.q, final.qd,
    )
    pb = jnp.asarray(env.post_fk_bodies, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(post_quat), np.asarray(kin.quat[:, pb]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(post_rel), np.asarray(kin.pos_rel[:, pb]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_fold_step_matches_scan():
    """Full env.step parity of the IN-KERNEL post-physics fold (plane
    terrain: rewards/termination/trackers computed by envs/post_lanes inside
    the kernel program) against the XLA post path — via the "lanes" backend,
    which runs the exact kernel program as plain XLA ops. Multi-step so the
    feet trackers, resets and episode sums feed back."""
    n = 8

    def build(use_pallas):
        env_cfg, _ = task_registry.get_cfgs("GR1T1")
        env_cfg.env.num_envs = n
        env_cfg.control.decimation = 2
        env_cfg.sim.use_pallas = use_pallas
        e, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
        return e

    env_scan, env_fold = build(False), build("lanes")
    assert env_fold._post_fold and env_fold._pallas_decimation.post is not None
    assert not env_scan._post_fold

    # eager: the unrolled lanes program is ~7k ops/substep — jitting it on
    # XLA-CPU takes many minutes (the _FakeRef tests avoid pallas_call for
    # the same reason); eager parity at a shortened decimation covers the
    # math, the TPU test covers the compiled kernel
    with jax.disable_jit():
        s0 = env_scan.init_state(jax.random.PRNGKey(0))
        s1 = env_fold.init_state(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        for t in range(4):
            key, k = jax.random.split(key)
            actions = 0.3 * jax.random.normal(k, (n, env_scan.num_actions))
            s0, o0 = env_scan.step(s0, actions)
            s1, o1 = env_fold.step(s1, actions)
        np.testing.assert_allclose(
            np.asarray(o1.rew), np.asarray(o0.rew), rtol=1e-4, atol=1e-5,
            err_msg=f"rew step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(o1.reset), np.asarray(o0.reset), err_msg=f"reset step {t}"
        )
        np.testing.assert_allclose(
            np.asarray(o1.obs), np.asarray(o0.obs), rtol=1e-4, atol=1e-5,
            err_msg=f"obs step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(o1.pri_obs), np.asarray(o0.pri_obs), rtol=1e-4, atol=1e-5,
            err_msg=f"pri_obs step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(s1.feet_air_time), np.asarray(s0.feet_air_time),
            rtol=1e-5, atol=1e-6, err_msg=f"feet_air_time step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(s1.episode_sums), np.asarray(s0.episode_sums),
            rtol=1e-4, atol=1e-5, err_msg=f"episode_sums step {t}",
        )


def test_fold_nan_env_emits_zero_reward():
    """A numerically exploded env must emit rew=0.0 through the in-kernel
    fold, exactly like the XLA path's `jnp.where(bad, 0.0, ...)` guard
    (legged_env.py:948). Regression test for the NaN*0=NaN gate bug: a
    multiplicative `term * ok` gate lets NaN rewards through, which then
    poison GAE and the whole PPO update."""
    n = 8
    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = n
    env_cfg.control.decimation = 2
    env_cfg.sim.use_pallas = "lanes"
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    assert env._post_fold

    with jax.disable_jit():
        s = env.init_state(jax.random.PRNGKey(0))
        # blow up env 3: NaN joint velocities + base position
        qd = np.asarray(s.physics.qd).copy()
        qd[3] = np.nan
        pos = np.asarray(s.physics.base_pos).copy()
        pos[3] = np.nan
        s = s.replace(
            physics=s.physics.replace(qd=jnp.asarray(qd), base_pos=jnp.asarray(pos))
        )
        actions = jnp.zeros((n, env.num_actions))
        s1, out = env.step(s, actions)

    rew = np.asarray(out.rew)
    assert np.all(np.isfinite(rew)), f"non-finite rewards leaked: {rew}"
    assert rew[3] == 0.0, f"NaN env should earn exactly 0 reward, got {rew[3]}"
    # the exploded env must also be terminated (safety reset)
    assert bool(np.asarray(out.reset)[3])
    # and healthy envs keep earning normally
    assert np.any(rew[np.arange(n) != 3] != 0.0)


@pytest.mark.parametrize("kernel_loop", ["unroll", "fori"])
def test_fold_kernel_packing_matches_lanes(kernel_loop):
    """The post stage through the real kernel body + (8,128) packing
    (extra-input lanes, post-output lanes) against the lanes backend —
    covers the schema/layout plumbing the full-step test bypasses.
    Parametrized over the substep loop modes (cfg.sim.kernel_loop)."""
    from wiki_grx_gym_tpu.sim import pallas_step as ps

    n = 8
    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = n
    env_cfg.control.decimation = 2
    env_cfg.sim.use_pallas = "lanes"
    env_cfg.sim.kernel_loop = kernel_loop
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    pall = env._pallas_decimation
    assert pall.post is not None and pall.lanes
    assert pall.deci.loop_mode == kernel_loop

    rng = np.random.RandomState(3)
    phys, actions, last_actions, motor, delay, rand = _random_inputs(env, n)
    last_qd = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32))
    extra = {
        "commands": jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        "last_last_actions": jnp.asarray(
            rng.randn(n, env.num_dof).astype(np.float32) * 0.3
        ),
        "feet_air_time": jnp.asarray(rng.rand(n, env.num_feet).astype(np.float32)),
        "feet_land_time": jnp.asarray(rng.rand(n, env.num_feet).astype(np.float32)),
        "feet_contact_last": jnp.asarray(
            (rng.rand(n, env.num_feet) > 0.5).astype(np.float32)
        ),
    }

    with jax.disable_jit():
        want = pall._call_lanes(
            phys, actions, last_actions, motor, delay, rand, last_qd, None, extra
        )
        comp, nb, n_real = pall._pack(
            phys, actions, last_actions, motor, delay, rand, last_qd, None, extra
        )
        assert nb == 1 and n_real == n
        in_ref = _FakeRef(comp[:, 0:1].reshape(pall.c_in, 1, ps._SUB, ps._LANE))
        out_ref = _FakeRef(jnp.zeros((pall.c_out, 1, ps._SUB, ps._LANE), jnp.float32))
        pall._kernel(in_ref, out_ref)
        flat = out_ref.arr.reshape(pall.c_out, ps.ENV_BLOCK)[:, :n]

    def take(name):
        off, cnt = pall.out_off[name]
        return flat[off: off + cnt].T

    want_post = want[-1]
    for name, _ in pall.post_out:
        np.testing.assert_allclose(
            np.asarray(take(name)), np.asarray(want_post[name]),
            rtol=1e-5, atol=1e-5, err_msg=name,
        )


def test_pallas_trimesh_env_routes_to_walls_kernel():
    """trimesh mesh_type must route the kernel to local_plane_walls (9
    ground lanes per point)."""
    cfg, _ = task_registry.get_cfgs("GR1T1")
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.curriculum = True
    cfg.terrain.num_rows = 3
    cfg.terrain.num_cols = 4
    cfg.terrain.border_size = 5
    cfg.sim.use_pallas = "interpret"
    env_p, _ = task_registry.make_env("GR1T1", env_cfg=cfg)
    assert env_p.riser_mode
    assert env_p._pallas_decimation.deci.sub.terrain_mode == "local_plane_walls"
    assert env_p._pallas_decimation.plane_lanes == 9


def test_pallas_packing_local_plane_walls(env):
    """9-lane ground channels (trimesh walls mode) through the kernel
    packing: plane lane layout, per-point unpack, and the point_pos outputs
    — against ScalarDecimation run directly on lanes. (The wall-force math
    itself is oracle-tested vs the engine in tests/test_scalarized.py.)"""
    from wiki_grx_gym_tpu.sim import pallas_step as ps

    n = 8
    sub = ScalarSubstep(
        env.model, env.contact_params, env.sim_dt, env.self_pairs,
        terrain_mode="local_plane_walls",
    )
    deci = ScalarDecimation(
        sub, 2, env.cfg.control.control_type,
        env.cfg.control.action_scale, np.asarray(env.p_gains),
        np.asarray(env.d_gains), np.asarray(env.default_dof_pos),
        np.asarray(env.torque_limits), env.feet_bodies, env.feet_point_groups,
    )
    pall = PallasDecimation(deci, interpret=True)
    assert pall.plane_lanes == 9
    phys, actions, last_actions, motor, delay, rand = _random_inputs(env, n)
    # flat tread + an up-riser wall just ahead of the scattered robots
    chan = np.asarray([0.0, 0.0, 0.0, 0.25, 0.2, 1.0, 0.0, 0.0, 0.0], np.float32)
    plane = jnp.broadcast_to(jnp.asarray(chan), (n, pall.np_, 9))

    with jax.disable_jit():
        comp, nb, n_real = pall._pack(
            phys, actions, last_actions, motor, delay, rand, None, plane=plane
        )
        assert nb == 1 and n_real == n
        in_ref = _FakeRef(comp[:, 0:1].reshape(pall.c_in, 1, ps._SUB, ps._LANE))
        out_ref = _FakeRef(
            jnp.zeros((pall.c_out, 1, ps._SUB, ps._LANE), jnp.float32)
        )
        pall._kernel(in_ref, out_ref)
        flat = out_ref.arr.reshape(pall.c_out, ps.ENV_BLOCK)[:, :n]

        def take(name):
            off, cnt = pall.out_off[name]
            return flat[off: off + cnt].T

        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
            plane=[[plane[:, p, k] for k in range(9)] for p in range(pall.np_)],
        )
        want_lanes, acc = deci.run(
            lanes,
            [actions[..., i] for i in range(env.num_dof)],
            [last_actions[..., i] for i in range(env.num_dof)],
            [motor[..., i] for i in range(env.num_dof)],
            delay,
        )
    want_phys = lanes_to_state(want_lanes, PhysicsState)
    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel", "q", "qd", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(want_phys, name)),
            np.asarray(
                dict(
                    base_pos=take("pos"), base_quat=take("quat"),
                    base_lin_vel=take("lin"), base_ang_vel=take("ang"),
                    q=take("q"), qd=take("qd"),
                    anchor=take("anchor").reshape(n, pall.np_, 3),
                )[name]
            ),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    want_pp = np.asarray(
        jnp.stack([jnp.stack(p, axis=-1) for p in acc["point_pos"]], axis=-2)
    )
    np.testing.assert_allclose(
        np.asarray(take("point_pos").reshape(n, pall.np_, 3)), want_pp,
        rtol=1e-5, atol=1e-5,
    )
