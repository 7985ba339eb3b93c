"""Golden equivalence: the component-form substep program
(`sim/scalarized.py`) against the batched engine (`sim/engine.physics_step`)
— the correctness oracle contract for the Pallas hot path (VERDICT round-1
item 1: "kernel vs XLA step to 1e-5")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.envs import task_registry
from wiki_grx_gym_tpu.sim.engine import BodyRandomization, PhysicsState, physics_step, flat_ground
from wiki_grx_gym_tpu.sim.scalarized import (
    ScalarDecimation,
    ScalarSubstep,
    lanes_to_state,
    state_to_lanes,
)


@pytest.fixture(scope="module")
def env():
    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 16
    e, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    return e


def random_states(env, n, seed=0):
    """Plausible random physics states: near default pose, touching ground."""
    rng = np.random.RandomState(seed)
    m = env.model
    quat = rng.randn(n, 4).astype(np.float32) * 0.1 + np.array([0, 0, 0, 1], np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    pos = np.concatenate(
        [rng.randn(n, 2).astype(np.float32) * 0.5,
         (0.9 + 0.1 * rng.rand(n, 1)).astype(np.float32)], axis=-1
    )
    return PhysicsState(
        base_pos=jnp.asarray(pos),
        base_quat=jnp.asarray(quat),
        base_lin_vel=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        base_ang_vel=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        q=jnp.asarray(
            np.asarray(env.default_dof_pos)[None]
            + rng.randn(n, m.num_dof).astype(np.float32) * 0.2
        ),
        qd=jnp.asarray(rng.randn(n, m.num_dof).astype(np.float32) * 2),
        anchor=jnp.asarray(rng.randn(n, m.num_points, 3).astype(np.float32) * 0.01),
    )


def engine_substep(env, phys, tau, rand, damp=None):
    step = jax.vmap(
        lambda p, t, r, d: physics_step(
            env.model, p, t, env.height_fn, env.contact_params, r,
            env.sim_dt, self_pairs=env.self_pairs, joint_damping=d,
        )
    )
    return step(phys, tau, rand, damp)


def test_substep_matches_engine(env):
    n = 16
    phys = random_states(env, n)
    rng = np.random.RandomState(1)
    tau = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 30)
    rand = BodyRandomization(
        friction=jnp.asarray(0.5 + rng.rand(n).astype(np.float32)),
        restitution=jnp.asarray(rng.rand(n).astype(np.float32) * 0.5),
        base_mass_scale=jnp.asarray(0.9 + 0.2 * rng.rand(n).astype(np.float32)),
        base_com_offset=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.02),
    )

    want_state, want_out = jax.jit(lambda p, t, r: engine_substep(env, p, t, r))(
        phys, tau, rand
    )

    sub = ScalarSubstep(env.model, env.contact_params, env.sim_dt, env.self_pairs)

    def scalar_step(phys, tau, rand):
        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction,
            restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
        )
        new_lanes, aux = sub.substep(lanes, [tau[..., i] for i in range(env.num_dof)])
        force = jnp.stack(
            [jnp.stack(f, axis=-1) for f in aux["point_force"]], axis=-2
        )
        return lanes_to_state(new_lanes, PhysicsState), force

    # eager: XLA-CPU takes minutes to compile the ~7k-op scalar graph, while
    # op-by-op dispatch runs it in seconds with identical numerics
    with jax.disable_jit():
        got_state, got_force = scalar_step(phys, tau, rand)

    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel", "q", "qd"):
        np.testing.assert_allclose(
            np.asarray(getattr(got_state, name)),
            np.asarray(getattr(want_state, name)),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(got_state.anchor), np.asarray(want_state.anchor),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_force), np.asarray(want_out.point_force), rtol=2e-3, atol=5e-3
    )


@pytest.mark.slow
def test_multi_substep_trajectory_matches_engine(env):
    """10 chained substeps (one policy step of physics) stay within
    tolerance — catches compounding formulation drift."""
    n = 8
    phys = random_states(env, n, seed=2)
    rand = BodyRandomization(
        friction=jnp.ones(n), restitution=jnp.zeros(n),
        base_mass_scale=jnp.ones(n), base_com_offset=jnp.zeros((n, 3)),
    )
    tau = jnp.zeros((n, env.num_dof))

    sub = ScalarSubstep(env.model, env.contact_params, env.sim_dt, env.self_pairs)

    def engine_roll(phys):
        # fori_loop keeps the compiled graph single-substep-sized (an
        # unrolled python loop takes XLA-CPU many minutes to compile)
        return jax.lax.fori_loop(
            0, 10, lambda _, p: engine_substep(env, p, tau, rand)[0], phys
        )

    def scalar_roll(phys):
        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
        )
        taus = [tau[..., i] for i in range(env.num_dof)]
        for _ in range(10):
            lanes, _ = sub.substep(lanes, taus)
        return lanes_to_state(lanes, PhysicsState)

    want = jax.jit(engine_roll)(phys)
    with jax.disable_jit():
        got = scalar_roll(phys)
    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel", "q", "qd"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-3, atol=1e-4, err_msg=name,
        )


@pytest.mark.slow
def test_decimation_matches_env_scan(env):
    """The full ScalarDecimation loop (PD + 10 substeps + foot accumulators)
    against the env's lax.scan hot loop, via a full env.step comparison on
    the physics-relevant outputs."""
    n = 8
    phys = random_states(env, n, seed=3)
    rng = np.random.RandomState(4)
    actions = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 0.3)
    last_actions = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 0.3)
    motor = jnp.asarray(0.9 + 0.2 * rng.rand(n, env.num_dof).astype(np.float32))
    delay = jnp.asarray(rng.rand(n).astype(np.float32) * 8.0)
    rand = BodyRandomization(
        friction=jnp.ones(n), restitution=jnp.zeros(n),
        base_mass_scale=jnp.ones(n), base_com_offset=jnp.zeros((n, 3)),
    )

    # env-style scan (transcription of legged_env.step:453-489)
    def env_roll(phys):
        def substep(carry, i):
            ph, accf, accv, accr, _ = carry
            use_act = jnp.where(i < delay[:, None], last_actions, actions)
            tau = env._pd_torques(ph.q, ph.qd, use_act, motor)
            damp = jnp.asarray(env._implicit_damping_const) * motor
            ph, out = engine_substep(env, ph, tau, rand, damp)
            foot_force = env._group_forces(out.point_force, env.feet_point_groups)
            accf = accf + jnp.linalg.norm(foot_force, axis=-1)
            fb = jnp.asarray(env.feet_bodies, jnp.int32)
            tw = out.kin.twist[:, fb]
            rel = out.kin.pos_rel[:, fb]
            v_lin = tw[..., 3:] + jnp.cross(tw[..., :3], rel)
            accv = accv + jnp.abs(v_lin)
            accr = accr + jnp.abs(tw[..., :3])
            return (ph, accf, accv, accr, (tau, out.point_force)), None

        f = env.num_feet
        init = (
            phys, jnp.zeros((n, f)), jnp.zeros((n, f, 3)), jnp.zeros((n, f, 3)),
            (jnp.zeros((n, env.num_dof)), jnp.zeros((n, env.model.num_points, 3))),
        )
        (ph, accf, accv, accr, (tau, pf)), _ = jax.lax.scan(
            substep, init, jnp.arange(env.decimation, dtype=jnp.float32)
        )
        return ph, accf, accv, accr, tau, pf

    sub = ScalarSubstep(env.model, env.contact_params, env.sim_dt, env.self_pairs)
    deci = ScalarDecimation(
        sub, env.decimation, env.cfg.control.control_type,
        env.cfg.control.action_scale, np.asarray(env.p_gains),
        np.asarray(env.d_gains), np.asarray(env.default_dof_pos),
        np.asarray(env.torque_limits), env.feet_bodies, env.feet_point_groups,
        damping_coeff=env._implicit_damping_const,
    )

    def scalar_roll(phys):
        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
        )
        lanes, acc = deci.run(
            lanes,
            [actions[..., i] for i in range(env.num_dof)],
            [last_actions[..., i] for i in range(env.num_dof)],
            [motor[..., i] for i in range(env.num_dof)],
            delay,
        )
        ph = lanes_to_state(lanes, PhysicsState)
        accf = jnp.stack(acc["force_sum"], axis=-1)
        accv = jnp.stack([jnp.stack(v, axis=-1) for v in acc["vxyz_sum"]], axis=-2)
        accr = jnp.stack([jnp.stack(v, axis=-1) for v in acc["vrpy_sum"]], axis=-2)
        tau = jnp.stack(acc["tau"], axis=-1)
        pf = jnp.stack([jnp.stack(p, axis=-1) for p in acc["point_force"]], axis=-2)
        return ph, accf, accv, accr, tau, pf

    want = jax.jit(env_roll)(phys)
    with jax.disable_jit():
        got = scalar_roll(phys)
    names = ["state", "force_sum", "vxyz_sum", "vrpy_sum", "tau", "point_force"]
    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel", "q", "qd"):
        np.testing.assert_allclose(
            np.asarray(getattr(got[0], name)), np.asarray(getattr(want[0], name)),
            rtol=1e-3, atol=1e-4, err_msg=name,
        )
    for k in range(1, 6):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=2e-3, atol=2e-2,
            err_msg=names[k],
        )


@pytest.mark.slow
def test_local_plane_contact_matches_engine_on_slope(env):
    """terrain_mode="local_plane" vs the engine evaluating the true height
    function: on a planar slope the per-point local planes ARE the terrain,
    so a multi-substep trajectory must match to float tolerance (the
    general-normal contact math is exercised end-to-end: inclined normals,
    tangent-plane anchors, cone projection).

    Two substeps: the second exercises anchor continuity across steps.
    The scalar path runs eagerly (disable_jit) like the other oracle tests
    here — jitting it hands XLA-CPU a multi-thousand-op unrolled scalar
    graph whose compile exceeded 15 min per substep count tried."""
    n = 8
    gx, gy = 0.18, -0.11   # ~12 deg slope
    slope_fn = lambda x, y: gx * x + gy * y

    phys = random_states(env, n, seed=7)
    # raise bases so feet straddle the slope surface near their xy
    h_at = gx * phys.base_pos[:, 0] + gy * phys.base_pos[:, 1]
    phys = phys.replace(base_pos=phys.base_pos.at[:, 2].add(h_at))
    rng = np.random.RandomState(8)
    tau = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 5.0)
    rand = BodyRandomization(
        friction=jnp.ones(n), restitution=jnp.zeros(n),
        base_mass_scale=jnp.ones(n), base_com_offset=jnp.zeros((n, 3)),
    )

    def eng_roll(phys):
        step = jax.vmap(
            lambda p, t, r: physics_step(
                env.model, p, t, slope_fn, env.contact_params, r,
                env.sim_dt, self_pairs=env.self_pairs,
            )
        )
        for _ in range(2):
            phys, _ = step(phys, tau, rand)
        return phys

    sub = ScalarSubstep(
        env.model, env.contact_params, env.sim_dt, env.self_pairs,
        terrain_mode="local_plane",
    )
    taus = [tau[..., i] for i in range(env.num_dof)]
    plane = [[jnp.zeros(n), jnp.full((n,), gx), jnp.full((n,), gy)]
             for _ in range(env.model.num_points)]

    def scalar_roll(phys):
        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
            plane=plane,
        )
        for _ in range(2):
            lanes, _ = sub.substep(lanes, taus)
        return lanes_to_state(lanes, PhysicsState)

    want = jax.jit(eng_roll)(phys)
    with jax.disable_jit():   # same reason as test_substep_matches_engine
        got = scalar_roll(phys)
    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel", "q", "qd", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )


def test_local_plane_walls_contact_matches_engine_on_step(env):
    """terrain_mode="local_plane_walls" vs the engine with a constant
    riser-channel ground query: flat tread at z=0 plus an up-riser wall just
    ahead of the robots (+x). Robots are given forward velocity so feet
    press the face — wall penalty, tread suppression and cone friction are
    exercised end-to-end and must match to float tolerance."""
    n = 8
    wall_x, wall_top = 0.22, 0.2
    np_ = env.model.num_points

    phys = random_states(env, n, seed=11)
    # aim everything at the wall
    phys = phys.replace(
        base_pos=phys.base_pos.at[:, 0].set(0.0),
        base_lin_vel=phys.base_lin_vel.at[:, 0].set(2.0),
    )
    rng = np.random.RandomState(12)
    tau = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 5.0)
    rand = BodyRandomization(
        friction=jnp.ones(n), restitution=jnp.zeros(n),
        base_mass_scale=jnp.ones(n), base_com_offset=jnp.zeros((n, 3)),
    )
    chan = jnp.asarray([0.0, 0.0, 0.0, wall_x, wall_top, 1.0, 0.0, 0.0, 0.0])

    def gq(x, y):
        return jnp.broadcast_to(chan, x.shape + (9,))

    def eng_roll(phys):
        step = jax.vmap(
            lambda p, t, r: physics_step(
                env.model, p, t, flat_ground, env.contact_params, r,
                env.sim_dt, self_pairs=env.self_pairs, ground_query=gq,
            )
        )
        for _ in range(2):
            phys, _ = step(phys, tau, rand)
        return phys

    sub = ScalarSubstep(
        env.model, env.contact_params, env.sim_dt, env.self_pairs,
        terrain_mode="local_plane_walls",
    )
    taus = [tau[..., i] for i in range(env.num_dof)]
    lanes9 = [jnp.broadcast_to(chan[k], (n,)) for k in range(9)]
    plane = [list(lanes9) for _ in range(np_)]

    def scalar_roll(phys):
        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
            plane=plane,
        )
        for _ in range(2):
            lanes, _ = sub.substep(lanes, taus)
        return lanes_to_state(lanes, PhysicsState)

    want = jax.jit(eng_roll)(phys)
    with jax.disable_jit():   # same reason as test_substep_matches_engine
        got = scalar_roll(phys)
    # sanity: the wall actually acted (forward motion braked vs free flight)
    assert float(jnp.max(want.base_pos[:, 0])) < 0.25
    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel", "q", "qd", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )


def _point_world(env, phys):
    from wiki_grx_gym_tpu.sim.kinematics import forward_kinematics
    from wiki_grx_gym_tpu.utils import maths

    kin = jax.vmap(forward_kinematics, in_axes=(None, 0, 0, 0, 0, 0))(
        env.model, phys.base_quat, phys.base_ang_vel, phys.base_lin_vel, phys.q, phys.qd
    )
    n = phys.q.shape[0]
    pb = jnp.asarray(env.model.point_body, jnp.int32)
    rel = kin.pos_rel[:, pb] + maths.quat_apply(
        kin.quat[:, pb], jnp.broadcast_to(env.model.point_offset, (n,) + env.model.point_offset.shape)
    )
    return phys.base_pos[:, None, :] + rel


def _stairs_error_rollout(env, base_x, seed, substeps=4):
    """Engine-vs-local_plane rollout on a bilinear stairs heightfield.

    Returns (engine_final, scalar_final, max_point_travel_m). The planes are
    the env's exact semantics (5-tap central differences, eps=0.05) frozen at
    the initial point positions — the state the kernel is in right after a
    `_refresh_ground_plane`."""
    n = 8
    hs, rise, tread_cells = 0.1, 0.15, 8   # 0.8 m treads, 0.15 m risers
    nx = 64
    heights = jnp.asarray(
        np.repeat(np.arange(nx // tread_cells) * rise, tread_cells).astype(np.float32)
    )

    def stairs_fn(x, y):
        px = jnp.clip(x / hs, 0.0, nx - 2.0)
        x0 = jnp.floor(px).astype(jnp.int32)
        fx = px - x0
        return heights[x0] * (1 - fx) + heights[x0 + 1] * fx

    phys = random_states(env, n, seed=seed)
    h_at = stairs_fn(base_x + 0.0 * phys.base_pos[:, 0], phys.base_pos[:, 1])
    phys = phys.replace(
        base_pos=phys.base_pos.at[:, 0].set(base_x).at[:, 2].add(h_at),
        base_lin_vel=phys.base_lin_vel.at[:, 0].set(0.5),
    )
    rng = np.random.RandomState(seed + 1)
    tau = jnp.asarray(rng.randn(n, env.num_dof).astype(np.float32) * 5.0)
    rand = BodyRandomization(
        friction=jnp.ones(n), restitution=jnp.zeros(n),
        base_mass_scale=jnp.ones(n), base_com_offset=jnp.zeros((n, 3)),
    )

    def eng_roll(phys):
        step = jax.vmap(
            lambda p, t, r: physics_step(
                env.model, p, t, stairs_fn, env.contact_params, r,
                env.sim_dt, self_pairs=env.self_pairs,
            )
        )
        for _ in range(substeps):
            phys, _ = step(phys, tau, rand)
        return phys

    # plane sampling: the env's exact 5-tap semantics (legged_env.py
    # _sample_point_planes) at the initial point positions
    pp0 = _point_world(env, phys)
    eps = 0.05
    x, y = pp0[..., 0], pp0[..., 1]
    h0 = stairs_fn(x, y)
    gx = (stairs_fn(x + eps, y) - stairs_fn(x - eps, y)) / (2 * eps)
    gy = (stairs_fn(x, y + eps) - stairs_fn(x, y - eps)) / (2 * eps)
    c = h0 - gx * x - gy * y
    plane = [[c[:, p], gx[:, p], gy[:, p]] for p in range(env.model.num_points)]

    sub = ScalarSubstep(
        env.model, env.contact_params, env.sim_dt, env.self_pairs,
        terrain_mode="local_plane",
    )
    taus = [tau[..., i] for i in range(env.num_dof)]

    def scalar_roll(phys):
        lanes = state_to_lanes(phys)
        lanes.update(
            friction=rand.friction, restitution=rand.restitution,
            mass_scale=rand.base_mass_scale,
            com_offset=[rand.base_com_offset[..., k] for k in range(3)],
            plane=plane,
        )
        for _ in range(substeps):
            lanes, _ = sub.substep(lanes, taus)
        return lanes_to_state(lanes, PhysicsState)

    want = jax.jit(eng_roll)(phys)
    with jax.disable_jit():
        got = scalar_roll(phys)
    travel = float(jnp.max(jnp.linalg.norm(_point_world(env, want) - pp0, axis=-1)))
    return want, got, travel


@pytest.mark.slow
def test_local_plane_exact_mid_tread_on_stairs(env):
    """Envs whose contact points (and the 5-tap stencil) stay inside one
    flat tread of a bilinear stairs heightfield: the local planes ARE the
    terrain there, so the kernel path must match the engine evaluating the
    true bilinear height function to float tolerance."""
    want, got, _ = _stairs_error_rollout(env, base_x=0.4, seed=21)
    # qd gets a looser atol: four substeps of stick/slip contact accumulate
    # ~1e-3 of f32 noise on O(5 rad/s) velocities even when the terrain
    # models are identical (same growth as the other oracle tests per-step)
    for name, atol in (("base_pos", 2e-5), ("base_quat", 2e-5), ("q", 2e-5), ("qd", 2e-3)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=2e-4, atol=atol, err_msg=name,
        )


@pytest.mark.slow
def test_local_plane_error_bounded_on_riser_cells(env):
    """Envs straddling a stair riser — where the frozen local plane is a bad
    model at cell edges: the kernel-vs-engine divergence must stay bounded
    by the intra-rollout point travel (the claim in legged_env.py's
    local_plane docs: planes are resampled every policy step at the final
    point positions, so the linearization error cannot exceed how far a
    point moved since its plane was sampled)."""
    want, got, travel = _stairs_error_rollout(env, base_x=0.78, seed=23)
    err = float(jnp.max(jnp.abs(got.base_pos - want.base_pos)))
    q_err = float(jnp.max(jnp.abs(got.q - want.q)))
    assert np.isfinite(err) and np.isfinite(q_err)
    bound = max(travel, 1e-3)
    assert err <= bound, f"base_pos divergence {err:.4f} m > point travel {travel:.4f} m"
    assert q_err <= 10.0 * bound, f"q divergence {q_err:.4f} rad vs travel {travel:.4f} m"
