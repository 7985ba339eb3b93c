"""Terrain generator + composer tests (mirroring the behavior of
`isaacgym/terrain_utils.py` and `legged_gym/utils/terrain.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.terrain import generators as G
from wiki_grx_gym_tpu.terrain.composer import Terrain
from wiki_grx_gym_tpu.envs import task_registry


def patch():
    return G.SubTerrain(width=80, length=80)


def test_sloped_terrain():
    t = G.sloped_terrain(patch(), slope=0.2)
    # monotone along x, flat along y
    h = t.height_field_raw
    assert np.all(np.diff(h[:, 0]) >= 0)
    assert np.all(h[:, 0] == h[:, -1])
    # total rise = slope * extent
    rise = h[-1, 0] * 0.005
    assert rise == pytest.approx(0.2 * 8.0, rel=0.1)


def test_pyramid_sloped_has_flat_platform():
    t = G.pyramid_sloped_terrain(patch(), slope=0.3, platform_size=3.0)
    h = t.height_field_raw
    c = 40
    assert h[c, c] == h.max()
    # center 3m platform flat
    assert np.all(h[c - 10 : c + 10, c - 10 : c + 10] == h[c, c])


def test_stairs_terrain_steps():
    t = G.stairs_terrain(patch(), step_width=0.31, step_height=0.1)
    h = t.height_field_raw
    uniq = np.unique(h[:78, 0])
    assert len(uniq) >= 20  # many distinct step levels
    assert np.all(np.diff(h[:78, 0]) >= 0)  # trailing remainder rows stay 0


def test_pyramid_stairs():
    t = G.pyramid_stairs_terrain(patch(), step_width=0.31, step_height=0.1, platform_size=3.0)
    h = t.height_field_raw
    assert h[40, 40] == h.max()
    assert h[0, 0] == 0


def test_random_uniform_bounds():
    t = G.random_uniform_terrain(
        patch(), min_height=-0.05, max_height=0.05, step=0.005, downsampled_scale=0.2,
        rng=np.random.RandomState(0),
    )
    h = t.height_field_raw * 0.005
    assert h.min() >= -0.051 and h.max() <= 0.051
    assert h.std() > 0.005


def test_stepping_stones_has_holes_and_platform():
    t = G.stepping_stones_terrain(
        patch(), stone_size=0.8, stone_distance=0.3, max_height=0.0, platform_size=4.0,
        rng=np.random.RandomState(1),
    )
    h = t.height_field_raw * 0.005
    assert h.min() <= -9.0  # deep holes
    assert np.all(h[21:59, 21:59][19:21, 19:21] == 0)  # center platform


def test_gap_and_pit():
    t = G.gap_terrain(patch(), gap_size=0.8, platform_size=3.0)
    assert t.height_field_raw.min() == -1000
    assert t.height_field_raw[40, 40] == 0
    t2 = G.pit_terrain(patch(), depth=0.5, platform_size=4.0)
    assert t2.height_field_raw[40, 40] == int(-0.5 / 0.005)


@pytest.fixture(scope="module")
def small_terrain_cfg():
    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    tc = env_cfg.terrain
    tc.mesh_type = "heightfield"
    tc.num_rows = 3
    tc.num_cols = 4
    tc.border_size = 5
    tc.curriculum = True
    return env_cfg


def test_composer_grid(small_terrain_cfg):
    terrain = Terrain(small_terrain_cfg.terrain, rng=np.random.RandomState(0))
    assert terrain.height_field_raw.shape == (3 * 80 + 100, 4 * 80 + 100)
    assert terrain.env_origins_grid.shape == (3, 4, 3)
    # origins at cell centers
    np.testing.assert_allclose(terrain.env_origins_grid[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(terrain.env_origins_grid[2, 3, :2], [20.0, 28.0])


def test_composer_lookups(small_terrain_cfg):
    terrain = Terrain(small_terrain_cfg.terrain, rng=np.random.RandomState(0))
    x = jnp.asarray([4.0, 20.0])
    y = jnp.asarray([4.0, 28.0])
    h_b = terrain.height_fn(x, y)
    h_m = terrain.measured_heights(x, y)
    assert h_b.shape == (2,) and h_m.shape == (2,)
    # min-sample is conservative: <= bilinear + one pixel of slack
    assert np.all(np.asarray(h_m) <= np.asarray(h_b) + 0.06)
    # origin z equals max height of central 2x2m
    oz = terrain.env_origins_grid[0, 0, 2]
    assert np.isfinite(oz)


def test_tile_lookups_match_global(small_terrain_cfg):
    """The MXU tile path (extract_tiles + separable one-hot matmuls) must
    reproduce the scattered-gather lookups exactly for queries inside the
    tile (+-1.6 m around the tile center; the robot's reach is <= 1.35 m)."""
    terrain = Terrain(small_terrain_cfg.terrain, rng=np.random.RandomState(0))
    key = jax.random.PRNGKey(3)
    n, q = 16, 37
    centers = jnp.stack([
        jax.random.uniform(key, (n,), minval=1.0, maxval=23.0),
        jax.random.uniform(jax.random.fold_in(key, 1), (n,), minval=1.0, maxval=31.0),
    ], axis=1)
    off = jax.random.uniform(jax.random.fold_in(key, 2), (n, q, 2), minval=-1.3, maxval=1.3)
    x = centers[:, None, 0] + off[..., 0]
    y = centers[:, None, 1] + off[..., 1]

    tiles = terrain.extract_tiles(centers)
    np.testing.assert_allclose(
        np.asarray(terrain.tile_height_fn(*tiles, x, y)),
        np.asarray(terrain.height_fn(x, y)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(terrain.tile_measured(*tiles, x, y)),
        np.asarray(terrain.measured_heights(x, y)),
        atol=1e-5,
    )
    # single-tap path on the in-tile derived 3-tap-min tile (the env's
    # observation path) must match the reference formula too
    raw, sx, sy = tiles
    np.testing.assert_allclose(
        np.asarray(terrain.tile_measured_1tap(terrain.tile_min(raw), sx, sy, x, y)),
        np.asarray(terrain.measured_heights(x, y)),
        atol=1e-5,
    )


def test_block_pyramid_tiles_are_field_windows(small_terrain_cfg):
    """Every extracted tile must be an exact window of the raw field at the
    returned (sx, sy), and the window must cover >= 1.35 m around any query
    center (the snap-margin contract of the block pyramid)."""
    terrain = Terrain(small_terrain_cfg.terrain, rng=np.random.RandomState(0))
    key = jax.random.PRNGKey(5)
    centers = jnp.stack([
        jax.random.uniform(key, (12,), minval=0.5, maxval=23.5),
        jax.random.uniform(jax.random.fold_in(key, 1), (12,), minval=0.5, maxval=31.5),
    ], axis=1)
    tiles, sx, sy = terrain.extract_tiles(centers)
    hf = np.asarray(terrain.height_field_raw, np.float32)
    t = terrain.TILE
    for i in range(12):
        a, b = int(sx[i]), int(sy[i])
        np.testing.assert_array_equal(np.asarray(tiles[i]), hf[a : a + t, b : b + t])
        # coverage: the +-1.35 m reach window sits inside the tile
        px = float((centers[i, 0] + terrain._border_m) / terrain._hs)
        py = float((centers[i, 1] + terrain._border_m) / terrain._hs)
        reach = 1.35 / terrain._hs
        assert a <= max(px - reach, 0) and min(px + reach, hf.shape[0] - 2) <= a + t - 2
        assert b <= max(py - reach, 0) and min(py + reach, hf.shape[1] - 2) <= b + t - 2


@pytest.mark.slow
def test_rough_terrain_env_steps(small_terrain_cfg):
    """GR1T1 on curriculum heightfield: env builds, steps, measures heights."""
    cfg = small_terrain_cfg
    cfg.env.num_envs = 4
    cfg.terrain.measure_heights = True
    env, _ = task_registry.make_env("GR1T1", env_cfg=cfg)
    state = env.init_state(jax.random.PRNGKey(0))
    # origins follow the terrain grid (down-stairs cells go deeply negative)
    assert bool(jnp.all(jnp.isfinite(state.env_origins)))
    assert bool(jnp.all(state.env_origins[:, 2] > -3.0))
    step = jax.jit(env.step)
    for _ in range(5):
        state, out = step(state, jnp.zeros((4, 10)))
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert bool(jnp.all(jnp.isfinite(out.pri_obs)))
    # surround heights channel is alive (last 121 entries of pri obs)
    assert out.pri_obs.shape == (4, 168)


def test_terrain_curriculum_moves_levels(small_terrain_cfg):
    cfg = small_terrain_cfg
    cfg.env.num_envs = 4
    env, _ = task_registry.make_env("GR1T1", env_cfg=cfg)
    state = env.init_state(jax.random.PRNGKey(0))
    # walk the robots past half the terrain length -> must move up a level
    phys = state.physics.replace(
        base_pos=state.physics.base_pos.at[:, 0].add(env.terrain.env_length)
    )
    state = state.replace(
        physics=phys, terrain_levels=jnp.zeros(4, jnp.int32), commands=jnp.ones((4, 3))
    )
    new = env._reset_where(
        state, jnp.ones(4, bool), key=jax.random.PRNGKey(1), update_curriculum=True
    )
    assert bool(jnp.all(new.terrain_levels == 1))


@pytest.mark.slow
def test_refresh_interval_carries_measured_cache():
    """terrain.refresh_interval=2: the measured grid refreshes on even
    common_steps and is CARRIED (bit-identical) on odd ones, even though
    the base moves; interval=1 resamples every step."""
    import jax.numpy as jnp

    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 4
    env_cfg.control.decimation = 2
    env_cfg.terrain.mesh_type = "heightfield"
    env_cfg.terrain.curriculum = True
    env_cfg.terrain.refresh_interval = 2
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    assert env.refresh_interval == 2

    with jax.disable_jit():
        s = env.init_state(jax.random.PRNGKey(0))
        assert s.measured_cache is not None
        a = 0.2 * jnp.ones((4, env.num_actions))
        s, _ = env.step(s, a)          # common_step 0 -> refresh
        c1 = np.asarray(s.measured_cache)
        s, _ = env.step(s, a)          # common_step 1 -> carry
        c2 = np.asarray(s.measured_cache)
        # teleport: the next refresh must resample at the new pose
        s = s.replace(
            physics=s.physics.replace(
                base_pos=s.physics.base_pos + jnp.asarray([1.5, 0.0, 0.0])
            )
        )
        s, _ = env.step(s, a)          # common_step 2 -> refresh
        c3 = np.asarray(s.measured_cache)
    np.testing.assert_array_equal(c1, c2)
    assert not np.array_equal(c2, c3)


@pytest.mark.slow
def test_refresh_interval_carries_ground_planes():
    """refresh_interval=2 on the kernel (lanes) heightfield path: the
    per-point ground planes are carried bit-identical through skip steps,
    refreshed on even steps, and just-reset envs get the flat spawn-origin
    plane (c = origin z, zero gradient) on skip steps."""
    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = 4
    env_cfg.control.decimation = 2
    env_cfg.sim.use_pallas = "lanes"
    env_cfg.terrain.mesh_type = "heightfield"
    env_cfg.terrain.curriculum = True
    env_cfg.terrain.refresh_interval = 2
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    assert env._pallas_mode() is not None

    with jax.disable_jit():
        s = env.init_state(jax.random.PRNGKey(0))
        assert s.ground_plane is not None
        a = jnp.zeros((4, env.num_actions))
        s, o1 = env.step(s, a)      # cs 0 -> planes refreshed (post-step)
        g1 = np.asarray(s.ground_plane)
        s, o2 = env.step(s, a)      # cs 1 -> carry (unless an env reset)
        g2 = np.asarray(s.ground_plane)
        resets = np.asarray(o2.reset)
    for i in range(4):
        if resets[i]:
            # flat spawn plane: c = origin z, gradients/walls zero
            np.testing.assert_allclose(
                g2[i, :, 0], float(np.asarray(s.env_origins)[i, 2]), atol=1e-6
            )
            np.testing.assert_allclose(g2[i, :, 1:3], 0.0, atol=1e-6)
        else:
            np.testing.assert_array_equal(g1[i], g2[i])
