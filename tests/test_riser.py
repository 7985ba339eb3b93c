"""Trimesh vertical-surface (stair-riser) contact semantics.

The reference corrects slopes above `cfg.terrain.slope_treshold` into
vertical walls when building its trimesh (`terrain_utils.py:286-328`): the
lower vertex extends horizontally to the high side's grid line. These tests
pin the TPU-native equivalent (`terrain/composer.riser_channels` + the wall
forces in `sim/contact.py` / `sim/scalarized.py`): a stair riser presents a
near-vertical face a foot cannot climb, instead of a bilinear ~66 deg ramp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wiki_grx_gym_tpu.sim.contact import ContactParams, contact_forces
from wiki_grx_gym_tpu.terrain.composer import Terrain

VS = 0.005   # vertical scale (m per raw unit)
HS = 0.1     # horizontal scale (m per cell)


def step_terrain(step_m=0.2, wall_cell=10, size=24):
    """Flat at 0 for x-cell < wall_cell, ``step_m`` above for >=."""
    f = np.zeros((size, size), np.int16)
    f[wall_cell:, :] = int(round(step_m / VS))
    return Terrain.from_heightfield(f, HS, VS, border_size=0.0, slope_threshold=0.75)


def test_channels_flat_region():
    t = step_terrain()
    ch = t.ground_channels(jnp.asarray([0.35]), jnp.asarray([0.55]))
    c, gx, gy = ch[0, 0], ch[0, 1], ch[0, 2]
    assert float(c) == pytest.approx(0.0, abs=1e-6)
    assert float(gx) == pytest.approx(0.0, abs=1e-6)
    assert float(gy) == pytest.approx(0.0, abs=1e-6)
    assert float(ch[0, 5]) == 0.0 and float(ch[0, 8]) == 0.0   # no walls


def test_channels_at_up_riser():
    """Query inside the riser cell, approaching from the low side: tread
    stays the LOW tread across the whole cell (the reference extends the
    lower vertex to the high grid line) and an up-wall sits at the high
    side's grid line with the step top."""
    t = step_terrain(step_m=0.2, wall_cell=10)
    # riser cell is [9, 10): low corner h=0, high corner h=0.2/VS
    x = jnp.asarray([9.0 * HS + 0.07])   # 70% into the riser cell
    y = jnp.asarray([0.55])
    ch = t.ground_channels(x, y)
    h_eff = ch[0, 0] + ch[0, 1] * x[0] + ch[0, 2] * y[0]
    assert float(h_eff) == pytest.approx(0.0, abs=1e-6)       # low tread extended
    assert float(ch[0, 1]) == pytest.approx(0.0, abs=1e-6)    # gradient flattened
    assert float(ch[0, 5]) == 1.0                             # +x wall
    assert float(ch[0, 3]) == pytest.approx(10.0 * HS, abs=1e-6)  # at grid line
    assert float(ch[0, 4]) == pytest.approx(0.2, abs=1e-6)    # top = step height
    # the high cell past the riser reports its back-edge face (so a point
    # that tunneled across the line is pushed back out, not launched up by
    # the high tread): solid = this cell's side, below the step top
    ch_hi = t.ground_channels(jnp.asarray([10.5 * HS]), y)
    assert float(ch_hi[0, 5]) == 1.0
    assert float(ch_hi[0, 3]) == pytest.approx(10.0 * HS, abs=1e-6)
    assert float(ch_hi[0, 4]) == pytest.approx(0.2, abs=1e-6)
    h_hi = ch_hi[0, 0] + ch_hi[0, 1] * 10.5 * HS + ch_hi[0, 2] * y[0]
    assert float(h_hi) == pytest.approx(0.2, abs=1e-6)        # tread unchanged


def test_channels_down_riser_sign():
    """Descending step along +x: wall at the LOW-x grid line, sign -1."""
    f = np.zeros((24, 24), np.int16)
    f[:10, :] = int(round(0.2 / VS))   # high for x < 10
    t = Terrain.from_heightfield(f, HS, VS, 0.0, 0.75)
    x = jnp.asarray([9.0 * HS + 0.03])
    y = jnp.asarray([0.55])
    ch = t.ground_channels(x, y)
    h_eff = ch[0, 0] + ch[0, 1] * x[0] + ch[0, 2] * y[0]
    assert float(h_eff) == pytest.approx(0.0, abs=1e-6)       # low tread extended
    assert float(ch[0, 5]) == -1.0                            # -x wall (solid behind)
    assert float(ch[0, 3]) == pytest.approx(9.0 * HS, abs=1e-6)
    assert float(ch[0, 4]) == pytest.approx(0.2, abs=1e-6)


def test_tile_channels_match_global():
    """MXU tile path == scattered global path for riser channels."""
    rng = np.random.RandomState(0)
    f = (rng.randint(-20, 60, (64, 64))).astype(np.int16)
    t = Terrain.from_heightfield(f, HS, VS, 0.0, 0.75)
    key = jax.random.PRNGKey(1)
    n, q = 8, 17
    centers = jax.random.uniform(key, (n, 2), minval=2.0, maxval=4.0)
    off = jax.random.uniform(jax.random.fold_in(key, 1), (n, q, 2), minval=-1.2, maxval=1.2)
    x = centers[:, None, 0] + off[..., 0]
    y = centers[:, None, 1] + off[..., 1]
    tiles = t.extract_tiles(centers)
    np.testing.assert_allclose(
        np.asarray(t.tile_ground_channels(*tiles, x, y)),
        np.asarray(t.ground_channels(x, y)),
        atol=1e-4,
    )


def _integrate_sphere(t, push_n, steps=1500, dt=0.002, r=0.05, m=1.0,
                      x0=0.55, z0=None, mu=1.0):
    """Point-mass sphere on the terrain, pushed +x with ``push_n`` newtons.
    Returns the (x, z) trajectory."""
    params = ContactParams(point_mass=m)
    gq = lambda xx, yy: t.ground_channels(xx, yy)

    def substep(carry, _):
        pos, vel, anchor = carry
        f, anchor = contact_forces(
            params, None, pos, vel, jnp.full((1,), r), jnp.asarray(mu),
            jnp.asarray(0.0), dt, anchor=anchor, ground_query=gq,
        )
        acc = f / m + jnp.asarray([push_n / m, 0.0, -9.81])
        vel = vel + acc * dt
        pos = pos + vel * dt
        return (pos, vel, anchor), pos

    pos = jnp.asarray([[x0, 0.55, r if z0 is None else z0]])
    vel = jnp.zeros((1, 3))
    (_, _, _), traj = jax.lax.scan(substep, (pos, vel, pos), None, length=steps)
    return np.asarray(traj[:, 0, 0]), np.asarray(traj[:, 0, 2])


def test_sphere_pushed_into_step_stops():
    """THE oracle (VERDICT r2 item 3): a foot pushed horizontally into a
    0.2 m step must stop at the riser, not climb it."""
    t = step_terrain(step_m=0.2, wall_cell=10)
    xs, zs = _integrate_sphere(t, push_n=40.0)
    wall_x = 10 * HS
    # stopped at the wall: center cannot pass wall - radius by more than a
    # penalty penetration (~ push/stiffness = 40/1e4 = 4 mm)
    assert xs[-1] < wall_x - 0.05 + 0.02, f"sphere passed the riser: x={xs[-1]:.3f}"
    assert np.max(xs) < wall_x - 0.05 + 0.02
    # and did not climb: stays at the low tread the whole time
    assert np.max(zs) < 0.12, f"sphere climbed the riser: z_max={np.max(zs):.3f}"


def test_sphere_wedges_up_ramp_without_riser_correction():
    """Contrast: with slope correction OFF (heightfield semantics) a strong
    horizontal push wedges the sphere up the bilinear ~63 deg ramp — the
    stuck-on-the-riser behavior the reference built the trimesh correction
    to prevent. With the correction, the same push stops flat at the wall."""
    f = np.zeros((24, 24), np.int16)
    f[10:, :] = int(round(0.2 / VS))
    t_ramp = Terrain.from_heightfield(f, HS, VS, 0.0, None)   # no threshold
    xs_r, zs_r = _integrate_sphere(t_ramp, push_n=300.0)
    assert np.max(zs_r) > 0.08, "expected the uncorrected ramp to be wedgeable"
    t_wall = Terrain.from_heightfield(f, HS, VS, 0.0, 0.75)
    xs_w, zs_w = _integrate_sphere(t_wall, push_n=300.0)
    assert np.max(zs_w) < 0.07, f"climbed a corrected riser: {np.max(zs_w):.3f}"
    assert xs_w[-1] < 10 * HS - 0.05 + 0.04


def test_walking_down_step_lands_on_low_tread():
    """A sphere rolling off a descending step must land on the lower tread
    (no wall force from above, no support discontinuity explosion)."""
    f = np.zeros((24, 24), np.int16)
    f[:10, :] = int(round(0.2 / VS))
    t = Terrain.from_heightfield(f, HS, VS, 0.0, 0.75)
    xs, zs = _integrate_sphere(t, push_n=10.0, x0=0.75, z0=0.25, steps=2000)
    assert xs[-1] > 10 * HS + 0.2        # moved past the edge
    assert abs(zs[-1] - 0.05) < 0.02     # resting on the low tread (z = r)
