"""Terrain grid composer + device-side height lookups.

Host side mirrors `legged_gym/utils/terrain.py:38-164`: a num_rows(levels) x
num_cols(types) grid of terrain_length x terrain_width subterrains inside a
border, with per-cell difficulty/type selection and env origins at cell
centers (z = max height of the central 2x2 m).

Device side provides two lookups over the uploaded heightfield:
- ``height_fn(x, y)``: bilinear sample for *contact* (smooth normals);
- ``measured_heights(x, y)``: the reference's conservative 3-tap **min**
  sample used for observations (`legged_robot.py:1260-1274`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from wiki_grx_gym_tpu.terrain import generators as G


def riser_channels(h00, h10, h01, h11, hxb0, hxb1, hyb0, hyb1,
                   x0w, y0w, fx, fy, hs_m, vs, thr):
    """Vertical-surface (stair-riser) ground channels from a cell's four
    corner heights plus one backward neighbor row per axis — the TPU-native
    equivalent of the reference's trimesh slope-threshold correction
    (`terrain_utils.py:315-328`): where a cell-edge height difference
    exceeds ``thr`` (raw units), the *lower* vertex extends horizontally to
    the high side's grid line and the surface becomes a vertical wall there.

    Inputs are broadcastable arrays: heights in raw (int16) units —
    ``hxb*`` = heights at ``(x0-1, y0)/(x0-1, y0+1)``, ``hyb*`` at
    ``(x0, y0-1)/(x0+1, y0-1)`` (the cell behind each axis, so a point that
    crossed a riser line still sees the face it crossed); ``x0w/y0w`` the
    world coordinates of the cell's (x0, y0) corner, ``fx/fy`` in-cell
    fractions, ``hs_m/vs`` horizontal/vertical scales, ``thr`` the
    threshold in raw units.

    Returns 9 channels (world meters):
    ``(c, gx, gy, wx_pos, wx_top, wx_sign, wy_pos, wy_top, wy_sign)`` —
    the *tread* plane ``h(x, y) = c + gx x + gy y`` (riser cells flattened
    to the low tread, analytic in-cell gradient) plus up to one wall per
    axis: solid occupies ``sign * (coord - pos) > 0`` below ``top``;
    ``sign = 0`` means no wall. Contact code must additionally suppress the
    vertical tread force when a point's *center* is strictly inside a wall's
    solid below its top (it is inside the step, and the nearest face is the
    riser — otherwise a point that tunnels past the line gets launched
    vertically by the high tread). Sphere radii must be <= one cell for a
    face to be seen before the center enters its cell."""
    dx0, dx1 = h10 - h00, h11 - h01

    def ir(a, d, f):
        # riser-flattened 1-D interpolation: (value, d value / d f)
        f_eff = jnp.where(d > thr, 0.0, jnp.where(d < -thr, 1.0, f))
        g = jnp.where(jnp.abs(d) > thr, 0.0, d)
        return a + f_eff * d, g

    v0, g0 = ir(h00, dx0, fx)
    v1, g1 = ir(h01, dx1, fx)
    dyv = v1 - v0
    h, gy_raw = ir(v0, dyv, fy)
    # x-gradient comes from the tread actually under the point: the low
    # y-side when the y edge is a riser, the fy-blend otherwise
    wy_low = jnp.where(dyv > thr, 0.0, jnp.where(dyv < -thr, 1.0, fy))
    gx_raw = (1.0 - wy_low) * g0 + wy_low * g1

    g2m = vs / hs_m
    gx = gx_raw * g2m
    gy = gy_raw * g2m
    c = h * vs - gx * (x0w + fx * hs_m) - gy * (y0w + fy * hs_m)

    def axis_wall(d_in, d_back, low0w, hi_up, hi_dn, hi_b_this, hi_b_prev):
        """One axis's wall from the in-cell edge (priority) or the back
        edge. ``low0w`` = world coord of the cell's lower grid line;
        ``hi_*`` = interpolated high-side heights (raw) per case."""
        in_up = d_in > thr          # wall at the +edge, solid beyond it
        in_dn = d_in < -thr         # wall at the -edge, solid behind it
        b_up = d_back > thr         # THIS cell is the high side: face at
        #                             the -edge, solid = this cell (below top)
        b_dn = d_back < -thr        # previous cell higher: face at the
        #                             -edge, solid = previous cell
        sign = jnp.where(
            in_up, 1.0,
            jnp.where(in_dn, -1.0, jnp.where(b_up, 1.0, jnp.where(b_dn, -1.0, 0.0))),
        )
        pos_w = jnp.where(in_up, low0w + hs_m, low0w)
        top = jnp.where(
            in_up, hi_up,
            jnp.where(in_dn, hi_dn, jnp.where(b_up, hi_b_this, hi_b_prev)),
        ) * vs
        return pos_w, top, sign

    dxi = (1.0 - fy) * dx0 + fy * dx1
    dxb = (1.0 - fy) * (h00 - hxb0) + fy * (h01 - hxb1)
    wx_pos, wx_top, wx_sign = axis_wall(
        dxi, dxb, x0w,
        (1.0 - fy) * h10 + fy * h11,     # in-cell up: high = +x corners
        (1.0 - fy) * h00 + fy * h01,     # in-cell down: high = -x corners
        (1.0 - fy) * h00 + fy * h01,     # back up: this cell's -x corners
        (1.0 - fy) * hxb0 + fy * hxb1,   # back down: previous cell
    )

    dy0, dy1 = h01 - h00, h11 - h10
    dyi = (1.0 - fx) * dy0 + fx * dy1
    dyb = (1.0 - fx) * (h00 - hyb0) + fx * (h10 - hyb1)
    wy_pos, wy_top, wy_sign = axis_wall(
        dyi, dyb, y0w,
        (1.0 - fx) * h01 + fx * h11,
        (1.0 - fx) * h00 + fx * h10,
        (1.0 - fx) * h00 + fx * h10,
        (1.0 - fx) * hyb0 + fx * hyb1,
    )

    return jnp.stack(
        [c, gx, gy, wx_pos, wx_top, wx_sign, wy_pos, wy_top, wy_sign], axis=-1
    )


class Terrain:
    def __init__(self, cfg, rng: np.random.RandomState | None = None):
        self.cfg = cfg
        self.rng = rng or np.random.RandomState(0)
        self.type = cfg.mesh_type
        self.env_length = cfg.terrain_length
        self.env_width = cfg.terrain_width
        props = list(cfg.terrain_proportions) + [0.0] * (8 - len(cfg.terrain_proportions))
        self.proportions = [sum(props[: i + 1]) for i in range(len(props))]

        self.num_sub_terrains = cfg.num_rows * cfg.num_cols
        self.env_origins_grid = np.zeros((cfg.num_rows, cfg.num_cols, 3))

        self.width_px = int(self.env_width / cfg.horizontal_scale)
        self.length_px = int(self.env_length / cfg.horizontal_scale)
        self.border = int(cfg.border_size / cfg.horizontal_scale)
        self.tot_cols = int(cfg.num_cols * self.width_px) + 2 * self.border
        self.tot_rows = int(cfg.num_rows * self.length_px) + 2 * self.border

        self.height_field_raw = np.zeros((self.tot_rows, self.tot_cols), dtype=np.int16)
        if cfg.curriculum:
            self._curriculum()
        elif cfg.selected:
            self._selected()
        else:
            self._randomized()

        # device-side copies
        self.height_samples = jnp.asarray(self.height_field_raw.astype(np.float32))
        self.terrain_origins = jnp.asarray(self.env_origins_grid.astype(np.float32))
        self._hs = float(cfg.horizontal_scale)
        self._vs = float(cfg.vertical_scale)
        self._border_m = float(cfg.border_size)
        # trimesh mesh_type: vertical-surface correction above the slope
        # threshold (`legged_robot_config.py:99`, `terrain_utils.py:315-328`)
        # — raw-unit threshold, None = heightfield semantics (no correction)
        st = getattr(cfg, "slope_treshold", None)
        self.slope_threshold_raw = (
            float(st) * self._hs / self._vs
            if (cfg.mesh_type == "trimesh" and st is not None)
            else None
        )

    @classmethod
    def from_heightfield(cls, field: np.ndarray, horizontal_scale: float,
                         vertical_scale: float, border_size: float = 0.0,
                         slope_threshold: float | None = None):
        """Build a Terrain around an explicit raw heightfield (tests /
        tooling): no generators, origins at the field center."""
        t = cls.__new__(cls)
        t.cfg = None
        t.height_field_raw = np.asarray(field, np.int16)
        t.height_samples = jnp.asarray(t.height_field_raw.astype(np.float32))
        t._hs = float(horizontal_scale)
        t._vs = float(vertical_scale)
        t._border_m = float(border_size)
        t.env_length = field.shape[0] * horizontal_scale
        t.env_width = field.shape[1] * horizontal_scale
        t.slope_threshold_raw = (
            float(slope_threshold) * t._hs / t._vs
            if slope_threshold is not None
            else None
        )
        return t

    # ------------------------------------------------------------------
    # host-side composition
    # ------------------------------------------------------------------

    def _new_patch(self) -> G.SubTerrain:
        return G.SubTerrain(
            width=self.width_px,
            length=self.width_px,
            vertical_scale=self.cfg.vertical_scale,
            horizontal_scale=self.cfg.horizontal_scale,
        )

    def _randomized(self):
        for k in range(self.num_sub_terrains):
            i, j = np.unravel_index(k, (self.cfg.num_rows, self.cfg.num_cols))
            choice = self.rng.uniform(0, 1)
            difficulty = self.rng.choice([0.5, 0.75, 0.9])
            self._add(self.make_terrain(choice, difficulty), i, j)

    def _curriculum(self):
        for j in range(self.cfg.num_cols):
            for i in range(self.cfg.num_rows):
                difficulty = i / self.cfg.num_rows
                choice = j / self.cfg.num_cols + 0.001
                self._add(self.make_terrain(choice, difficulty), i, j)

    def _selected(self):
        kwargs = dict(self.cfg.terrain_kwargs)
        terrain_type = kwargs.pop("type")
        fn = getattr(G, terrain_type)
        for k in range(self.num_sub_terrains):
            i, j = np.unravel_index(k, (self.cfg.num_rows, self.cfg.num_cols))
            patch = self._new_patch()
            fn(patch, **kwargs)
            self._add(patch, i, j)

    def make_terrain(self, choice: float, difficulty: float) -> G.SubTerrain:
        """Difficulty/type mix exactly as utils/terrain.py:109-145."""
        t = self._new_patch()
        slope = difficulty * 0.4
        step_height = 0.05 + 0.18 * difficulty
        obstacle_height = 0.05 + difficulty * 0.2
        stone_size = 1.5 * (1.05 - difficulty)
        stone_distance = 0.05 if difficulty == 0 else 0.1
        gap_size = 1.0 * difficulty
        pit_depth = 1.0 * difficulty
        p = self.proportions
        if choice < p[0]:
            if choice < p[0] / 2:
                slope *= -1
            G.pyramid_sloped_terrain(t, slope=slope, platform_size=3.0)
        elif choice < p[1]:
            G.pyramid_sloped_terrain(t, slope=slope, platform_size=3.0)
            G.random_uniform_terrain(
                t, min_height=-0.05, max_height=0.05, step=0.005, downsampled_scale=0.2,
                rng=self.rng,
            )
        elif choice < p[3]:
            if choice < p[2]:
                step_height *= -1
            G.pyramid_stairs_terrain(t, step_width=0.31, step_height=step_height, platform_size=3.0)
        elif choice < p[4]:
            G.discrete_obstacles_terrain(
                t, obstacle_height, 1.0, 2.0, 20, platform_size=3.0, rng=self.rng
            )
        elif choice < p[5]:
            G.stepping_stones_terrain(
                t, stone_size=stone_size, stone_distance=stone_distance, max_height=0.0,
                platform_size=4.0, rng=self.rng,
            )
        elif choice < p[6]:
            G.gap_terrain(t, gap_size=gap_size, platform_size=3.0)
        else:
            G.pit_terrain(t, depth=pit_depth, platform_size=4.0)
        return t

    def _add(self, patch: G.SubTerrain, row: int, col: int):
        """utils/terrain.py:147-164."""
        sx = self.border + row * self.length_px
        sy = self.border + col * self.width_px
        self.height_field_raw[sx : sx + self.length_px, sy : sy + self.width_px] = (
            patch.height_field_raw
        )
        ox = (row + 0.5) * self.env_length
        oy = (col + 0.5) * self.env_width
        x1 = int((self.env_length / 2.0 - 1) / self.cfg.horizontal_scale)
        x2 = int((self.env_length / 2.0 + 1) / self.cfg.horizontal_scale)
        y1 = int((self.env_width / 2.0 - 1) / self.cfg.horizontal_scale)
        y2 = int((self.env_width / 2.0 + 1) / self.cfg.horizontal_scale)
        oz = np.max(patch.height_field_raw[x1:x2, y1:y2]) * self.cfg.vertical_scale
        self.env_origins_grid[row, col] = [ox, oy, oz]

    # ------------------------------------------------------------------
    # device-side lookups (jit-safe)
    # ------------------------------------------------------------------

    def height_fn(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Bilinear height for contact, world coordinates."""
        hs = self.height_samples
        px = (x + self._border_m) / self._hs
        py = (y + self._border_m) / self._hs
        px = jnp.clip(px, 0.0, hs.shape[0] - 2.0)
        py = jnp.clip(py, 0.0, hs.shape[1] - 2.0)
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        fx = px - x0
        fy = py - y0
        h00 = hs[x0, y0]
        h10 = hs[x0 + 1, y0]
        h01 = hs[x0, y0 + 1]
        h11 = hs[x0 + 1, y0 + 1]
        h = h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy) + h01 * (1 - fx) * fy + h11 * fx * fy
        return h * self._vs

    def measured_heights(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Conservative 3-tap min sample for observations
        (legged_robot.py:1258-1274)."""
        hs = self.height_samples
        px = ((x + self._border_m) / self._hs).astype(jnp.int32)
        py = ((y + self._border_m) / self._hs).astype(jnp.int32)
        px = jnp.clip(px, 0, hs.shape[0] - 2)
        py = jnp.clip(py, 0, hs.shape[1] - 2)
        h = jnp.minimum(jnp.minimum(hs[px, py], hs[px + 1, py]), hs[px, py + 1])
        return h * self._vs

    # ------------------------------------------------------------------
    # tile-based lookups — the TPU-fast path
    # ------------------------------------------------------------------
    # Scattered scalar gathers over the global heightfield dominated
    # terrain-mode training (96k vs 3.19M env-steps/s on plane, r2 job05;
    # one policy step's worth of lookups measured 45.4 ms at 4096 envs,
    # r2 job09). The same queries via (a) per-env tile extraction — a
    # vmapped dynamic_slice XLA lowers to contiguous block DMAs — and
    # (b) separable one-hot matmul interpolation on the MXU run ~7x
    # faster (6.5 ms, job09). Results are exact (Precision.HIGHEST keeps
    # f32) while the queries stay inside the tile: +-1.6 m around the
    # tile center at 0.1 m resolution, vs a <=1.3 m robot reach.

    # TILE covers +-TILE/2 * 0.1 m = +-2.4 m around the block corner;
    # centers snap to the BSTRIDE grid (<= 1.6 m), leaving >= 1.6 m of
    # effective reach — worst-case query reach is ~1.35 m (contact spheres
    # of a toppling robot + the 0.05 m gradient eps; the yaw-rotated
    # measurement grid is 0.71 m)
    TILE = 48
    BSTRIDE = 16  # block-grid stride in cells (1.6 m at 0.1 m resolution)

    @property
    def _block_pyramid(self):
        """Precomputed overlapping TILE x TILE windows on a BSTRIDE grid:
        ((nbx*nby, TILE*TILE) int16 rows, (nbx,) sx, (nby,) sy, nby).

        Per-env tile extraction becomes ONE contiguous-row gather
        (TILE*TILE*2 = 4.6 KB per env) instead of a TILE-row chunk gather +
        one-hot column compaction — which measured 2.2 ms of the 4.7 ms
        terrain policy step at 4096 envs (r3 job02). Storage is
        TILE^2/BSTRIDE^2 = 9x the int16 field (~50 MB for the default
        10x20-cell curriculum grid).

        Cached as NUMPY (a first use inside a jit trace must not capture
        tracers)."""
        if getattr(self, "_block_pyramid_cache", None) is None:
            t, s = self.TILE, self.BSTRIDE
            hs = self.height_field_raw
            hp = np.pad(
                hs,
                ((0, max(t - hs.shape[0], 0)), (0, max(t - hs.shape[1], 0))),
                mode="edge",
            )
            h, w = hp.shape
            nbx = (h + s - 1) // s
            nby = (w + s - 1) // s
            sxs = np.clip(np.arange(nbx) * s - (t - s) // 2, 0, h - t)
            sys_ = np.clip(np.arange(nby) * s - (t - s) // 2, 0, w - t)
            blocks = np.empty((nbx * nby, t * t), np.int16)
            for i, sx in enumerate(sxs):
                for j, sy in enumerate(sys_):
                    blocks[i * nby + j] = hp[sx : sx + t, sy : sy + t].ravel()
            self._block_pyramid_cache = (
                blocks, sxs.astype(np.int32), sys_.astype(np.int32), nby,
            )
        return self._block_pyramid_cache

    @staticmethod
    def tile_min(tiles: jax.Array) -> jax.Array:
        """In-tile 3-tap-min derivation: ``min(h[x,y], h[x+1,y], h[x,y+1])``
        from an already-extracted raw tile — a pure elementwise shift+min,
        so the observation path shares ONE extraction with the contact path
        instead of gathering a precomputed min field separately. Exact for
        every queried cell (lookups clip local indices to TILE-2, so the
        edge-replicated last row/column is never consumed)."""
        xp = jnp.concatenate([tiles[:, 1:, :], tiles[:, -1:, :]], axis=1)
        yp = jnp.concatenate([tiles[:, :, 1:], tiles[:, :, -1:]], axis=2)
        return jnp.minimum(tiles, jnp.minimum(xp, yp))

    def extract_tiles(self, center_xy: jax.Array):
        """(N, 2) world xy -> ((N, T, T) f32 tiles, (N,) sx, (N,) sy).

        History of this hot path (4096 envs, v5e): vmapped ``dynamic_slice``
        lowered to scattered per-element gathers (6.3 ms, r2 job24); the
        chunked row gather + one-hot column compaction brought it to 2.2 ms
        (r2 job25/r3 job02); the block pyramid makes it ONE contiguous-row
        gather of 4.6 KB per env (~HBM speed) + an elementwise int16->f32
        convert."""
        blocks, sxs, sys_, nby = self._block_pyramid
        t, s = self.TILE, self.BSTRIDE
        n = center_xy.shape[0]
        px = (center_xy[:, 0] + self._border_m) / self._hs
        py = (center_xy[:, 1] + self._border_m) / self._hs
        bx = jnp.clip((px / s).astype(jnp.int32), 0, len(sxs) - 1)
        by = jnp.clip((py / s).astype(jnp.int32), 0, len(sys_) - 1)
        tiles = (
            jnp.take(jnp.asarray(blocks), bx * nby + by, axis=0)
            .reshape(n, t, t)
            .astype(jnp.float32)
        )
        return tiles, jnp.asarray(sxs)[bx], jnp.asarray(sys_)[by]

    @staticmethod
    def _sep_lookup(tiles, wx, wy, exact_weights: bool = False):
        """h[n, q] = wx[n, q, :] @ tiles[n] @ wy[n, q, :] on the MXU.

        The (N, Q, 48->128-lane-padded) weight operands are the dominant
        HBM traffic of every terrain lookup (~500 MB f32 per refresh at
        4096 envs, r5 terrain attribution), and the original
        HIGHEST-precision f32 einsum ran 6 MXU passes.

        Precision by weight kind (r5 microbench, .tpujobs/r5n_lookup.out):
        bilinear fractional weights (`tile_height_fn`) run at 3-pass HIGH —
        bf16x3 is f32-accurate and measured 17% faster than 6-pass HIGHEST;
        bf16 operands are NOT usable there (weight rounding scales with the
        full height, ~5 mm) nor worth it for the pure one-hot taps (a
        bit-exact hi/lo bf16 digit factorization measured ~8% SLOWER — the
        cost is the lane-padded one-hot operands, which XLA materializes
        either way, not MXU passes). One-hot taps keep HIGHEST: integer
        heights to ~2000 raw exceed bf16x3's exact range in the worst
        case, and HIGHEST measured within noise of HIGH here."""
        return jnp.einsum(
            "nqt,ntu,nqu->nq", wx, tiles, wy,
            precision=(
                jax.lax.Precision.HIGHEST if exact_weights
                else jax.lax.Precision.HIGH
            ),
        )

    def tile_height_fn(self, tiles, sx, sy, x: jax.Array, y: jax.Array):
        """Bilinear sample, == ``height_fn`` for queries inside the tile.

        ``x``/``y`` are (N, Q) world coordinates; the floor indices reduce
        to the global ones minus the integer tile starts, so fx/fy and the
        four corner values match ``height_fn`` bit-for-bit in-tile."""
        t = tiles.shape[-1]
        hs = self.height_samples
        px = jnp.clip((x + self._border_m) / self._hs, 0.0, hs.shape[0] - 2.0)
        py = jnp.clip((y + self._border_m) / self._hs, 0.0, hs.shape[1] - 2.0)
        lx = jnp.clip(px - sx[:, None].astype(px.dtype), 0.0, t - 2.0)
        ly = jnp.clip(py - sy[:, None].astype(py.dtype), 0.0, t - 2.0)
        x0 = jnp.floor(lx)
        y0 = jnp.floor(ly)
        fx = (lx - x0)[..., None]
        fy = (ly - y0)[..., None]
        ix = jnp.arange(t, dtype=px.dtype)
        wx = (ix == x0[..., None]) * (1.0 - fx) + (ix == x0[..., None] + 1.0) * fx
        wy = (ix == y0[..., None]) * (1.0 - fy) + (ix == y0[..., None] + 1.0) * fy
        return self._sep_lookup(tiles, wx, wy) * self._vs

    def tile_measured(self, tiles, sx, sy, x: jax.Array, y: jax.Array):
        """3-tap min sample, == ``measured_heights`` in-tile. The three
        exact taps are stacked along Q so the whole lookup is ONE einsum."""
        t = tiles.shape[-1]
        hs = self.height_samples
        px = jnp.clip(
            ((x + self._border_m) / self._hs).astype(jnp.int32), 0, hs.shape[0] - 2
        )
        py = jnp.clip(
            ((y + self._border_m) / self._hs).astype(jnp.int32), 0, hs.shape[1] - 2
        )
        lx = jnp.clip(px - sx[:, None], 0, t - 2)
        ly = jnp.clip(py - sy[:, None], 0, t - 2)
        ix = jnp.arange(t, dtype=jnp.int32)

        def oh(idx):
            return (ix == idx[..., None]).astype(tiles.dtype)

        wx = jnp.concatenate([oh(lx), oh(lx + 1), oh(lx)], axis=1)      # (N, 3Q, T)
        wy = jnp.concatenate([oh(ly), oh(ly), oh(ly + 1)], axis=1)
        h3 = self._sep_lookup(tiles, wx, wy, exact_weights=True).reshape(x.shape[0], 3, -1)
        return jnp.min(h3, axis=1) * self._vs

    def tile_measured_1tap(self, tiles_min, sx, sy, x: jax.Array, y: jax.Array):
        """== ``measured_heights`` in-tile, as ONE tap on an in-tile
        3-tap-min derived tile (:meth:`tile_min`) — one-hots a third the
        size of :meth:`tile_measured`'s (2.2 ms of the 7.9 ms terrain
        policy step at 4096 envs, r2 job24/job25)."""
        t = tiles_min.shape[-1]
        hs = self.height_samples
        px = jnp.clip(
            ((x + self._border_m) / self._hs).astype(jnp.int32), 0, hs.shape[0] - 2
        )
        py = jnp.clip(
            ((y + self._border_m) / self._hs).astype(jnp.int32), 0, hs.shape[1] - 2
        )
        lx = jnp.clip(px - sx[:, None], 0, t - 2)
        ly = jnp.clip(py - sy[:, None], 0, t - 2)
        ix = jnp.arange(t, dtype=jnp.int32)
        wx = (ix == lx[..., None]).astype(tiles_min.dtype)
        wy = (ix == ly[..., None]).astype(tiles_min.dtype)
        return self._sep_lookup(tiles_min, wx, wy, exact_weights=True) * self._vs

    # ------------------------------------------------------------------
    # riser-aware (trimesh-semantics) ground queries
    # ------------------------------------------------------------------

    @property
    def _thr(self):
        return (
            jnp.inf if self.slope_threshold_raw is None else self.slope_threshold_raw
        )

    def tile_ground_channels(self, tiles, sx, sy, x: jax.Array, y: jax.Array):
        """(N, Q) world queries -> (N, Q, 9) riser-aware ground channels
        (see :func:`riser_channels`) on the MXU tile path: the cell's four
        corners are four stacked one-hot taps in ONE einsum — and give the
        analytic in-cell gradient, so no finite-difference epsilon taps."""
        t = tiles.shape[-1]
        hs = self.height_samples
        px = jnp.clip((x + self._border_m) / self._hs, 0.0, hs.shape[0] - 2.0)
        py = jnp.clip((y + self._border_m) / self._hs, 0.0, hs.shape[1] - 2.0)
        lx = jnp.clip(px - sx[:, None].astype(px.dtype), 0.0, t - 2.0)
        ly = jnp.clip(py - sy[:, None].astype(py.dtype), 0.0, t - 2.0)
        x0 = jnp.floor(lx)
        y0 = jnp.floor(ly)
        fx = lx - x0
        fy = ly - y0
        ix = jnp.arange(t, dtype=px.dtype)

        def oh(idx):
            return (ix == idx[..., None]).astype(tiles.dtype)

        xb = jnp.maximum(x0 - 1.0, 0.0)
        yb = jnp.maximum(y0 - 1.0, 0.0)
        wx = jnp.concatenate(
            [oh(x0), oh(x0 + 1.0), oh(x0), oh(x0 + 1.0),
             oh(xb), oh(xb), oh(x0), oh(x0 + 1.0)], axis=1
        )
        wy = jnp.concatenate(
            [oh(y0), oh(y0), oh(y0 + 1.0), oh(y0 + 1.0),
             oh(y0), oh(y0 + 1.0), oh(yb), oh(yb)], axis=1
        )
        h8 = self._sep_lookup(tiles, wx, wy, exact_weights=True).reshape(x.shape[0], 8, -1)
        x0w = (sx[:, None].astype(px.dtype) + x0) * self._hs - self._border_m
        y0w = (sy[:, None].astype(py.dtype) + y0) * self._hs - self._border_m
        return riser_channels(
            h8[:, 0], h8[:, 1], h8[:, 2], h8[:, 3],
            h8[:, 4], h8[:, 5], h8[:, 6], h8[:, 7],
            x0w, y0w, fx, fy, self._hs, self._vs, self._thr
        )

    def ground_channels(self, x: jax.Array, y: jax.Array):
        """Scattered-gather version of :meth:`tile_ground_channels` (engine
        path / tests): world queries -> (..., 9) riser-aware channels."""
        hs = self.height_samples
        px = jnp.clip((x + self._border_m) / self._hs, 0.0, hs.shape[0] - 2.0)
        py = jnp.clip((y + self._border_m) / self._hs, 0.0, hs.shape[1] - 2.0)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        xi = x0.astype(jnp.int32)
        yi = y0.astype(jnp.int32)
        xb = jnp.maximum(xi - 1, 0)
        yb = jnp.maximum(yi - 1, 0)
        h00 = hs[xi, yi]
        h10 = hs[xi + 1, yi]
        h01 = hs[xi, yi + 1]
        h11 = hs[xi + 1, yi + 1]
        hxb0 = hs[xb, yi]
        hxb1 = hs[xb, yi + 1]
        hyb0 = hs[xi, yb]
        hyb1 = hs[xi + 1, yb]
        x0w = x0 * self._hs - self._border_m
        y0w = y0 * self._hs - self._border_m
        return riser_channels(
            h00, h10, h01, h11, hxb0, hxb1, hyb0, hyb1,
            x0w, y0w, fx, fy, self._hs, self._vs, self._thr
        )

    def sample_origins(self, key: jax.Array, num_envs: int, cfg):
        """Initial terrain level/type assignment (legged_robot.py:1167-1183)."""
        max_init = cfg.max_init_terrain_level if cfg.curriculum else cfg.num_rows - 1
        levels = jax.random.randint(key, (num_envs,), 0, max_init + 1, jnp.int32)
        types = jnp.floor(
            jnp.arange(num_envs) / (num_envs / cfg.num_cols)
        ).astype(jnp.int32)
        origins = self.terrain_origins[levels, types]
        return origins, levels, types
