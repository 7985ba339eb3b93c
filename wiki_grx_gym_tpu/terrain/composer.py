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

    def sample_origins(self, key: jax.Array, num_envs: int, cfg):
        """Initial terrain level/type assignment (legged_robot.py:1167-1183)."""
        max_init = cfg.max_init_terrain_level if cfg.curriculum else cfg.num_rows - 1
        levels = jax.random.randint(key, (num_envs,), 0, max_init + 1, jnp.int32)
        types = jnp.floor(
            jnp.arange(num_envs) / (num_envs / cfg.num_cols)
        ).astype(jnp.int32)
        origins = self.terrain_origins[levels, types]
        return origins, levels, types
