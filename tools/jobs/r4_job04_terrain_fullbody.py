"""Round-4 job 04: terrain-lookup micro-attribution + full-body validation.

1. Micro-benchmark the heightfield/trimesh lookup primitives at 4096 envs
   (VERDICT item 5: heightfield 1.49M -> >=2M, trimesh 0.84M -> >=1.2M):
     - tile extraction (block-pyramid row gather + f32 convert)
     - tile_min derivation
     - measured-grid 1-tap one-hot einsum (121 queries)
     - contact-point 5-tap plane sampling (145 queries)
     - riser 9-channel query (232 one-hot taps)
   and variants: bf16 one-hots (exact for pure 0/1 taps), a fine 24-cell
   second pyramid for the measurement grid, take-rows gather.
2. Full heightfield/trimesh training-iteration bench for reference.
3. GR1T1_full (32-DOF) 2000-iter training + plane eval (VERDICT item 9,
   job02's attempt was lost to a TPU hang).
4. Heightfield wz-by-terrain-level eval with CORRECT level pinning
   (VERDICT item 7) on a freshly trained heightfield policy.
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from tools.jobs.r4_job02_reval import (
    PLANE_COMMANDS,
    TERRAIN_COMMANDS,
    eval_tracking,
    train_run,
)


def out(_tag, **kw):
    print(json.dumps({"tag": _tag, **kw}), flush=True)


def time_fn(fn, *args, iters=50, warmup=3):
    o = None
    for _ in range(warmup):
        o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def terrain_micro(mesh_type="heightfield", n=4096):
    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, _ = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = n
    env_cfg.terrain.mesh_type = mesh_type
    env_cfg.terrain.curriculum = True
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    ter = env.terrain
    state = env.init_state(jax.random.PRNGKey(0))
    phys = state.physics
    base_xy = phys.base_pos[:, :2]

    # world-frame query sets
    H = env.num_height_points
    pts = jnp.concatenate(
        [env.height_points, jnp.zeros((H, 1))], axis=-1
    )
    from wiki_grx_gym_tpu.utils import maths

    world = maths.quat_apply_yaw(
        phys.base_quat[:, None, :], jnp.broadcast_to(pts, (n, H, 3))
    ) + phys.base_pos[:, None, :]
    mx, my = world[..., 0], world[..., 1]

    P = env.model.num_points
    pp = phys.base_pos[:, None, :] + maths.quat_apply(
        jnp.broadcast_to(phys.base_quat[:, None, :], (n, P, 4)),
        jnp.broadcast_to(env._default_point_rel, (n, P, 3)),
    )
    px, py = pp[..., 0], pp[..., 1]

    ex = jax.jit(lambda xy: ter.extract_tiles(xy))
    t_extract = time_fn(ex, base_xy)
    tiles, sx, sy = ex(base_xy)

    t_tmin = time_fn(jax.jit(ter.tile_min), tiles)
    tiles_min = ter.tile_min(tiles)

    t_meas = time_fn(
        jax.jit(lambda tm, a, b, c, d: ter.tile_measured_1tap(tm, a, b, c, d)),
        tiles_min, sx, sy, mx, my,
    )

    t_planes = time_fn(
        jax.jit(lambda: env._sample_point_planes(pp, tiles=(tiles, sx, sy)))
    )

    out("terrain_micro", mesh=mesh_type,
        extract_ms=round(t_extract * 1e3, 3),
        tile_min_ms=round(t_tmin * 1e3, 3),
        measured121_ms=round(t_meas * 1e3, 3),
        point_planes_ms=round(t_planes * 1e3, 3),
        P=P, H=H)

    # ---- variants (heightfield only) ----
    if mesh_type != "heightfield":
        return

    # (a) bf16 one-hots for the PURE 1-tap measured lookup (0/1 exact)
    def meas_bf16(tm, sx_, sy_, x, y):
        t = tm.shape[-1]
        hs = ter.height_samples
        pxi = jnp.clip(((x + ter._border_m) / ter._hs).astype(jnp.int32), 0, hs.shape[0] - 2)
        pyi = jnp.clip(((y + ter._border_m) / ter._hs).astype(jnp.int32), 0, hs.shape[1] - 2)
        lx = jnp.clip(pxi - sx_[:, None], 0, t - 2)
        ly = jnp.clip(pyi - sy_[:, None], 0, t - 2)
        ix = jnp.arange(t, dtype=jnp.int32)
        wx = (ix == lx[..., None]).astype(jnp.bfloat16)
        wy = (ix == ly[..., None]).astype(jnp.bfloat16)
        return jnp.einsum("nqt,ntu,nqu->nq", wx, tm, wy,
                          precision=jax.lax.Precision.HIGHEST) * ter._vs

    got = jax.jit(meas_bf16)(tiles_min, sx, sy, mx, my)
    want = ter.tile_measured_1tap(tiles_min, sx, sy, mx, my)
    exact = bool(jnp.all(got == want))
    t_meas_bf16 = time_fn(jax.jit(meas_bf16), tiles_min, sx, sy, mx, my)
    out("variant", name="measured_bf16_onehot", ms=round(t_meas_bf16 * 1e3, 3),
        exact=exact)

    # (b) row gather via flat take (contiguous 192 B rows), column via dot
    def meas_rows(tm, sx_, sy_, x, y):
        t = tm.shape[-1]
        hs = ter.height_samples
        pxi = jnp.clip(((x + ter._border_m) / ter._hs).astype(jnp.int32), 0, hs.shape[0] - 2)
        pyi = jnp.clip(((y + ter._border_m) / ter._hs).astype(jnp.int32), 0, hs.shape[1] - 2)
        lx = jnp.clip(pxi - sx_[:, None], 0, t - 2)
        ly = jnp.clip(pyi - sy_[:, None], 0, t - 2)
        flat = tm.reshape(-1, t)
        rows = jnp.take(flat, jnp.arange(x.shape[0])[:, None] * t + lx, axis=0)
        ix = jnp.arange(t, dtype=jnp.int32)
        wy = (ix == ly[..., None]).astype(jnp.bfloat16)
        return jnp.einsum("nqt,nqt->nq", rows, wy,
                          precision=jax.lax.Precision.HIGHEST) * ter._vs

    got = jax.jit(meas_rows)(tiles_min, sx, sy, mx, my)
    exact_r = bool(jnp.all(got == want))
    t_meas_rows = time_fn(jax.jit(meas_rows), tiles_min, sx, sy, mx, my)
    out("variant", name="measured_row_take", ms=round(t_meas_rows * 1e3, 3),
        exact=exact_r)

    # (c) fine second pyramid for the measurement grid: the 121 points span
    # +-0.71 m; a 24-cell tile on an 8-cell stride reaches +-(1.2-0.4) m
    fine = {}

    def fine_pyramid(tile, stride):
        key = (tile, stride)
        if key not in fine:
            hs = ter.height_field_raw
            hp = np.pad(hs, ((0, max(tile - hs.shape[0], 0)),
                             (0, max(tile - hs.shape[1], 0))), mode="edge")
            h, w = hp.shape
            nbx = (h + stride - 1) // stride
            nby = (w + stride - 1) // stride
            sxs = np.clip(np.arange(nbx) * stride - (tile - stride) // 2, 0, h - tile)
            sys_ = np.clip(np.arange(nby) * stride - (tile - stride) // 2, 0, w - tile)
            blocks = np.empty((nbx * nby, tile * tile), np.int16)
            for i, sxv in enumerate(sxs):
                for j, syv in enumerate(sys_):
                    blocks[i * nby + j] = hp[sxv: sxv + tile, syv: syv + tile].ravel()
            fine[key] = (jnp.asarray(blocks), jnp.asarray(sxs, jnp.int32),
                         jnp.asarray(sys_, jnp.int32), nby)
        return fine[key]

    def meas_fine(xy, x, y, tile=24, stride=8):
        blocks, sxs, sys_, nby = fine_pyramid(tile, stride)
        pxc = (xy[:, 0] + ter._border_m) / ter._hs
        pyc = (xy[:, 1] + ter._border_m) / ter._hs
        bx = jnp.clip((pxc / stride).astype(jnp.int32), 0, sxs.shape[0] - 1)
        by = jnp.clip((pyc / stride).astype(jnp.int32), 0, sys_.shape[0] - 1)
        tl = jnp.take(blocks, bx * nby + by, axis=0).reshape(-1, tile, tile).astype(jnp.float32)
        tm = ter.tile_min(tl)
        sx_, sy_ = sxs[bx], sys_[by]
        t = tile
        hs = ter.height_samples
        pxi = jnp.clip(((x + ter._border_m) / ter._hs).astype(jnp.int32), 0, hs.shape[0] - 2)
        pyi = jnp.clip(((y + ter._border_m) / ter._hs).astype(jnp.int32), 0, hs.shape[1] - 2)
        lx = jnp.clip(pxi - sx_[:, None], 0, t - 2)
        ly = jnp.clip(pyi - sy_[:, None], 0, t - 2)
        ix = jnp.arange(t, dtype=jnp.int32)
        wx = (ix == lx[..., None]).astype(jnp.bfloat16)
        wy = (ix == ly[..., None]).astype(jnp.bfloat16)
        return jnp.einsum("nqt,ntu,nqu->nq", wx, tm, wy,
                          precision=jax.lax.Precision.HIGHEST) * ter._vs

    got = jax.jit(functools.partial(meas_fine))(base_xy, mx, my)
    exact_f = bool(jnp.all(got == want))
    t_meas_fine = time_fn(jax.jit(functools.partial(meas_fine)), base_xy, mx, my)
    out("variant", name="measured_fine24_bf16", ms=round(t_meas_fine * 1e3, 3),
        exact=exact_f, note="includes its own extraction+tile_min")


def rollout_scan_micro(n=4096, T=64):
    """In-scan per-step attribution of the plane rollout (the tunnel's
    ~1.5-3 ms dispatch latency makes single-call timing useless; each
    phase is timed as a 64-iteration lax.scan inside ONE jit)."""
    from wiki_grx_gym_tpu.envs import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs("GR1T1")
    env_cfg.env.num_envs = n
    env, _ = task_registry.make_env("GR1T1", env_cfg=env_cfg)
    from wiki_grx_gym_tpu.learn.runner import OnPolicyRunner

    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    state = runner.init_state(init_at_random_ep_len=True)
    es = state.env_state
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (n, env.num_actions))
    delay = jnp.zeros((n,))
    extra = {
        "commands": es.commands[:, :3],
        "last_last_actions": es.last_last_actions,
        "feet_air_time": es.feet_air_time,
        "feet_land_time": es.feet_land_time,
        "feet_contact_last": es.feet_contact_last.astype(jnp.float32),
    }

    def kernel_scan(phys):
        def step(p, _):
            p2, *_rest = env._pallas_decimation(
                p, actions, actions, es.motor_strength, delay, es.rand,
                last_qd=es.last_dof_vel, plane=None, extra=extra,
            )
            return p2, None
        return jax.lax.scan(step, phys, None, length=T)[0]

    t_kernel = time_fn(jax.jit(kernel_scan), es.physics, iters=10)

    net, params = runner.net, state.ppo.params

    def policy_scan(obs):
        def step(o, _):
            a, logp, mu, sigma = net.act(params, o, jax.random.PRNGKey(0))
            v = net.evaluate(params, state.critic_obs)
            # data dependence so the loop body cannot be hoisted
            o = o * (1.0 + 1e-12 * v[:, None]) + 1e-12 * jnp.pad(
                a, ((0, 0), (0, o.shape[1] - a.shape[1]))
            )
            return o, None
        return jax.lax.scan(step, obs, None, length=T)[0]

    t_policy = time_fn(jax.jit(policy_scan), state.obs, iters=10)

    def env_scan(st):
        def step(s, _):
            s2, o = env.step(s, actions)
            return s2, None
        return jax.lax.scan(step, st, None, length=T)[0]

    t_env = time_fn(jax.jit(env_scan), es, iters=10)

    rollout = jax.jit(
        lambda st: runner._rollout(st.env_state, st.obs, st.critic_obs,
                                   st.ppo.params, st.rng)[0]
    )
    t_roll = time_fn(rollout, state, iters=10)

    out("rollout_scan_micro", num_envs=n, T=T,
        kernel_scan_ms=round(t_kernel * 1e3, 2),
        policy_scan_ms=round(t_policy * 1e3, 2),
        env_step_scan_ms=round(t_env * 1e3, 2),
        full_rollout_ms=round(t_roll * 1e3, 2),
        post_xla_ms=round((t_env - t_kernel) * 1e3, 2),
        storage_rng_ms=round((t_roll - t_env - t_policy) * 1e3, 2))


def main():
    out("env", platform=jax.devices()[0].platform)

    rollout_scan_micro()

    terrain_micro("heightfield")
    terrain_micro("trimesh")

    for mesh in ("heightfield", "trimesh"):
        r = bench.bench_config(4096, 10, mesh_type=mesh)
        out("perf", mesh=mesh, fps=round(r["fps"], 1),
            iter_ms=round(r["iter_ms"], 2),
            collection_ms=round(r["collection_ms"], 2),
            learn_ms=round(r["learn_ms"], 2))

    # full-body (VERDICT item 9)
    params = train_run("full_body", iters=2000, task="GR1T1_full")
    eval_tracking(params, "GR1T1_full", None, PLANE_COMMANDS)

    # heightfield wz-by-level with corrected pinning (VERDICT item 7)
    params = train_run("heightfield", mesh_type="heightfield")
    eval_tracking(params, "GR1T1", "heightfield", TERRAIN_COMMANDS)
    for level in (0, 2, 4, 6, 8):
        eval_tracking(params, "GR1T1", "heightfield",
                      [("wz=+0.8", 0.0, 0.0, 0.8, 2),
                       ("vx=+0.4", 0.4, 0.0, 0.0, 0)],
                      level=level)

    out("done")


if __name__ == "__main__":
    main()
