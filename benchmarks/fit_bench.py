"""Fit-step benchmark at the reference regime (1000^2, batch 4).

Times the jitted two-pass-style pass-1 fit step (render fwd+grad + adam)
on a synthetic sphere GT over the real 64 tet grid, with the shading
compaction on (shade_cap auto = H*W//4) vs off (dense), and prints one
JSON line per arm. Reference regime: nvdiffrec/configs/res64.json:6-7
(train_res [1000,1000], batch 4).

Usage: python benchmarks/fit_bench.py [--res 1000] [--batch 4]
       [--iters 8] [--caps auto,dense] [--pool 2] [--grid 64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--res', type=int, default=1000)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--caps', default='auto,dense')
    p.add_argument('--pool', type=int, default=2)
    p.add_argument('--grid', type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from meshdiffusion_tpu.fitting import fit as F
    from meshdiffusion_tpu.fitting.dataset import TargetRenderer
    from meshdiffusion_tpu.fitting.geometry import DMTetFitter
    from meshdiffusion_tpu.geometry.marching_tets import (marching_tets,
                                                          compact_mesh)
    from meshdiffusion_tpu.geometry.tet_grid import TetGrid
    from meshdiffusion_tpu.render import light as light_mod
    from meshdiffusion_tpu.render import mesh as mesh_mod

    tg = TetGrid.load(args.grid)
    sdf_gt = np.linalg.norm(tg.verts, axis=1).astype(np.float32) - 0.35
    v, f = compact_mesh(marching_tets(tg, jnp.asarray(tg.verts),
                                      jnp.asarray(sdf_gt)))
    ref = mesh_mod.Mesh(v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(f))
    lo, hi = mesh_mod.aabb(ref.v_pos)
    ref = mesh_mod.center_by_reference(ref, (np.asarray(lo), np.asarray(hi)),
                                       1.0)
    ref = mesh_mod.auto_normals(ref)
    ref.material = F.default_material()
    env = light_mod.create_trainable_env_rnd(64, scale=0.0, bias=0.5)
    env.build_mips()

    res = (args.res, args.res)
    t0 = time.perf_counter()
    renderer = TargetRenderer(ref_mesh=ref, envlight=env, cam_radius=3.0,
                              train_res=res, num_surface_samples=50000,
                              target_pool=args.pool)
    np_rng = np.random.default_rng(0)
    key = jax.random.key(0)
    key, k_t = jax.random.split(key)
    target = renderer.random_target(args.batch, np_rng, k_t)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1]
                 if hasattr(a, 'ravel') else a, target)
    t_pool = time.perf_counter() - t0

    for cap_name in args.caps.split(','):
        shade_cap = {'auto': -1, 'dense': 0}.get(
            cap_name, None)
        if shade_cap is None:
            shade_cap = int(cap_name)
        cfg = F.FitConfig(iter=5000, batch=args.batch, train_res=res,
                          dmtet_grid=args.grid, mesh_scale=1.1,
                          surface_samples=50000, normal_only=True,
                          learn_light=True, cam_radius=3.0,
                          shade_cap=shade_cap, target_pool=args.pool)
        fitter = DMTetFitter(grid=tg, scale=cfg.mesh_scale, deform_scale=2.0,
                             sdf_regularizer=0.2, total_iter=cfg.iter)
        state = fitter.init_state(jax.random.key(1))
        step, tx_geo, _, tx_lgt = F.make_fit_step(fitter, cfg, renderer,
                                                  None, 0)
        opt_geo = tx_geo.init({'sdf': state.sdf, 'deform': state.deform})
        light_base = env.base
        opt_lgt = tx_lgt.init(light_base)

        def one(it, state, light_base, opt_geo, opt_lgt, key):
            key, k_t, k_s = jax.random.split(key, 3)
            target = renderer.random_target(cfg.batch, np_rng, k_t)
            new = step(state, None, light_base, opt_geo, None, opt_lgt,
                       target, jnp.asarray(it, jnp.float32), k_s)
            state, _, light_base, opt_geo, _, opt_lgt, metrics = new
            return state, light_base, opt_geo, opt_lgt, key, metrics

        t0 = time.perf_counter()
        state, light_base, opt_geo, opt_lgt, key, metrics = one(
            0, state, light_base, opt_geo, opt_lgt, key)
        over = {k: int(metrics[k]) for k in
                ('raster_overflow', 'raster_overflow_global', 'aa_overflow',
                 'raster_overflow_live', 'shade_overflow')}
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        for it in range(1, args.iters + 1):
            state, light_base, opt_geo, opt_lgt, key, metrics = one(
                it, state, light_base, opt_geo, opt_lgt, key)
        loss = float(metrics['img_loss'])   # sync
        dt = (time.perf_counter() - t0) / args.iters

        print(json.dumps({
            'metric': 'fit_s_per_iter', 'arm': cap_name,
            'res': args.res, 'batch': args.batch,
            's_per_iter': round(dt, 3),
            'compile_s': round(t_compile, 1),
            'pool_prologue_s': round(t_pool, 1),
            'overflows_first_step': over,
            'img_loss_finite': bool(np.isfinite(loss)),
            'device': str(jax.devices()[0]),
        }), flush=True)


if __name__ == '__main__':
    main()
