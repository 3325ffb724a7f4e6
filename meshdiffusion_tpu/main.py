"""CLI entry point (counterpart of reference main_diffusion.py:13-25).

Usage:
  python -m meshdiffusion_tpu.main --config res64 --mode train \
      --config.training.train_dir /path/out --config.data.meta_path meta.json
  python -m meshdiffusion_tpu.main --config res64 --mode uncond_gen \
      --config.eval.eval_dir out/ --config.eval.ckpt_path ckpts/
  python -m meshdiffusion_tpu.main --config res64 --mode cond_gen \
      --config.eval.partial_dmtet_path partial.pt
  python -m meshdiffusion_tpu.main --mode extract --sample_path out/0.npy \
      --out_dir meshes/

``--config`` accepts a preset name (res64/res128) or a python file exposing
``get_config()`` like the reference's configs/.
"""

from __future__ import annotations

import importlib.util
import logging
import os
import sys


def _load_config(spec: str):
    from .config import get_config
    if spec in ('res64', 'res128', 'default'):
        return get_config(spec)
    # python file with get_config(), reference-style
    import os
    if not os.path.isfile(spec):
        raise SystemExit(
            f"--config {spec!r}: not a preset (res64/res128/default) "
            f"and no such config file")
    modspec = importlib.util.spec_from_file_location('user_config', spec)
    mod = importlib.util.module_from_spec(modspec)
    modspec.loader.exec_module(mod)
    return mod.get_config()


def _apply_overrides(config, overrides):
    """--config.a.b=value dotted overrides (reference ml_collections flags)."""
    for key, val in overrides:
        node = config
        parts = key.split('.')
        for p in parts[:-1]:
            node = getattr(node, p)
        old = getattr(node, parts[-1])
        if isinstance(old, bool):
            val = val.lower() in ('1', 'true', 'yes')
        elif isinstance(old, int):
            val = int(val)
        elif isinstance(old, float):
            val = float(val)
        elif isinstance(old, tuple):
            val = tuple(int(x) for x in val.strip('()').split(',') if x)
        setattr(node, parts[-1], val)
    return config


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')

    import argparse
    parser = argparse.ArgumentParser('meshdiffusion_tpu')
    parser.add_argument('--config', default='res64',
                        help='preset name or config .py file')
    parser.add_argument('--mode', required=True,
                        choices=['train', 'uncond_gen', 'uncond_gen_interp',
                                 'cond_gen', 'extract', 'extract_traj',
                                 'fit_dmtets', 'fit_singleview'])
    parser.add_argument('--idx', default='0')
    parser.add_argument('--seed', type=int, default=None)
    # extract-mode flags (reference nvdiffrec/eval.py argparse)
    parser.add_argument('--sample_path', default=None)
    parser.add_argument('--out_dir', default='./viz_tet')
    parser.add_argument('--resolution', type=int, default=64)
    parser.add_argument('--mesh_scale', type=float, default=2.1)
    parser.add_argument('--deform_scale', type=float, default=1.0)
    parser.add_argument('--num_smooth_steps', type=int, default=3)
    parser.add_argument('--no_remesh', action='store_true',
                        help='extract: skip the isotropic remeshing '
                        'post-process (reference eval.py:449-456)')
    parser.add_argument('--unnormalized_sdf', action='store_true')
    parser.add_argument('--save_viz', action='store_true',
                        help='extract: also render a sanity PNG per mesh')
    parser.add_argument('--traj', action='store_true',
                        help='uncond_gen: save x0-prediction trajectory')
    parser.add_argument('--angle_ind', type=int, default=25)
    # fitting flags (reference nvdiffrec argparse)
    parser.add_argument('--meta_path', default=None,
                        help='fit modes: json list of mesh paths, or one .obj')
    parser.add_argument('--fit_config', default=None,
                        help='fit modes: nvdiffrec-style json config')
    parser.add_argument('--iter', type=int, default=5000)
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--index', type=int, default=0)
    parser.add_argument('--split_size', type=int, default=1)

    # split off dotted --config.x=y overrides before argparse sees them
    overrides, rest = [], []
    for a in argv:
        if a.startswith('--config.'):
            k, _, v = a[len('--config.'):].partition('=')
            overrides.append((k, v))
        else:
            rest.append(a)
    args = parser.parse_args(rest)

    if args.mode == 'extract_traj':
        from .extract import extract_dir
        assert args.sample_path, '--sample_path (a directory) required'
        extract_dir(args.sample_path, args.out_dir,
                    resolution=args.resolution, mesh_scale=args.mesh_scale,
                    deform_scale=args.deform_scale,
                    num_smooth_steps=args.num_smooth_steps)
        return

    if args.mode == 'extract':
        from .extract import extract_batch
        assert args.sample_path, '--sample_path required for extract'
        extract_batch(args.sample_path, args.out_dir,
                      resolution=args.resolution, mesh_scale=args.mesh_scale,
                      deform_scale=args.deform_scale,
                      num_smooth_steps=args.num_smooth_steps,
                      unnormalized_sdf=args.unnormalized_sdf,
                      save_viz=args.save_viz, angle_ind=args.angle_ind,
                      remesh=not args.no_remesh)
        return

    if args.mode in ('fit_dmtets', 'fit_singleview'):
        import json as _json
        from .fitting.fit import FitConfig, fit_one_mesh
        assert args.meta_path, '--meta_path required for fit modes'
        fcfg = FitConfig(iter=args.iter, batch=args.batch)
        if args.fit_config:
            with open(args.fit_config) as f:
                for k, v in _json.load(f).items():
                    if hasattr(fcfg, k):
                        setattr(fcfg, k, tuple(v) if isinstance(v, list) else v)
        if args.meta_path.endswith('.obj'):
            mesh_list = [args.meta_path]
        else:
            with open(args.meta_path) as f:
                mesh_list = _json.load(f)
        if args.mode == 'fit_singleview':
            from .fitting.singleview import fit_singleview
            fit_singleview(mesh_list[args.index], fcfg, args.out_dir,
                           angle_ind=args.angle_ind, seed=args.seed or 0)
        else:
            for k in range(args.split_size):
                gi = k + args.index * args.split_size
                if gi >= len(mesh_list):
                    break
                done = os.path.join(args.out_dir,
                                    f'tets/dmt_dict_{gi:05d}.pt')
                if os.path.exists(done) or os.path.exists(
                        done.replace('.pt', '.npz')):
                    continue
                try:
                    fit_one_mesh(mesh_list[gi], fcfg, args.out_dir, gi,
                                 seed=args.seed or 0)
                except Exception:
                    import traceback
                    logging.error('fit %d failed\n%s', gi,
                                  traceback.format_exc())
                    continue
        return

    config = _apply_overrides(_load_config(args.config), overrides)

    if args.mode == 'train':
        from .diffusion.trainer import train
        train(config)
    elif args.mode == 'uncond_gen':
        from .diffusion.evaler import uncond_gen
        uncond_gen(config, idx=args.idx, seed=args.seed,
                   return_traj=args.traj)
    elif args.mode == 'uncond_gen_interp':
        from .diffusion.evaler import uncond_gen_interp
        uncond_gen_interp(config, idx=args.idx, seed=args.seed)
    elif args.mode == 'cond_gen':
        from .diffusion.evaler import cond_gen
        cond_gen(config, save_fname=args.idx, seed=args.seed)


if __name__ == '__main__':
    main()
