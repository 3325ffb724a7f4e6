"""Batch mesh extraction: generated .npy grids -> smoothed .obj meshes.

Counterpart of reference ``nvdiffrec/eval.py:300-456`` minus the rendering
sanity PNG (see ``render/`` for that): per sample, gather SDF sign + deform
at the tet vertices, marching tets, Laplacian smoothing, .obj out. The
grid->mesh path is one jitted fixed-shape function; compaction and file I/O
happen on host.

Also covers ``nvdiffrec/eval_traj.py`` via ``extract_dir`` over trajectory
folders.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .geometry.marching_tets import marching_tets, compact_mesh
from .geometry.obj_io import write_obj
from .geometry.smoothing import laplacian_smooth
from .geometry.tet_grid import TetGrid

logger = logging.getLogger(__name__)


def make_grid_to_mesh(tet_grid: TetGrid, mesh_scale: float = 2.1,
                      deform_scale: float = 1.0, unnormalized_sdf: bool = False):
    """Jitted (R, R, R, 4) channels-last grid -> padded marching-tets mesh.

    The grid's big arrays ride as jit ARGUMENTS: closed-over constants are
    serialized into the program (the 128^3 grid's tet/edge tables are
    ~0.5 GB), which overflows the remote compile service's request-size
    limit (HTTP 413) and bloats the compile cache.
    """
    import dataclasses as _dc

    if tet_grid.num_tets > 2_000_000:
        # 128^3-scale grids additionally need the structure-of-arrays
        # marching tets: TPU layouts pad (T, 6)/(2T, 3) tables to 128
        # lanes, which costs ~17 GB HBM at T=12.6M (buffer-assignment
        # OOM, round 3)
        from .geometry.marching_tets import marching_tets_soa, soa_tables
        tables = soa_tables(tet_grid)
        c = np.asarray(tet_grid.vert_grid_coords, np.int32)
        coords = tuple(jnp.asarray(c[:, j]) for j in range(3))
        verts_T = jnp.asarray(np.ascontiguousarray(
            np.asarray(tet_grid.verts, np.float32).T))       # (3, V)
        coef = 2.0 / (tet_grid.resolution * 2) * deform_scale

        @jax.jit
        def fn_soa(grid, tables, coords, vT):
            cx, cy, cz = coords
            R = grid.shape[0]
            lin = (cx * R + cy) * R + cz
            sdf = grid[..., 0].reshape(-1)[lin]
            if not unnormalized_sdf:
                s = jnp.sign(sdf)
                sdf = jnp.where(s == 0, 1.0, s)
            v_pos_T = jnp.stack([
                vT[j] * mesh_scale
                + coef * jnp.clip(grid[..., 1 + j].reshape(-1)[lin],
                                  -1.0, 1.0) for j in range(3)])
            return marching_tets_soa(tables, v_pos_T, sdf)

        class _BoundSoA:
            soa = True

            def __call__(self, grid):
                return fn_soa(grid, tables, coords, verts_T)

            def lower(self, grid):
                return fn_soa.lower(grid, tables, coords, verts_T)

            @staticmethod
            def compact(out):
                from .geometry.marching_tets import compact_mesh_soa
                return compact_mesh_soa(*out)

        return _BoundSoA()

    arr_fields = ('verts', 'indices', 'unique_edges', 'tet_edge_to_unique',
                  'vert_grid_coords')
    arrs = {k: jnp.asarray(getattr(tet_grid, k)) for k in arr_fields}

    @jax.jit
    def fn(grid, arrs):
        tg = _dc.replace(tet_grid, **arrs)
        sdf, deform = tg.grid_to_tet(grid,
                                     normalize_sdf=not unnormalized_sdf)
        vpos = tg.deformed_verts(deform, scale=mesh_scale,
                                 deform_scale=deform_scale)
        return marching_tets(tg, vpos, sdf)

    class _Bound:
        """Callable with .lower(), the table arrays pre-bound."""
        soa = False

        def __call__(self, grid):
            return fn(grid, arrs)

        def lower(self, grid):
            return fn.lower(grid, arrs)

        @staticmethod
        def compact(out):
            return compact_mesh(out)

    return _Bound()


_GRID_TO_MESH_CACHE = {}


def extract_grid(grid: np.ndarray, tet_grid: TetGrid, out_path: str,
                 mesh_scale: float = 2.1, deform_scale: float = 1.0,
                 num_smooth_steps: int = 3, unnormalized_sdf: bool = False,
                 remesh: bool = True):
    """One (4, R, R, R) channel-first grid -> post-processed .obj.

    Post-process order mirrors reference eval.py:449-456: isotropic
    remeshing -> uniform Laplacian smoothing (num_smooth_steps) ->
    isotropic remeshing (``remesh=False`` keeps the raw marching-tets
    tessellation, smoothing only)."""
    key = (id(tet_grid), mesh_scale, deform_scale, unnormalized_sdf)
    if key not in _GRID_TO_MESH_CACHE:
        _GRID_TO_MESH_CACHE[key] = make_grid_to_mesh(
            tet_grid, mesh_scale, deform_scale, unnormalized_sdf)
    fn = _GRID_TO_MESH_CACHE[key]
    g = jnp.asarray(np.moveaxis(np.asarray(grid, np.float32), 0, -1))
    out = fn(g)
    verts, faces = fn.compact(out)
    if remesh and len(faces):
        from .geometry.remesh import isotropic_remesh
        verts, faces = isotropic_remesh(verts, faces)
    if num_smooth_steps > 0 and len(faces):
        verts = np.asarray(laplacian_smooth(jnp.asarray(verts),
                                            jnp.asarray(faces.astype(np.int32)),
                                            steps=num_smooth_steps))
    if remesh and len(faces):
        from .geometry.remesh import isotropic_remesh
        verts, faces = isotropic_remesh(verts, faces)
    write_obj(out_path, verts, faces)
    return verts, faces


def render_viz(verts: np.ndarray, faces: np.ndarray, out_png: str,
               angle_ind: int = 25, display_res=(512, 512),
               cam_radius: float = 3.0) -> None:
    """Sanity PNG of the raw mesh at a circular pose (reference
    eval.py:182-201,434-438: rotate_scene + validate_itr with the default
    diffuse material under a white environment)."""
    import jax.numpy as jnp
    from .render import mesh as mesh_mod
    from .render import utils as rutils
    from .render.light import EnvironmentLight
    from .render.material import default_material
    from .render.render import render_mesh

    m = mesh_mod.Mesh(v_pos=jnp.asarray(verts),
                      t_pos_idx=jnp.asarray(faces.astype(np.int32)),
                      material=default_material())
    m = mesh_mod.auto_normals(m)
    proj = rutils.perspective(np.deg2rad(45),
                              display_res[1] / display_res[0], 0.1, 1000.0)
    ang = (angle_ind / 50) * np.pi * 2
    mv = rutils.translate(0, 0, -cam_radius) @ (rutils.rotate_x(-0.4)
                                                @ rutils.rotate_y(ang))
    mvp = (proj @ mv)[None]
    campos = np.linalg.inv(mv)[:3, 3][None].astype(np.float32)
    light = EnvironmentLight(jnp.ones((6, 16, 16, 3)))
    light.build_mips()
    out = render_mesh(m, jnp.asarray(mvp), jnp.asarray(campos), light,
                      display_res, num_layers=1)
    img = rutils.rgb_to_srgb(out['shaded'][0, ..., :3])
    rutils.save_image(out_png, np.asarray(img))


def extract_batch(sample_path: str, out_dir: str, resolution: int = 64,
                  mesh_scale: float = 2.1, deform_scale: float = 1.0,
                  num_smooth_steps: int = 3, unnormalized_sdf: bool = False,
                  tet_root: Optional[str] = None, viz_name: str = 'viz',
                  save_viz: bool = False, angle_ind: int = 25,
                  remesh: bool = True):
    """All samples in one .npy batch file -> .obj meshes
    (reference eval.py:400-456)."""
    tg = TetGrid.load(resolution, tet_root)
    mesh_dir = os.path.join(out_dir, 'mesh')
    os.makedirs(mesh_dir, exist_ok=True)
    if save_viz:
        os.makedirs(os.path.join(out_dir, 'viz'), exist_ok=True)
    data_all = np.load(sample_path)
    logger.info('shape of generated data %s', data_all.shape)
    paths = []
    for i in range(data_all.shape[0]):
        p = os.path.join(mesh_dir, f'{i:06d}.obj')
        v, f = extract_grid(data_all[i], tg, p, mesh_scale, deform_scale,
                            num_smooth_steps, unnormalized_sdf, remesh=remesh)
        logger.info('%s: %d verts, %d faces', p, len(v), len(f))
        if save_viz and len(f):
            png = os.path.join(out_dir, 'viz', f'{viz_name}_{i:06d}.png')
            render_viz(v, f, png, angle_ind=angle_ind)
        paths.append(p)
    return paths


def extract_dir(sample_dir: str, out_dir: str, **kw):
    """Extract every .npy under sample_dir (trajectory eval,
    reference eval_traj.py:398-452)."""
    paths = []
    for k, f in enumerate(sorted(glob.glob(os.path.join(sample_dir, '*.npy')))):
        sub = os.path.join(out_dir, f'time{k:03d}')
        paths += extract_batch(f, sub, **kw)
    return paths
