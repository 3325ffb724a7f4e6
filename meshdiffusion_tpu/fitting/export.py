"""Baked-texture mesh export (reference ``nvdiffrec/eval.py:96-128``).

``uv_unwrap.parametrize`` (the xatlas equivalent) lays the extracted mesh
out in a UV atlas; ``render.render_uv`` rasterizes the charts in UV space
sampling the learned MLP material at the interpolated 3D positions; texels
outside any chart are filled by seam dilation (xatlas bakers do the same to
survive bilinear filtering); the result is a Texture2D kd/ks/normal
material written alongside the OBJ.
"""

from __future__ import annotations

import logging
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry.uv_unwrap import parametrize
from ..render import material as material_mod
from ..render import mesh as mesh_mod
from ..render import obj as obj_mod
from ..render import texture as texture_mod
from ..render.render import render_uv

logger = logging.getLogger(__name__)

# MLP material channel ranges (reference eval.py:134-142)
_KD_MIN, _KD_MAX = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
_KS_MIN, _KS_MAX = (0.0, 0.08, 0.0), (1.0, 1.0, 1.0)
_NRM_MIN, _NRM_MAX = (-1.0, -1.0, 0.0), (1.0, 1.0, 1.0)


def dilate_texels(img: np.ndarray, mask: np.ndarray, steps: int = 8
                  ) -> np.ndarray:
    """Flood chart colors outward into empty texels (seam padding)."""
    img = img.copy()
    filled = mask.astype(bool).copy()
    for _ in range(steps):
        if filled.all():
            break
        acc = np.zeros_like(img)
        cnt = np.zeros(img.shape[:2], img.dtype)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            src_f = np.roll(filled, (dy, dx), (0, 1))
            src_i = np.roll(img, (dy, dx), (0, 1))
            # roll wraps; mask the wrapped border
            if dy == 1:
                src_f[0] = False
            elif dy == -1:
                src_f[-1] = False
            if dx == 1:
                src_f[:, 0] = False
            elif dx == -1:
                src_f[:, -1] = False
            acc += src_i * src_f[..., None]
            cnt += src_f
        new = ~filled & (cnt > 0)
        img[new] = acc[new] / cnt[new][..., None]
        filled |= new
    return img


def uvmap_mesh(eval_mesh: mesh_mod.Mesh, mlp_texture, texture_res=(1024, 1024)
               ) -> mesh_mod.Mesh:
    """xatlas_uvmap equivalent: UV-parameterize + bake MLP material.

    Returns a new Mesh with v_tex/t_tex_idx and a Texture2D material
    (reference eval.py:96-128).
    """
    v = np.asarray(eval_mesh.v_pos)
    f = np.asarray(eval_mesh.t_pos_idx)
    vmapping, t_tex_idx, uvs = parametrize(v, f)
    logger.info('uv atlas: verts %d -> %d', len(v), len(vmapping))

    new_mesh = mesh_mod.Mesh.combine(
        eval_mesh, v_tex=jnp.asarray(uvs),
        t_tex_idx=jnp.asarray(t_tex_idx.astype(np.int32)))

    mask, kd, ks, normal = render_uv(new_mesh, texture_res, mlp_texture)
    m2 = np.asarray(mask[..., 0])
    kd = dilate_texels(np.asarray(kd), m2)
    ks = dilate_texels(np.asarray(ks), m2)
    normal = dilate_texels(np.asarray(normal), m2)

    new_mesh.material = material_mod.Material({
        'name': 'baked',
        'bsdf': (eval_mesh.material['bsdf']
                 if eval_mesh.material is not None else 'pbr'),
        'kd': texture_mod.Texture2D(kd, min_max=(np.asarray(_KD_MIN),
                                                 np.asarray(_KD_MAX))),
        'ks': texture_mod.Texture2D(ks, min_max=(np.asarray(_KS_MIN),
                                                 np.asarray(_KS_MAX))),
        'normal': texture_mod.Texture2D(normal,
                                        min_max=(np.asarray(_NRM_MIN),
                                                 np.asarray(_NRM_MAX))),
    })
    return new_mesh


def export_baked(eval_mesh: mesh_mod.Mesh, mlp_texture, out_folder: str,
                 texture_res=(1024, 1024)) -> str:
    """Bake + write mesh.obj/mesh.mtl/textures (reference eval.py:385-398)."""
    baked = uvmap_mesh(eval_mesh, mlp_texture, texture_res)
    return obj_mod.write_obj(out_folder, baked, save_material=True)
