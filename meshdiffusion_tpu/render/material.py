"""Materials: dict-like container plus .mtl load/save.

Counterpart of reference ``nvdiffrec/lib/render/material.py`` (Material
container:21-44, load_mtl:50-99, save_mtl:104-131, merge:142-198). A
Material is a plain dict pytree: keys 'bsdf' (static string), 'kd', 'ks',
'normal' (Texture2D), or 'kd_ks_normal' (neural texture module/params).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from . import texture
from . import utils


class Material(dict):
    """dict with attribute sugar; values are textures / strings."""

    def __init__(self, mat_dict=None):
        super().__init__(mat_dict or {})

    def copy(self) -> "Material":
        return Material(dict(self))


def load_mtl(fn: str, clear_ks: bool = True) -> List[Material]:
    """Parse a .mtl file (reference material.py:50-99): kd/ks textures or
    constants; kd loaded as sRGB->linear."""
    mtl_path = os.path.dirname(fn)
    materials = []
    mat: Optional[Material] = None
    with open(fn) as f:
        for line in f:
            split = line.split()
            if not split:
                continue
            prefix = split[0].lower()
            if prefix == 'newmtl':
                mat = Material({'name': split[1]})
                materials.append(mat)
            elif mat is None:
                continue
            elif prefix == 'bsdf':
                mat['bsdf'] = split[1]
            elif prefix == 'map_kd':
                mat['kd'] = texture.load_texture2D(
                    os.path.join(mtl_path, split[1]),
                    lambda_fn=utils.srgb_to_rgb)
            elif prefix == 'map_ks':
                mat['ks'] = texture.load_texture2D(
                    os.path.join(mtl_path, split[1]), channels=3)
            elif prefix == 'bump':
                mat['normal'] = texture.load_texture2D(
                    os.path.join(mtl_path, split[1]),
                    lambda_fn=lambda x: x * 2 - 1, channels=3)
            elif prefix == 'kd':
                mat['kd'] = texture.Texture2D(
                    np.asarray([float(v) for v in split[1:4]], np.float32))
            elif prefix == 'ks':
                mat['ks'] = texture.Texture2D(
                    np.asarray([float(v) for v in split[1:4]], np.float32))
    for mat in materials:
        mat.setdefault('bsdf', 'pbr')
        if 'kd' not in mat:
            mat['kd'] = texture.Texture2D(np.ones(3, np.float32))
        if 'ks' not in mat or clear_ks:
            mat['ks'] = texture.Texture2D(np.zeros(3, np.float32))
    return materials


def save_mtl(fn: str, material: Material) -> None:
    """Write a .mtl + texture PNGs (reference material.py:104-131)."""
    folder = os.path.dirname(fn)
    with open(fn, 'w') as f:
        f.write('newmtl defaultMat\n')
        if material is not None:
            f.write(f"bsdf   {material.get('bsdf', 'pbr')}\n")
            if 'kd' in material and isinstance(material['kd'], texture.Texture2D):
                f.write('map_Kd texture_kd.png\n')
                texture.save_texture2D(os.path.join(folder, 'texture_kd.png'),
                                       texture.rgb_to_srgb(material['kd']))
            if 'ks' in material and isinstance(material['ks'], texture.Texture2D):
                f.write('map_Ks texture_ks.png\n')
                texture.save_texture2D(os.path.join(folder, 'texture_ks.png'),
                                       material['ks'])
            if 'normal' in material and isinstance(material['normal'], texture.Texture2D):
                f.write('bump texture_n.png\n')
                texture.save_texture2D(
                    os.path.join(folder, 'texture_n.png'), material['normal'],
                    lambda_fn=lambda x: (utils.safe_normalize(x) + 1) * 0.5)
        else:
            f.write('Kd 1 1 1\nKs 0 0 0\nKa 0 0 0\n')
        f.write('Tf 1 1 1\nNi 1\nNs 0\n')


def default_material(kd=(0.75, 0.3, 0.6), bsdf: str = 'diffuse') -> Material:
    """The constant diffuse material used by extraction viz
    (reference eval.py:422-428)."""
    return Material({
        'name': '_default_mat',
        'bsdf': bsdf,
        'kd': texture.Texture2D(np.asarray(kd, np.float32)),
        'ks': texture.Texture2D(np.asarray([0.0, 0.0, 0.0], np.float32)),
    })


def merge_materials(materials: List[Material], texcoords, tfaces, mfaces):
    """Merge per-face materials into one atlas material
    (reference material.py:142-198). Only needed for multi-material OBJ
    import; textures are stacked side-by-side in u."""
    assert len(materials) > 0
    if len(materials) == 1:
        return materials[0], texcoords, tfaces
    # uniform texture resolution
    def res(m):
        return m['kd'].res if 'kd' in m else (1, 1)
    H = max(r[0] for r in (res(m) for m in materials))
    W = max(r[1] for r in (res(m) for m in materials))
    import jax.numpy as jnp
    kds, kss = [], []
    for m in materials:
        kd = m['kd'].get_mips()[0]
        ks = m['ks'].get_mips()[0]
        kd = utils.scale_img_nhwc(kd, (H, W)) if kd.shape[1:3] != (H, W) else kd
        ks = utils.scale_img_nhwc(ks, (H, W)) if ks.shape[1:3] != (H, W) else ks
        kds.append(kd[0])
        kss.append(ks[0])
    kd_atlas = jnp.concatenate(kds, axis=1)[None]
    ks_atlas = jnp.concatenate(kss, axis=1)[None]

    tc = np.asarray(texcoords, np.float32).copy()
    tf = np.asarray(tfaces)
    mf = np.asarray(mfaces)
    n = len(materials)
    # remap u into the face's material column
    new_tc = tc[tf.reshape(-1)]
    scale = np.repeat(mf, 3).astype(np.float32)
    new_tc[:, 0] = (new_tc[:, 0] + scale) / n
    new_tf = np.arange(len(new_tc)).reshape(-1, 3)

    merged = Material({
        'name': 'merged',
        'bsdf': materials[0].get('bsdf', 'pbr'),
        'kd': texture.Texture2D(kd_atlas),
        'ks': texture.Texture2D(ks_atlas),
    })
    return merged, new_tc, new_tf
