"""UV parameterization + texture baking (xatlas / eval.py:96-128
counterpart): chart injectivity, atlas bounds, bake round trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.geometry.uv_unwrap import parametrize


def sphere(tg, r=0.3):
    from meshdiffusion_tpu.geometry.marching_tets import (marching_tets,
                                                          compact_mesh)
    sdf = np.linalg.norm(tg.verts, axis=1).astype(np.float32) - r
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    return np.asarray(v), np.asarray(f)


def test_parametrize_contract(tiny_tet_grid):
    v, f = sphere(tiny_tet_grid)
    vmapping, tfaces, uvs = parametrize(v, f)
    assert tfaces.shape == f.shape            # aligned with t_pos_idx
    assert uvs.shape == (len(vmapping), 2)
    assert uvs.min() >= 0.0 and uvs.max() <= 1.0
    # every new vertex maps to a real vertex; every face consistent:
    # positions looked up through the atlas equal the originals
    np.testing.assert_array_equal(
        v[vmapping.astype(np.int64)][tfaces.astype(np.int64)],
        v[f])


def test_parametrize_low_overlap(tiny_tet_grid):
    """Charts must not stack on top of each other: summed UV triangle area
    is close to the rasterized union coverage."""
    from meshdiffusion_tpu.render.rasterize import rasterize
    v, f = sphere(tiny_tet_grid)
    _, tfaces, uvs = parametrize(v, f)
    res = 256
    a = uvs[tfaces[:, 0].astype(np.int64)] * res
    b = uvs[tfaces[:, 1].astype(np.int64)] * res
    c = uvs[tfaces[:, 2].astype(np.int64)] * res
    tri_area = 0.5 * np.abs((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    uv_clip = jnp.asarray(np.concatenate(
        [uvs * 2.0 - 1.0, np.zeros((len(uvs), 1)), np.ones((len(uvs), 1))],
        axis=1, dtype=np.float32))
    rast = rasterize(uv_clip, jnp.asarray(tfaces.astype(np.int32)),
                     (res, res))[0]
    covered = float(np.asarray(rast.valid).sum())
    assert covered > 0
    # union coverage within 20% of summed areas -> essentially no stacking
    assert tri_area.sum() < covered * 1.2, (tri_area.sum(), covered)
    # decent packing: charts fill a reasonable fraction of the atlas
    assert covered / (res * res) > 0.2


def test_bake_and_export(tiny_tet_grid, tmp_path):
    from meshdiffusion_tpu.fitting.export import export_baked
    from meshdiffusion_tpu.fitting.fit import make_mlp_material
    from meshdiffusion_tpu.render import mesh as mesh_mod
    from meshdiffusion_tpu.render.mlptexture import BoundTexture3D

    v, f = sphere(tiny_tet_grid)
    m = mesh_mod.Mesh(v_pos=jnp.asarray(v),
                      t_pos_idx=jnp.asarray(f.astype(np.int32)))
    m = mesh_mod.auto_normals(m)
    aabb = (v.min(0) - 0.1, v.max(0) + 0.1)
    module, params = make_mlp_material(aabb)
    obj_path = export_baked(m, BoundTexture3D(module, params),
                            str(tmp_path / 'baked'), texture_res=(128, 128))
    assert os.path.exists(obj_path)
    assert os.path.exists(str(tmp_path / 'baked/mesh.mtl'))
    kds = [p for p in os.listdir(tmp_path / 'baked') if 'kd' in p]
    assert kds, os.listdir(tmp_path / 'baked')
    txt = open(obj_path).read()
    assert ' vt ' in txt or '\nvt ' in txt
