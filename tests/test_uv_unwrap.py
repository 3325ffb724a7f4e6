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


def helix_strip(turns=2.0, pitch=0.18, n_theta=48, n_r=3):
    """A shallow helical ramp: every face normal is +z-dominant (one normal
    bin, edge-connected -> ONE chart pre-split), yet its (x, y) projection
    double-covers an annulus — the staircase counterexample to naive
    bin-projection injectivity."""
    th = np.linspace(0.0, 2 * np.pi * turns, n_theta)
    rr = np.linspace(0.5, 1.0, n_r)
    T, R = np.meshgrid(th, rr, indexing='ij')
    v = np.stack([R * np.cos(T), R * np.sin(T),
                  T * pitch / (2 * np.pi)], axis=-1).reshape(-1, 3)
    f = []
    for i in range(n_theta - 1):
        for j in range(n_r - 1):
            a = i * n_r + j
            b = (i + 1) * n_r + j
            f += [[a, b, a + 1], [b, b + 1, a + 1]]
    return v.astype(np.float32), np.asarray(f, np.int64)


def test_overlapping_chart_is_split_injective():
    """The helix projects +z and self-overlaps: parametrize must split it
    until the final atlas has no double-covered texel (xatlas guarantee)."""
    from meshdiffusion_tpu.geometry.uv_unwrap import chart_overlaps
    v, f = helix_strip()
    # sanity: the raw +z projection of the whole surface DOES overlap
    assert chart_overlaps(v[:, :2].astype(np.float64), f), \
        'fixture no longer self-overlapping; tighten the helix'
    vmapping, tfaces, uvs = parametrize(v, f)
    # contract still holds after splitting
    np.testing.assert_array_equal(
        v[vmapping.astype(np.int64)][tfaces.astype(np.int64)], v[f])
    # the atlas as a whole is injective: no double-covered point anywhere
    assert not chart_overlaps(uvs.astype(np.float64) * 1024.0,
                              tfaces.astype(np.int64))


def test_sphere_atlas_globally_injective(tiny_tet_grid):
    """Whole-atlas double-cover check on the standard fixture (stronger
    than the 20%-area heuristic above)."""
    from meshdiffusion_tpu.geometry.uv_unwrap import chart_overlaps
    v, f = sphere(tiny_tet_grid)
    _, tfaces, uvs = parametrize(v, f)
    assert not chart_overlaps(uvs.astype(np.float64) * 1024.0,
                              tfaces.astype(np.int64))


def test_bake_fidelity_vs_mlp(tiny_tet_grid):
    """Texels looked up through the baked atlas match the MLP material
    evaluated at the corresponding 3D points (reference eval.py bakes with
    xatlas + dr.texture; PSNR gate catches chart overlap / seam bleed)."""
    from meshdiffusion_tpu.fitting.export import uvmap_mesh
    from meshdiffusion_tpu.fitting.fit import make_mlp_material
    from meshdiffusion_tpu.render import mesh as mesh_mod
    from meshdiffusion_tpu.render.mlptexture import BoundTexture3D

    v, f = sphere(tiny_tet_grid)
    m = mesh_mod.Mesh(v_pos=jnp.asarray(v),
                      t_pos_idx=jnp.asarray(f.astype(np.int32)))
    m = mesh_mod.auto_normals(m)
    aabb = (v.min(0) - 0.1, v.max(0) + 0.1)
    module, params = make_mlp_material(aabb)
    tex3d = BoundTexture3D(module, params)
    baked = uvmap_mesh(m, tex3d, texture_res=(256, 256))

    # sample at face centroids: UV via the atlas, 3D via the mesh
    tf = np.asarray(baked.t_tex_idx)
    uv = np.asarray(baked.v_tex)
    cen_uv = jnp.asarray(uv[tf].mean(axis=1))          # (F, 2)
    cen_3d = jnp.asarray(v[f].mean(axis=1))            # (F, 3)
    kd_baked = np.asarray(baked.material['kd'].sample(cen_uv[None, None]))[0, 0]
    ref = np.asarray(tex3d.sample(cen_3d))[..., :3]
    mse = float(np.mean((kd_baked[..., :3] - ref) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    # bilinear texel quantization at 256^2 bounds the error; overlap or
    # seam corruption craters this to < 20 dB
    assert psnr > 30.0, psnr


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
