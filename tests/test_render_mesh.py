"""Integration: marching-tets sphere -> render_mesh -> sane G-buffers."""

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.geometry.marching_tets import marching_tets, compact_mesh
from meshdiffusion_tpu.render import mesh as M
from meshdiffusion_tpu.render import utils as U
from meshdiffusion_tpu.render.light import EnvironmentLight
from meshdiffusion_tpu.render.material import default_material
from meshdiffusion_tpu.render.render import render_mesh


def sphere_mesh(tiny_tet_grid):
    tg = tiny_tet_grid
    sdf = 0.35 - np.linalg.norm(tg.verts, axis=1).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    m = M.Mesh(v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(f.astype(np.int32)),
               material=default_material())
    return M.auto_normals(m)


def camera(radius=2.0, res=64):
    proj = U.perspective(np.deg2rad(45), 1.0, 0.1, 1000.0)
    mv = U.translate(0, 0, -radius) @ U.rotate_x(-0.4)
    mvp = proj @ mv
    campos = np.linalg.inv(mv)[:3, 3]
    return jnp.asarray(mvp[None]), jnp.asarray(campos[None].astype(np.float32))


def test_render_sphere_buffers(tiny_tet_grid):
    m = sphere_mesh(tiny_tet_grid)
    mvp, campos = camera()
    light = EnvironmentLight(jnp.ones((6, 16, 16, 3)))
    light.build_mips()
    res = (64, 64)
    out = render_mesh(m, mvp, campos, light, res, num_layers=2)

    alpha = np.asarray(out['shaded'][..., 3])
    assert alpha.shape == (1, 64, 64)
    cover = alpha.mean()
    # sphere of radius .35 at distance 2, fov 45: covers a moderate area
    assert 0.02 < cover < 0.5

    # shaded color inside = kd * irradiance(=1) = kd
    rgb = np.asarray(out['shaded'][..., :3])
    inside = alpha > 0.5
    assert inside.sum() > 50
    np.testing.assert_allclose(rgb[inside].mean(0), [0.75, 0.3, 0.6], atol=0.05)

    # depth (not antialiased) follows the HARD coverage: inside the
    # rasterized mask it is the surface band, outside exactly background
    hard = np.asarray(out['mask'][..., 0]) > 0.5
    d = np.asarray(out['depth'][..., 0])
    assert (d[hard] > 1.4).all() and (d[hard] < 2.4).all()
    assert np.allclose(d[~hard], 20.0)  # background

    # shading normals are finite; mostly unit-length (the two-sided bend
    # lerp legitimately shrinks magnitude at grazing pixels, reference
    # bsdf.py:34-35 does not renormalize either)
    # (median: the AA'd composite legitimately blends normals across
    # facet boundaries and silhouettes of this very coarse sphere)
    n = np.asarray(out['normal'][..., :3])
    norms = np.linalg.norm(n[inside], axis=-1)
    assert np.isfinite(norms).all()
    assert np.percentile(np.abs(norms - 1.0), 50) < 0.05
    assert norms.max() < 1.05

    # second layer: back of the sphere, strictly farther
    d2 = np.asarray(out['depth_second'][..., 0])
    both = inside & (d2 > 0)
    assert both.sum() > 30
    assert (d2[both] > d[both]).all()


def test_render_visible_tets(tiny_tet_grid):
    tg = tiny_tet_grid
    m = sphere_mesh(tiny_tet_grid)
    mvp, campos = camera()
    light = EnvironmentLight(jnp.ones((6, 16, 16, 3)))
    light.build_mips()
    centers = jnp.asarray(tg.verts[tg.indices].mean(axis=1))
    out = render_mesh(m, mvp, campos, light, (64, 64), num_layers=1,
                      tet_centers=centers)
    vis = np.asarray(out['visible_tet_mask'])
    assert vis.dtype == bool and vis.shape == (tg.num_tets,)
    # conservative visibility: some but not all tets qualify (the
    # neighborhood-min test excludes anything behind the front surface or
    # within the dilation band of the silhouette, reference render.py:377-386)
    assert 0.05 < vis.mean() < 0.9

    depth_c = np.linalg.norm(np.asarray(centers) - np.asarray(campos[0]), axis=1)
    near = depth_c < np.percentile(depth_c, 10)
    far = depth_c > np.percentile(depth_c, 90)
    # tets in front of the surface are visible far more often than the
    # farthest (occluded) ones
    assert vis[near].mean() > 0.6
    assert vis[near].mean() > vis[far].mean() + 0.3


def test_render_gradients_to_vertices(tiny_tet_grid):
    m = sphere_mesh(tiny_tet_grid)
    mvp, campos = camera(res=32)
    light = EnvironmentLight(jnp.ones((6, 16, 16, 3)))
    light.build_mips()

    def loss(v_pos):
        m2 = M.auto_normals(M.Mesh(v_pos=v_pos, t_pos_idx=m.t_pos_idx,
                                   material=m.material))
        out = render_mesh(m2, mvp, campos, light, (32, 32), num_layers=1)
        return jnp.mean(out['depth'][..., 0] * out['alpha'][..., 0])

    g = jax.grad(loss)(m.v_pos)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
