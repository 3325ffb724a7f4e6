"""Covered-pixel shading compaction (render_mesh shade_cap): exactness vs
the dense path, gradient equality, and overflow counting.

The per-pixel chain (barycentrics + interpolate + shade) is the dominant
cost of reference-regime fitting (1000^2 renders, round-3 decomposition);
shade_cap runs it over compacted covered pixels only. The compact path must
be bit-exact (same math at every covered pixel, zeros elsewhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope='module')
def sphere_scene(request):
    tg = request.getfixturevalue('tiny_tet_grid')
    from meshdiffusion_tpu.geometry.marching_tets import (marching_tets,
                                                          compact_mesh)
    from meshdiffusion_tpu.render import mesh as mesh_mod
    from meshdiffusion_tpu.render import light as light_mod
    from meshdiffusion_tpu.render import utils as rutils
    from meshdiffusion_tpu.fitting.fit import default_material

    sdf = np.linalg.norm(tg.verts, axis=1).astype(np.float32) - 0.3
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    m = mesh_mod.Mesh(v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(f))
    m = mesh_mod.auto_normals(m)
    m.material = default_material()

    env = light_mod.create_trainable_env_rnd(16, scale=0.0, bias=0.5)
    env.build_mips()

    proj = rutils.perspective(np.deg2rad(45), 1.0, 0.1, 1000.0)
    mv = rutils.translate(0, 0, -2.0)
    mvp = jnp.asarray((proj @ mv)[None])
    campos = jnp.asarray(np.linalg.inv(mv)[None, :3, 3])
    return m, env, mvp, campos


def test_compact_pixels_roundtrip():
    from meshdiffusion_tpu.render.rasterize import (compact_pixels,
                                                    scatter_pixels)
    rng = np.random.default_rng(0)
    tri = jnp.asarray(np.where(rng.random((17, 23)) < 0.3,
                               rng.integers(0, 99, (17, 23)), -1), jnp.int32)
    n_cov = int((tri >= 0).sum())
    cap = 256                        # > n_cov: lossless roundtrip
    idx, selv, over = compact_pixels(tri, cap)
    assert int(over) == 0
    assert int(selv.sum()) == n_cov
    # scatter the compacted tri ids back: exact where covered
    vals = jnp.where(selv, tri.reshape(-1)[idx], 0).astype(jnp.float32)
    dense = scatter_pixels(vals, idx, selv, (17, 23), fill=-1.0)
    covered = np.asarray(tri) >= 0
    np.testing.assert_array_equal(np.asarray(dense)[covered],
                                  np.asarray(tri)[covered])
    np.testing.assert_array_equal(np.asarray(dense)[~covered], -1.0)
    # tiny cap: overflow counts the dropped covered pixels
    _, _, over2 = compact_pixels(tri, 4)
    assert int(over2) == n_cov - 4


def test_compact_matches_dense(sphere_scene):
    from meshdiffusion_tpu.render.render import render_mesh
    m, env, mvp, campos = sphere_scene
    H = W = 64
    kw = dict(resolution=(H, W), num_layers=2, raster_K=256, aa=True)
    dense = render_mesh(m, mvp, campos, env, **kw)
    compact = render_mesh(m, mvp, campos, env, shade_cap=H * W // 2, **kw)
    assert int(compact['shade_overflow']) == 0
    assert int(dense['mask'].sum()) > 50          # scene actually covers
    for k in dense:
        d, c = np.asarray(dense[k]), np.asarray(compact[k])
        assert d.shape == c.shape, k
        if d.dtype == bool:
            np.testing.assert_array_equal(d, c, err_msg=k)
        else:
            np.testing.assert_allclose(d, c, atol=1e-5, rtol=1e-5,
                                       err_msg=k)


def test_compact_gradients_match(sphere_scene):
    from meshdiffusion_tpu.render import mesh as mesh_mod
    from meshdiffusion_tpu.render.render import render_mesh
    m, env, mvp, campos = sphere_scene
    H = W = 48

    def loss(vp, cap):
        mm = mesh_mod.Mesh(v_pos=vp, t_pos_idx=m.t_pos_idx, v_nrm=m.v_nrm,
                           t_nrm_idx=m.t_nrm_idx, material=m.material)
        out = render_mesh(mm, mvp, campos, env, resolution=(H, W),
                          num_layers=2, raster_K=256, aa=True,
                          shade_cap=cap)
        return jnp.sum(out['shaded'] ** 2) + jnp.sum(out['depth'])

    g_d = jax.grad(lambda vp: loss(vp, None))(m.v_pos)
    g_c = jax.grad(lambda vp: loss(vp, H * W // 2))(m.v_pos)
    assert float(jnp.linalg.norm(g_d)) > 0
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_c),
                               atol=1e-4, rtol=1e-4)


def test_compact_overflow_counts(sphere_scene):
    from meshdiffusion_tpu.render.render import render_mesh
    m, env, mvp, campos = sphere_scene
    H = W = 64
    dense = render_mesh(m, mvp, campos, env, resolution=(H, W),
                        num_layers=2, raster_K=256, aa=False)
    n_cov = int(dense['mask'].sum())
    small = render_mesh(m, mvp, campos, env, resolution=(H, W),
                        num_layers=2, raster_K=256, aa=False, shade_cap=16)
    # layer-0 coverage dominates: the max over views/layers is layer 0's
    assert int(small['shade_overflow']) == n_cov - 16


def test_compact_branch_engages(sphere_scene):
    """A starved cap must visibly change the output — guards against the
    compaction silently not being threaded through the vmap (advisor
    round 4: pix_idx/pix_valid were computed but never passed to one_view,
    so every exactness test above compared dense against dense)."""
    from meshdiffusion_tpu.render.render import render_mesh
    m, env, mvp, campos = sphere_scene
    H = W = 64
    kw = dict(resolution=(H, W), num_layers=2, raster_K=256, aa=False)
    dense = render_mesh(m, mvp, campos, env, **kw)
    small = render_mesh(m, mvp, campos, env, shade_cap=16, **kw)
    n_cov = int(dense['mask'].sum())
    assert n_cov > 50
    # beyond-cap pixels scatter back as zeros: at most 16 shaded pixels
    # survive, so the starved image MUST differ from the dense one
    n_small = int((np.asarray(small['shaded'])[..., 3] > 0.5).sum())
    assert n_small <= 16
    assert not np.allclose(np.asarray(dense['shaded']),
                           np.asarray(small['shaded']))
