"""Mesh ops, textures, lights, cameras: unit + oracle tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meshdiffusion_tpu.render import mesh as M
from meshdiffusion_tpu.render import texture as T
from meshdiffusion_tpu.render import light as L
from meshdiffusion_tpu.render import utils as U


def _octa():
    verts = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    faces = np.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                        [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    return verts, faces


def test_auto_normals_octahedron():
    v, f = _octa()
    m = M.auto_normals(M.Mesh(v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(f)))
    n = np.asarray(m.v_nrm)
    # vertex normals of an octahedron point along the vertex directions
    np.testing.assert_allclose(n, v / np.linalg.norm(v, axis=1, keepdims=True),
                               atol=1e-5)


def test_auto_normals_padded_faces_ignored():
    v, f = _octa()
    fpad = np.concatenate([f, [[0, 0, 0]] * 3]).astype(np.int32)
    mask = np.concatenate([np.ones(len(f), bool), np.zeros(3, bool)])
    m1 = M.auto_normals(M.Mesh(v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(f)))
    m2 = M.auto_normals(M.Mesh(v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(fpad),
                               face_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(np.asarray(m1.v_nrm), np.asarray(m2.v_nrm),
                               atol=1e-6)


def test_compute_tangents_orthogonal():
    v, f = _octa()
    uv = np.random.default_rng(0).random((6, 2)).astype(np.float32)
    m = M.Mesh(v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(f),
               v_tex=jnp.asarray(uv), t_tex_idx=jnp.asarray(f))
    m = M.auto_normals(m)
    m = M.compute_tangents(m)
    t = np.asarray(m.v_tng)
    n = np.asarray(m.v_nrm)
    assert np.abs((t * n).sum(-1)).max() < 1e-4
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-4)


def test_texture_sample_bilinear_exact():
    img = np.zeros((1, 4, 4, 1), np.float32)
    img[0, 1, 2, 0] = 1.0
    tex = T.Texture2D(img)
    # sample exactly at texel center (2.5/4, 1.5/4)
    uv = jnp.asarray([[(2 + 0.5) / 4, (1 + 0.5) / 4]])
    out = np.asarray(tex.sample(uv, filter_mode='linear'))
    np.testing.assert_allclose(out, [[1.0]], atol=1e-6)


def test_texture_mip_chain_and_clamp():
    img = np.random.default_rng(0).random((1, 8, 8, 3)).astype(np.float32)
    tex = T.Texture2D(img, min_max=[np.zeros(3, np.float32),
                                    np.full(3, 0.5, np.float32)])
    mips = tex.get_mips()
    assert [m.shape[1] for m in mips] == [8, 4, 2, 1]
    np.testing.assert_allclose(np.asarray(mips[-1])[0, 0, 0],
                               img.mean(axis=(0, 1, 2)), atol=1e-5)
    clamped = tex.clamp()
    assert float(np.asarray(clamped.data).max()) <= 0.5


def test_texture_trilinear_selects_coarser_mip():
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, ::2, ::2, 0] = 1.0  # checker: mip1 everywhere 0.25-ish
    tex = T.Texture2D(img)
    uv = jnp.full((4, 2), 0.5)
    big_deriv = jnp.full((4, 4), 1.0)      # huge footprint -> coarsest mip
    out = np.asarray(tex.sample(uv, big_deriv))
    np.testing.assert_allclose(out, 0.25, atol=0.01)


def test_diffuse_cubemap_uniform_invariant():
    cm = jnp.ones((6, 16, 16, 3))
    out = np.asarray(L.diffuse_cubemap(cm))
    np.testing.assert_allclose(out, 1.0, atol=1e-4)


def test_diffuse_cubemap_directional():
    cm = np.zeros((6, 16, 16, 3), np.float32)
    cm[0] = 1.0  # +x face bright
    out = np.asarray(L.diffuse_cubemap(jnp.asarray(cm)))
    # +x face center sees max irradiance; -x face sees ~0
    assert out[0, 8, 8, 0] > 0.4
    assert out[1, 8, 8, 0] < 0.05


def test_specular_cubemap_sharpens_with_low_roughness():
    cm = np.zeros((6, 16, 16, 3), np.float32)
    cm[0, 8, 8] = 1.0
    lo = np.asarray(L.specular_cubemap(jnp.asarray(cm), 0.1))
    hi = np.asarray(L.specular_cubemap(jnp.asarray(cm), 1.0))
    assert lo[0].max() > hi[0].max()  # low roughness concentrates energy


def test_environment_light_shade_diffuse():
    light = L.EnvironmentLight(jnp.ones((6, 32, 32, 3)))
    light.build_mips()
    B, H, W = 1, 4, 4
    pos = jnp.zeros((B, H, W, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, H, W, 1))
    kd = jnp.full((B, H, W, 3), 0.5)
    ks = jnp.zeros((B, H, W, 3))
    out = np.asarray(light.shade(pos, nrm, kd, ks, jnp.ones((B, H, W, 3))))
    np.testing.assert_allclose(out, 0.5, atol=1e-3)


def test_cubemap_roundtrip_latlong():
    rng = np.random.default_rng(0)
    ll = rng.random((64, 128, 3)).astype(np.float32)
    cm = U.latlong_to_cubemap(jnp.asarray(ll), (64, 64))
    back = np.asarray(U.cubemap_to_latlong(cm, (64, 128)))
    # smooth-ish roundtrip: means match closely
    np.testing.assert_allclose(back.mean(), ll.mean(), atol=0.02)


def test_camera_matrices():
    p = U.perspective(0.7854, 1.0, 0.1, 1000.0)
    assert p.shape == (4, 4)
    assert p[3, 2] == -1.0
    mv = U.translate(0, 0, -3) @ (U.rotate_x(-0.4) @ U.rotate_y(0.5))
    campos = np.linalg.inv(mv)[:3, 3]
    assert np.linalg.norm(campos) == pytest.approx(3.0, abs=1e-5)
    la = U.lookAt(np.asarray([0, 0, 3.0]), np.zeros(3), np.asarray([0, 1.0, 0]))
    pt = la @ np.asarray([0, 0, 0, 1.0])
    np.testing.assert_allclose(pt, [0, 0, -3, 1], atol=1e-6)


def test_srgb_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((4, 4, 3)), jnp.float32)
    y = U.srgb_to_rgb(U.rgb_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / 'x.png')
    U.save_image(p, img)
    back = U.load_image(p)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)
