"""Rasterizer tests vs a brute-force per-pixel numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.render.rasterize import (rasterize, interpolate,
                                                bin_triangles, antialias)
from meshdiffusion_tpu.render import utils as rutils


def oracle_raster(v_clip, faces, res):
    """Brute force: for each pixel test every triangle, keep min depth."""
    H, W = res
    w = v_clip[:, 3]
    x = (v_clip[:, 0] / w * 0.5 + 0.5) * W
    y = (v_clip[:, 1] / w * 0.5 + 0.5) * H
    z = v_clip[:, 2] / w
    tri_id = -np.ones((H, W), np.int64)
    zbuf = np.full((H, W), 1e30)
    for t, f in enumerate(faces):
        ax, ay, az = x[f[0]], y[f[0]], z[f[0]]
        bx, by, bz = x[f[1]], y[f[1]], z[f[1]]
        cx, cy, cz = x[f[2]], y[f[2]], z[f[2]]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if abs(area) < 1e-12:
            continue
        for py in range(H):
            for px in range(W):
                qx, qy = px + 0.5, py + 0.5
                w0 = (cx - bx) * (qy - by) - (cy - by) * (qx - bx)
                w1 = (ax - cx) * (qy - cy) - (ay - cy) * (qx - cx)
                w2 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
                pos = w0 >= 0 and w1 >= 0 and w2 >= 0
                neg = w0 <= 0 and w1 <= 0 and w2 <= 0
                if not (pos or neg):
                    continue
                l0, l1 = w0 / area, w1 / area
                zz = l0 * az + l1 * bz + (1 - l0 - l1) * cz
                if -1 <= zz <= 1 and zz < zbuf[py, px]:
                    zbuf[py, px] = zz
                    tri_id[py, px] = t
    return tri_id, zbuf


def two_triangles():
    """Two triangles, the second in front of (closer than) the first."""
    v = np.array([
        [-0.5, -0.5, 0.5, 1.0], [0.5, -0.5, 0.5, 1.0], [0.0, 0.6, 0.5, 1.0],
        [-0.2, -0.2, 0.0, 1.0], [0.6, -0.2, 0.0, 1.0], [0.2, 0.5, 0.0, 1.0],
    ], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return v, f


def test_coverage_matches_oracle():
    v, f = two_triangles()
    res = (40, 40)
    layers = rasterize(jnp.asarray(v), jnp.asarray(f), res)
    got_tri = np.asarray(layers[0].tri_id)
    ref_tri, ref_z = oracle_raster(v, f, res)
    np.testing.assert_array_equal(got_tri, ref_tri)
    got_z = np.asarray(layers[0].zbuf)
    m = ref_tri >= 0
    np.testing.assert_allclose(got_z[m], ref_z[m], atol=1e-5)


def test_depth_peeling_second_layer():
    v, f = two_triangles()
    res = (40, 40)
    l0, l1 = rasterize(jnp.asarray(v), jnp.asarray(f), res, num_layers=2)
    t0 = np.asarray(l0.tri_id)
    t1 = np.asarray(l1.tri_id)
    overlap = (t0 == 1)
    ref_tri, _ = oracle_raster(v, f[:1], res)  # only triangle 0
    behind = (ref_tri == 0) & overlap
    assert behind.sum() > 0
    # wherever both triangles cover, layer 2 sees the far one (id 0)
    np.testing.assert_array_equal(t1[behind], 0)
    # layer-2 depth strictly greater
    assert (np.asarray(l1.zbuf)[behind] > np.asarray(l0.zbuf)[behind]).all()


def test_interpolation_barycentric_values():
    v, f = two_triangles()
    res = (32, 32)
    layers = rasterize(jnp.asarray(v), jnp.asarray(f), res)
    rast = layers[0]
    # interpolating the vertex positions reproduces pixel-center x/y
    attr = jnp.asarray(v[:, :2])
    xy = np.asarray(interpolate(attr, rast, jnp.asarray(f)))
    valid = np.asarray(rast.valid)
    ys, xs = np.nonzero(valid)
    # pixel center in NDC: ((px+0.5)/W - 0.5) * 2
    ndc_x = ((xs + 0.5) / res[1] - 0.5) * 2
    ndc_y = ((ys + 0.5) / res[0] - 0.5) * 2
    np.testing.assert_allclose(xy[ys, xs, 0], ndc_x, atol=1e-4)
    np.testing.assert_allclose(xy[ys, xs, 1], ndc_y, atol=1e-4)


def test_perspective_correct_interpolation():
    """A triangle with varying w: interpolation must be rational, not linear."""
    v = np.array([[-0.8, -0.8, 0.0, 1.0],
                  [0.8, -0.8, 0.0, 1.0],
                  [0.0, 0.8, 0.0, 4.0]], np.float32)
    v[2, :3] *= 4.0  # same NDC position, bigger w
    f = np.array([[0, 1, 2]], np.int32)
    res = (32, 32)
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), res)[0]
    attr = jnp.asarray([[0.0], [0.0], [1.0]], jnp.float32)
    out = np.asarray(interpolate(attr, rast, jnp.asarray(f)))
    valid = np.asarray(rast.valid)
    assert valid.sum() > 50
    # at the bottom edge midpoint the value is 0; near the top vertex -> 1.
    # perspective-correct: value at the screen-space midpoint toward the
    # top vertex is LESS than 0.5 (w=4 pulls weight away)
    H, W = res
    mid_row = valid[H // 2]
    if mid_row.any():
        vals = out[H // 2, mid_row, 0]
        assert vals.mean() < 0.5


def test_gradients_flow_to_vertices():
    v, f = two_triangles()
    res = (24, 24)

    def loss(verts):
        rast = rasterize(verts, jnp.asarray(f), res)[0]
        img = interpolate(verts[:, :3], rast, jnp.asarray(f))
        return jnp.sum(img ** 2)

    g = jax.grad(loss)(jnp.asarray(v))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_face_mask_excludes():
    v, f = two_triangles()
    res = (32, 32)
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), res,
                     face_mask=jnp.asarray([True, False]))[0]
    assert not (np.asarray(rast.tri_id) == 1).any()
    assert (np.asarray(rast.tri_id) == 0).any()


def test_binning_counts():
    v, f = two_triangles()
    res = (64, 64)
    w = np.asarray(v[:, 3])
    x = (v[:, 0] / w * 0.5 + 0.5) * res[1]
    y = (v[:, 1] / w * 0.5 + 0.5) * res[0]
    xs = jnp.asarray(np.stack([x[f[:, k]] for k in range(3)], 1))
    ys = jnp.asarray(np.stack([y[f[:, k]] for k in range(3)], 1))
    tile_tris, counts, gtris, gcount = bin_triangles(
        xs, ys, jnp.asarray([True, True]), res, K=8)
    # both triangles land somewhere (tile lists or the global big list)
    assert int(counts.sum()) + int(gcount) >= 2
    assert (np.asarray(tile_tris) < 2).all()


def test_empty_scene():
    v = np.array([[0.0, 0.0, 0.0, -1.0]] * 3, np.float32)  # behind camera
    f = np.array([[0, 1, 2]], np.int32)
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), (16, 16))[0]
    assert not np.asarray(rast.valid).any()


def test_bin_overflow_reported():
    """A tiny K triggers the overflow counter; large K reports zero."""
    rng = np.random.default_rng(0)
    # many triangles stacked in one tile
    centers = rng.uniform(-0.05, 0.05, (40, 2)).astype(np.float32)
    v = []
    f = []
    for i, c in enumerate(centers):
        v += [[c[0], c[1], 0.1, 1.0], [c[0] + 0.05, c[1], 0.1, 1.0],
              [c[0], c[1] + 0.05, 0.1, 1.0]]
        f.append([3 * i, 3 * i + 1, 3 * i + 2])
    v = jnp.asarray(np.asarray(v, np.float32))
    f = jnp.asarray(np.asarray(f, np.int32))
    small = rasterize(v, f, (32, 32), K=8)[0]
    big = rasterize(v, f, (32, 32), K=64)[0]
    assert int(small.bin_overflow) > 0
    assert int(big.bin_overflow) == 0


def test_screen_filling_triangle():
    """A triangle spanning many tiles (> SPAN per axis) must rasterize
    exactly via the global big-triangle list."""
    v = np.array([[-3.0, -3.0, 0.0, 1.0],
                  [3.0, -3.0, 0.0, 1.0],
                  [0.0, 4.0, 0.0, 1.0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    res = (128, 128)  # 4x4 tiles at TILE=32
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), res)[0]
    ref_tri, _ = oracle_raster(v, f, res)
    np.testing.assert_array_equal(np.asarray(rast.tri_id), ref_tri)
    assert np.asarray(rast.valid).all()  # fills the whole screen
    assert int(rast.bin_overflow) == 0


def test_mixed_big_and_small_triangles():
    """Big (global-binned) and small (tile-binned) triangles z-resolve
    together exactly."""
    v = np.array([
        # huge far triangle
        [-3.0, -3.0, 0.8, 1.0], [3.0, -3.0, 0.8, 1.0], [0.0, 4.0, 0.8, 1.0],
        # small near triangle
        [-0.2, -0.2, -0.5, 1.0], [0.3, -0.2, -0.5, 1.0], [0.0, 0.3, -0.5, 1.0],
    ], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    res = (96, 96)
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), res)[0]
    ref_tri, _ = oracle_raster(v, f, res)
    np.testing.assert_array_equal(np.asarray(rast.tri_id), ref_tri)
    assert (ref_tri == 1).any() and (ref_tri == 0).any()


def _aa_coverage(v, f, res):
    """Hard coverage image passed through the analytic edge AA."""
    rast = rasterize(v, f, res)[0]
    img = rast.valid.astype(jnp.float32)[..., None]
    return antialias(img, rast, v, f)


def test_antialias_softens_edges_only():
    v, f = two_triangles()
    res = (32, 32)
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), res)[0]
    hard = np.asarray(rast.valid, np.float32)[..., None]
    soft = np.asarray(_aa_coverage(jnp.asarray(v), jnp.asarray(f), res))
    diff = np.abs(soft - hard)[..., 0]
    assert diff.max() > 0.05          # some edge pixels got blended
    # each direction blends at most half the pair difference; a corner
    # pixel can receive both directions
    assert diff.max() <= 1.0 + 1e-5
    # interior pixels (all 4-neighbors same tri) unchanged
    tri = np.asarray(rast.tri_id)
    interior = np.ones_like(tri, bool)
    interior[1:] &= tri[1:] == tri[:-1]
    interior[:-1] &= tri[:-1] == tri[1:]
    interior[:, 1:] &= tri[:, 1:] == tri[:, :-1]
    interior[:, :-1] &= tri[:, :-1] == tri[:, 1:]
    np.testing.assert_array_equal(soft[interior], hard[interior])


def test_antialias_gradient_matches_area_derivative():
    """Coverage-sum gradients through the AA pass match the analytic
    (shoelace) area derivative — the dr.antialias contract: geometry
    gradients through pixel coverage."""
    f = np.array([[0, 1, 2]], np.int32)
    res = (64, 64)
    H, W = res
    px = W / 2.0   # pixels per NDC unit

    # vertical silhouette edge between v0 and v1; apex at v2 (off
    # half-pixel alignment so no crossing sits exactly on a relu kink)
    v0 = np.array([[-0.513, -0.507, 0.0, 1.0],
                   [-0.513, 0.493, 0.0, 1.0],
                   [0.5, 0.013, 0.0, 1.0]], np.float32)
    ypx = (v0[:, 1] * 0.5 + 0.5) * H

    def L(shift):
        verts = jnp.asarray(v0).at[0, 0].add(shift).at[1, 0].add(shift)
        return jnp.sum(_aa_coverage(verts, jnp.asarray(f), res))

    # shoelace: moving v0.x and v1.x together changes |A| by
    # -(y1-y0)/2 px^2 per px (diagonals pivot at the apex)
    g = float(jax.grad(L)(jnp.asarray(0.0)))
    expected = -0.5 * (ypx[1] - ypx[0]) * px
    assert abs(g - expected) / abs(expected) < 0.2, (g, expected)

    def L2(dx):
        verts = jnp.asarray(v0).at[2, 0].add(dx)
        return jnp.sum(_aa_coverage(verts, jnp.asarray(f), res))

    g2 = float(jax.grad(L2)(jnp.asarray(0.0)))
    expected2 = 0.5 * (ypx[1] - ypx[0]) * px
    assert abs(g2 - expected2) / abs(expected2) < 0.2, (g2, expected2)


def test_antialias_gradient_zero_when_static():
    """Interior color edits don't create spurious geometry gradients."""
    v, f = two_triangles()
    res = (24, 24)
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), res)[0]
    img = jnp.ones((res[0], res[1], 3)) * 0.5  # constant image

    def L(verts):
        return jnp.sum(antialias(img, rast, verts, jnp.asarray(f)))

    g = np.asarray(jax.grad(L)(jnp.asarray(v)))
    # constant color on both sides of every edge -> zero coverage gradient
    np.testing.assert_allclose(g, 0.0, atol=1e-5)


def test_uv_derivatives_analytic_matches_finite_differences():
    """The rast_db equivalent: analytic (du/dx, du/dy, dv/dx, dv/dy) of the
    perspective-correct uv interpolation equals central differences of the
    interpolated uv image in triangle interiors (nvdiffrast texture.py mip
    path contract)."""
    from meshdiffusion_tpu.render.rasterize import (interpolate,
                                                    uv_derivatives_analytic)
    # one big perspective triangle (distinct w per vertex)
    v = np.array([[-0.9, -0.8, 0.2, 1.4],
                  [0.95, -0.7, 0.1, 0.8],
                  [0.0, 0.9, 0.3, 1.1]], np.float32)
    v = v * np.array([[1.4], [0.8], [1.1]], np.float32)  # clip = w * ndc
    f = np.array([[0, 1, 2]], np.int32)
    uv = np.array([[0.1, 0.2], [0.9, 0.15], [0.45, 0.95]], np.float32)
    res = (64, 64)
    rast = rasterize(jnp.asarray(v), jnp.asarray(f), res)[0]
    texc = np.asarray(interpolate(jnp.asarray(uv), rast, jnp.asarray(f)))
    db = np.asarray(uv_derivatives_analytic(
        jnp.asarray(uv), rast, jnp.asarray(v), jnp.asarray(f), res))
    valid = np.asarray(rast.valid)
    # strict interior: pixels whose 4 neighbors are all covered
    inner = valid.copy()
    inner[1:] &= valid[:-1]
    inner[:-1] &= valid[1:]
    inner[:, 1:] &= valid[:, :-1]
    inner[:, :-1] &= valid[:, 1:]
    assert inner.sum() > 200
    # central differences (pixel spacing = 1)
    dx = (texc[:, 2:] - texc[:, :-2]) * 0.5
    dy = (texc[2:] - texc[:-2]) * 0.5
    m = inner[1:-1, 1:-1]
    np.testing.assert_allclose(db[1:-1, 1:-1][m][:, 0],
                               dx[1:-1][m][:, 0], rtol=0.05, atol=2e-4)
    np.testing.assert_allclose(db[1:-1, 1:-1][m][:, 2],
                               dx[1:-1][m][:, 1], rtol=0.05, atol=2e-4)
    np.testing.assert_allclose(db[1:-1, 1:-1][m][:, 1],
                               dy[:, 1:-1][m][:, 0], rtol=0.05, atol=2e-4)
    np.testing.assert_allclose(db[1:-1, 1:-1][m][:, 3],
                               dy[:, 1:-1][m][:, 1], rtol=0.05, atol=2e-4)


def test_antialias_views_matches_vmap():
    """The flat (packed-views) AA path is numerically the vmapped
    per-view antialias — values and gradients."""
    import jax
    from meshdiffusion_tpu.render.rasterize import (antialias,
                                                    antialias_views,
                                                    rasterize)
    rng = np.random.default_rng(3)
    B, res = 3, (24, 24)
    v, f = two_triangles()
    v = jnp.asarray(v)
    f = jnp.asarray(f)
    # distinct per-view geometry: small per-view vertex jitter
    jit_v = jnp.asarray(rng.normal(0, 0.03, (B,) + v.shape).astype(np.float32))
    v_clip = v[None] + jit_v.at[..., 3].set(0.0)
    rasts = [rasterize(v_clip[b], f, res)[0] for b in range(B)]
    tri = jnp.stack([r.tri_id for r in rasts])
    valid = jnp.stack([r.valid for r in rasts])
    zbuf = jnp.stack([r.zbuf for r in rasts])
    col = jnp.asarray(rng.normal(0, 1, (B,) + res + (4,)).astype(np.float32))

    def flat(c, vc):
        return antialias_views(c, tri, valid, zbuf, vc, f, impl='flat')[0]

    def compact(c, vc):
        out, over = antialias_views(c, tri, valid, zbuf, vc, f,
                                    impl='compact', budget=4096)
        return out

    def vmapped(c, vc):
        return jax.vmap(
            lambda cb, rb, vb: antialias(cb, rb, vb, f),
            in_axes=(0, 0, 0))(c, jax.tree.map(
                lambda *xs: jnp.stack(xs), *rasts), vc)

    out_f = flat(col, v_clip)
    out_v = vmapped(col, v_clip)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_v),
                               atol=1e-5, rtol=1e-5)
    # compacted silhouette-pair path: same values and gradients as well
    out_c = compact(col, v_clip)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_v),
                               atol=1e-5, rtol=1e-5)
    gc_c, gc_v = jax.grad(lambda c, vc: jnp.sum(compact(c, vc) ** 2),
                          argnums=(0, 1))(col, v_clip)

    gf_c, gf_v = jax.grad(lambda c, vc: jnp.sum(flat(c, vc) ** 2),
                          argnums=(0, 1))(col, v_clip)
    gv_c, gv_v = jax.grad(lambda c, vc: jnp.sum(vmapped(c, vc) ** 2),
                          argnums=(0, 1))(col, v_clip)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gv_c),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_v), np.asarray(gv_v),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_c), np.asarray(gv_c),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_v), np.asarray(gv_v),
                               atol=1e-4, rtol=1e-4)


def test_antialias_compact_overflow_counts():
    """A too-small pair budget reports the dropped-pair count instead of
    silently mis-rendering everything."""
    from meshdiffusion_tpu.render.rasterize import (antialias_views,
                                                    rasterize)
    rng = np.random.default_rng(5)
    res = (24, 24)
    v, f = two_triangles()
    v_clip = jnp.asarray(v)[None]
    f = jnp.asarray(f)
    rast = rasterize(v_clip[0], f, res)[0]
    col = jnp.asarray(rng.normal(0, 1, (1,) + res + (4,)).astype(np.float32))
    _, over_big = antialias_views(col, rast.tri_id[None], rast.valid[None],
                                  rast.zbuf[None], v_clip, f,
                                  impl='compact', budget=4096)
    _, over_tiny = antialias_views(col, rast.tri_id[None], rast.valid[None],
                                   rast.zbuf[None], v_clip, f,
                                   impl='compact', budget=2)
    assert int(over_big) == 0
    assert int(over_tiny) > 0
