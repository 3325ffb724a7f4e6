"""Pallas tile z-min kernel vs the jnp scan path: identical selection on
random scenes, both fresh and depth-peeled."""

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.render import rasterize as R


def random_scene(seed, n_tris=300, res=(96, 96)):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-1.2, 1.2, (n_tris * 3, 4)).astype(np.float32)
    v[:, 2] = rng.uniform(-0.9, 0.9, n_tris * 3)
    v[:, 3] = 1.0
    f = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return jnp.asarray(v), jnp.asarray(f)


def _layers(v, f, res, use_pallas, num_layers=2):
    x, y, z, _ = R._screen_coords(v, res)
    xs = jnp.stack([x[f[:, 0]], x[f[:, 1]], x[f[:, 2]]], 1)
    ys = jnp.stack([y[f[:, 0]], y[f[:, 1]], y[f[:, 2]]], 1)
    zs = jnp.stack([z[f[:, 0]], z[f[:, 1]], z[f[:, 2]]], 1)
    mask = jnp.ones((f.shape[0],), bool)
    tt, counts, gt, gc = R.bin_triangles(xs, ys, mask, res, K=128)
    T = tt.shape[0]
    Kg = gt.shape[0]
    tt = jnp.concatenate([tt, jnp.broadcast_to(gt[None], (T, Kg))], 1)
    safe = jnp.maximum(tt, 0)
    cand = jnp.stack([xs[:, 0], ys[:, 0], zs[:, 0],
                      xs[:, 1], ys[:, 1], zs[:, 1],
                      xs[:, 2], ys[:, 2], zs[:, 2]], 1)[safe]
    outs = []
    z_floor = None
    for _ in range(num_layers):
        tri, zz = R._rasterize_tiles(cand, tt, res, z_floor,
                                     use_pallas=use_pallas)
        outs.append((np.asarray(tri), np.asarray(zz)))
        z_floor = jnp.asarray(zz)
    return outs


def test_pallas_matches_jnp_two_layers():
    for seed in (0, 1):
        v, f = random_scene(seed)
        res = (96, 96)
        ref = _layers(v, f, res, use_pallas=False)
        got = _layers(v, f, res, use_pallas=True)
        for li, ((rt, rz), (gt_, gz)) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(gt_, rt, err_msg=f'layer {li}')
            m = rt >= 0
            np.testing.assert_allclose(gz[m], rz[m], atol=1e-6)


def test_pallas_in_full_rasterize(monkeypatch):
    """rasterize() end to end (incl. barycentrics/peeling) with the pallas
    path forced equals the jnp path."""
    v, f = random_scene(3, n_tris=120, res=(64, 64))
    res = (64, 64)
    ref = R.rasterize(v, f, res, num_layers=2)
    orig = R._rasterize_tiles
    monkeypatch.setattr(
        R, '_rasterize_tiles',
        lambda cand, tt, res_, zf, use_pallas=None: orig(
            cand, tt, res_, zf, use_pallas=True))
    got = R.rasterize(v, f, res, num_layers=2)
    for li in range(2):
        np.testing.assert_array_equal(np.asarray(got[li].tri_id),
                                      np.asarray(ref[li].tri_id))
        np.testing.assert_allclose(np.asarray(got[li].bary),
                                   np.asarray(ref[li].bary), atol=1e-6)
