"""Fitting-loss oracles: chamfer/knn vs brute force numpy, BCE vs torch."""

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.geometry import fit_losses as FL


def test_chamfer_matches_bruteforce(rng):
    a = rng.normal(size=(300, 3)).astype(np.float32)
    b = rng.normal(size=(451, 3)).astype(np.float32)
    got = float(FL.chamfer_distance(jnp.asarray(a), jnp.asarray(b), chunk=128))
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    want = d2.min(1).mean() + d2.min(0).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_chamfer_zero_for_identical(rng):
    a = rng.normal(size=(100, 3)).astype(np.float32)
    got = float(FL.chamfer_distance(jnp.asarray(a), jnp.asarray(a)))
    assert got < 1e-5


def test_knn_dist(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    q = rng.normal(size=(37, 3)).astype(np.float32)
    got = np.asarray(FL.knn_dist(jnp.asarray(pts), jnp.asarray(q), k=2,
                                 chunk=64))
    d2 = ((q[:, None] - pts[None]) ** 2).sum(-1)
    want = np.sort(d2, axis=1)[:, 1]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sample_points_on_surface(rng):
    # unit right triangle in z=0 plane
    verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    pts = np.asarray(FL.sample_points(verts, faces, 2000, jax.random.key(0)))
    assert np.abs(pts[:, 2]).max() == 0.0
    assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-5).all()
    # roughly uniform: centroid near (1/3, 1/3)
    np.testing.assert_allclose(pts.mean(0)[:2], [1 / 3, 1 / 3], atol=0.02)


def test_sample_points_area_weighting(rng):
    # two triangles, one 100x the area of the other
    verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                         [10, 0, 0], [10, 10, 0], [0, 10, 1]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    pts = np.asarray(FL.sample_points(verts, faces, 3000, jax.random.key(1)))
    # small triangle lives in x+y <= 1; big triangle in x+y >= 10
    on_small = (pts[:, 0] + pts[:, 1] < 2).mean()
    assert on_small < 0.05  # big triangle dominates


def test_sdf_reg_loss_matches_torch(rng):
    import torch
    sdf = rng.normal(size=(50,)).astype(np.float32)
    edges = rng.integers(0, 50, size=(120, 2)).astype(np.int64)
    got = float(FL.sdf_reg_loss(jnp.asarray(sdf), jnp.asarray(edges)))

    # torch oracle following reference dmtet.py:169-175
    t = torch.tensor(sdf)
    e = torch.tensor(edges)
    s = t[e.reshape(-1)].reshape(-1, 2)
    m = torch.sign(s[:, 0]) != torch.sign(s[:, 1])
    s = s[m]
    want = (torch.nn.functional.binary_cross_entropy_with_logits(
                s[:, 0], (s[:, 1] > 0).float())
            + torch.nn.functional.binary_cross_entropy_with_logits(
                s[:, 1], (s[:, 0] > 0).float()))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_laplacian_uniform_flat_is_zero():
    # regular grid strip: interior Laplacian ~ 0 for a straight line of
    # equally spaced verts
    verts = jnp.asarray([[i, 0, 0] for i in range(5)], jnp.float32)
    edges = jnp.asarray([[i, i + 1] for i in range(4)], jnp.int32)
    val = float(FL.laplacian_uniform(verts, edges))
    # end vertices have single neighbors -> nonzero; interior zero
    verts2 = verts.at[2].add(jnp.asarray([0, 1.0, 0]))
    val2 = float(FL.laplacian_uniform(verts2, edges))
    assert val2 > val


def test_chamfer_custom_vjp_matches_autodiff():
    """The index-based custom VJP equals autodiff of the brute-force
    pairwise chamfer (exact, not approximate)."""
    import jax
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((60, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((47, 3)).astype(np.float32))

    def brute(a, b):
        d2 = jnp.sum((a[:, None] - b[None]) ** 2, -1)
        return jnp.mean(d2.min(1)) + jnp.mean(d2.min(0))

    ga, gb = jax.grad(lambda a, b: FL.chamfer_distance(a, b, 32),
                      argnums=(0, 1))(a, b)
    ga_ref, gb_ref = jax.grad(brute, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               rtol=1e-4, atol=1e-5)
