"""Laplacian smoothing vs a naive per-vertex python oracle."""

import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.geometry.smoothing import laplacian_smooth


def naive_smooth(verts, faces, steps):
    v = verts.copy()
    for _ in range(steps):
        nbr_sum = np.zeros_like(v)
        counts = np.zeros(len(v))
        for f in faces:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                nbr_sum[f[a]] += v[f[b]]
                counts[f[a]] += 1
                nbr_sum[f[b]] += v[f[a]]
                counts[f[b]] += 1
        avg = nbr_sum / np.maximum(counts, 1)[:, None]
        moved = avg
        v = np.where((counts > 0)[:, None], moved, v)
    return v


def _octahedron():
    verts = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    faces = np.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                        [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    return verts, faces


def test_matches_naive_oracle(rng):
    verts, faces = _octahedron()
    verts = verts + rng.normal(0, 0.05, verts.shape).astype(np.float32)
    ours = np.asarray(laplacian_smooth(jnp.asarray(verts), jnp.asarray(faces),
                                       steps=3))
    ref = naive_smooth(verts, faces, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_shrinks_toward_centroid():
    verts, faces = _octahedron()
    out = np.asarray(laplacian_smooth(jnp.asarray(verts), jnp.asarray(faces),
                                      steps=5))
    assert np.linalg.norm(out, axis=1).mean() < np.linalg.norm(verts, axis=1).mean()


def test_face_mask_disables_padded_faces():
    verts, faces = _octahedron()
    pad_faces = np.concatenate([faces, np.zeros((4, 3), np.int32)])
    mask = np.concatenate([np.ones(len(faces), bool), np.zeros(4, bool)])
    with_pad = np.asarray(laplacian_smooth(
        jnp.asarray(verts), jnp.asarray(pad_faces), steps=2,
        face_mask=jnp.asarray(mask)))
    without = np.asarray(laplacian_smooth(jnp.asarray(verts),
                                          jnp.asarray(faces), steps=2))
    np.testing.assert_allclose(with_pad, without, atol=1e-6)


def test_untouched_vertices_fixed():
    verts, faces = _octahedron()
    verts2 = np.concatenate([verts, [[9.0, 9.0, 9.0]]]).astype(np.float32)
    out = np.asarray(laplacian_smooth(jnp.asarray(verts2), jnp.asarray(faces),
                                      steps=3))
    np.testing.assert_allclose(out[-1], [9.0, 9.0, 9.0])
