"""Mesh post-processing: uniform Laplacian smoothing as vectorized scatter.

Counterpart of the reference's pymeshlab post-process
(``nvdiffrec/eval.py:449-456``: isotropic remeshing -> Laplacian smoothing
(uniform weights, ``stepsmoothnum`` iterations) -> remeshing). The smoothing
dominates the visual effect; we implement it as jit-able segment-sum
gather/scatter (the umbrella-operator formula also appears at reference
``nvdiffrec/lib/render/regularizer.py:41-60``). Isotropic remeshing is a
CPU-topology operation with no TPU analog; it is intentionally omitted and
documented as a deviation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def laplacian_smooth(verts: jnp.ndarray, faces: jnp.ndarray,
                     steps: int = 3,
                     face_mask: Optional[jnp.ndarray] = None,
                     lam: float = 1.0) -> jnp.ndarray:
    """Uniform-weight Laplacian smoothing.

    Each step moves every referenced vertex toward the average of its 1-ring
    neighbors: v <- v + lam * (mean_neighbors(v) - v). lam=1 reproduces
    MeshLab's 'Laplacian Smooth' with cotangentweight=False.

    Works on padded (fixed-shape) meshes: faces referencing padded slots are
    disabled via ``face_mask``; untouched vertices keep their position.

    Args:
      verts: (V, 3) float vertex positions.
      faces: (F, 3) int32 vertex indices.
      steps: number of smoothing iterations.
      face_mask: optional (F,) bool validity mask for padded faces.
      lam: step size in (0, 1].
    """
    V = verts.shape[0]
    i0, i1, i2 = faces[:, 0], faces[:, 1], faces[:, 2]
    # undirected edges of each triangle, both directions
    src = jnp.concatenate([i0, i1, i1, i2, i2, i0])
    dst = jnp.concatenate([i1, i0, i2, i1, i0, i2])
    if face_mask is not None:
        w = jnp.tile(face_mask.astype(verts.dtype), 6)
    else:
        w = jnp.ones(src.shape, verts.dtype)

    # NOTE: edges shared by two triangles are counted once per incident
    # triangle; the duplicate counts appear in both numerator and denominator
    # of the neighbor average, so interior-vertex results match the pure
    # 1-ring average exactly on closed meshes.
    counts = jnp.zeros((V,), verts.dtype).at[src].add(w)

    def step(v, _):
        nbr_sum = jnp.zeros_like(v).at[src].add(v[dst] * w[:, None])
        avg = nbr_sum / jnp.maximum(counts, 1.0)[:, None]
        moved = v + lam * (avg - v)
        v = jnp.where((counts > 0)[:, None], moved, v)
        return v, None

    verts, _ = jax.lax.scan(step, verts, None, length=steps)
    return verts


def smooth_compacted(verts: np.ndarray, faces: np.ndarray, steps: int = 3
                     ) -> np.ndarray:
    """Convenience wrapper for host-side compacted meshes."""
    return np.asarray(laplacian_smooth(jnp.asarray(verts),
                                       jnp.asarray(faces.astype(np.int32)),
                                       steps=steps))
