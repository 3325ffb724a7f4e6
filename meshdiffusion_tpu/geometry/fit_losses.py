"""Geometry fitting losses: surface sampling, chamfer, SDF reg, Laplacian.

Counterparts of the reference's loss toolbox:
* area-weighted surface sampling — kaolin ``mesh.sample_points`` /
  ``nvdiffrec/lib/geometry/utils.py:55-128``;
* chamfer distance — kaolin ``metrics.pointcloud.chamfer_distance``
  (used at dmtet.py:454-459);
* SDF sign-consistency BCE over crossing edges — dmtet.py:169-175;
* uniform (umbrella) Laplacian regularizer — render/regularizer.py:41-60
  (used by the fixed-topology pass, dmtet_fixedtopo.py:207-211).

All fixed-shape and jit-safe; padded faces are handled with masks so these
compose with marching-tets output under jit.
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def face_areas(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    v0, v1, v2 = (verts[faces[:, k]] for k in range(3))
    return 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)


def sample_points(verts: jnp.ndarray, faces: jnp.ndarray, num: int,
                  key: jax.Array, face_mask: Optional[jnp.ndarray] = None
                  ) -> jnp.ndarray:
    """Area-weighted uniform surface samples (kaolin semantics,
    reference geometry/utils.py:55-128). Returns (num, 3)."""
    areas = face_areas(verts, faces)
    if face_mask is not None:
        areas = areas * face_mask.astype(areas.dtype)
    k_face, k_uv = jax.random.split(key)
    # inverse-CDF sampling via searchsorted: jax.random.categorical
    # broadcasts its logits to (num, F) gumbels — 50k draws over the
    # ~320k-face static marching-tets list cost ~0.45 s/call on TPU
    # (round-3 decomp); the cumsum+binary-search form is ~11 ms with the
    # identical area-weighted distribution. No gradient flows through the
    # integer face choice in either form.
    cdf = jnp.cumsum(areas)
    u_face = jax.random.uniform(k_face, (num,)) * cdf[-1]
    fidx = jnp.minimum(jnp.searchsorted(cdf, u_face), faces.shape[0] - 1)
    u = jax.random.uniform(k_uv, (num, 2))
    # uniform barycentric via sqrt trick
    su = jnp.sqrt(u[:, 0:1])
    b0 = 1.0 - su
    b1 = su * (1.0 - u[:, 1:2])
    b2 = su * u[:, 1:2]
    f = faces[fidx]
    return (verts[f[:, 0]] * b0 + verts[f[:, 1]] * b1 + verts[f[:, 2]] * b2)


def _min_d2_idx(x, y, chunk):
    """Per row of x: (min ||x-y||^2 over y, argmin index), scanning y in
    chunks so the pairwise matrix never exceeds (N, chunk)."""
    n = y.shape[0]
    pad = (-n) % chunk
    yp = jnp.pad(y, ((0, pad), (0, 0)), constant_values=1e9)
    y2p = jnp.sum(yp * yp, axis=-1)
    yc = yp.reshape(-1, chunk, 3)
    yc2 = y2p.reshape(-1, chunk)
    offs = jnp.arange(yc.shape[0], dtype=jnp.int32) * chunk
    x2 = jnp.sum(x * x, -1)[:, None]

    def body(carry, data):
        best, bidx = carry
        ycv, yc2v, off = data
        d2 = jnp.maximum(x2 - 2 * x @ ycv.T + yc2v[None, :], 0.0)
        cmin = d2.min(axis=1)
        carg = d2.argmin(axis=1).astype(jnp.int32) + off
        upd = cmin < best
        return (jnp.where(upd, cmin, best), jnp.where(upd, carg, bidx)), None

    init = (jnp.full((x.shape[0],), jnp.inf),
            jnp.zeros((x.shape[0],), jnp.int32))
    (d2min, idx), _ = jax.lax.scan(body, init, (yc, yc2, offs))
    return d2min, jnp.minimum(idx, n - 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 4096
                     ) -> jnp.ndarray:
    """Mean squared bidirectional nearest-neighbor distance (kaolin
    convention: mean over a of min ||a-b||^2 + mean over b of min ||b-a||^2).

    Custom VJP: autodiff through the chunked scan would save every (N,
    chunk) distance block for the backward pass — measured 9.9 GB of HBM
    at 50k-vs-50k points inside the fit step. The exact gradient only
    needs the nearest-neighbor INDICES: d/da_i = (2/Na)(a_i - b_nn(i))
    plus the scatter from b-side matches.
    """
    da, _ = _min_d2_idx(a, b, chunk)
    db, _ = _min_d2_idx(b, a, chunk)
    return jnp.mean(da) + jnp.mean(db)


def _chamfer_fwd(a, b, chunk):
    da, ia = _min_d2_idx(a, b, chunk)
    db, ib = _min_d2_idx(b, a, chunk)
    return jnp.mean(da) + jnp.mean(db), (a, b, ia, ib)


def _chamfer_bwd(chunk, res, g):
    a, b, ia, ib = res
    na = a.shape[0]
    nb = b.shape[0]
    ga = (2.0 / na) * (a - b[ia]) \
        + (2.0 / nb) * jnp.zeros_like(a).at[ib].add(a[ib] - b)
    gb = (2.0 / nb) * (b - a[ib]) \
        + (2.0 / na) * jnp.zeros_like(b).at[ia].add(b[ia] - a)
    return ga * g, gb * g


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)


def knn_dist(points: jnp.ndarray, queries: jnp.ndarray, k: int = 1,
             chunk: int = 4096) -> jnp.ndarray:
    """k-th smallest distance from each query to `points` (pytorch3d
    knn_points replacement, reference dmtet.py:249-251). Exact top-k over
    chunks."""
    def one_chunk(carry, pc):
        d2 = (jnp.sum(queries ** 2, -1)[:, None]
              - 2 * queries @ pc.T + jnp.sum(pc ** 2, -1)[None, :])
        d2 = jnp.maximum(d2, 0.0)  # guard fp32 cancellation
        allk = jnp.concatenate([carry, d2], axis=1)
        topk = -jax.lax.top_k(-allk, k)[0]
        return topk, None

    n = points.shape[0]
    pad = (-n) % chunk
    pp = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e9)
    init = jnp.full((queries.shape[0], k), jnp.inf)
    out, _ = jax.lax.scan(one_chunk, init, pp.reshape(-1, chunk, 3))
    return out[:, k - 1]


def sdf_reg_loss(sdf: jnp.ndarray, all_edges: jnp.ndarray) -> jnp.ndarray:
    """Sign-consistency BCE over crossing edges (reference dmtet.py:169-175).

    The reference averages BCE-with-logits over only the crossing edges; we
    reproduce that with a masked mean (0 when no edge crosses).
    """
    sa = sdf[all_edges[:, 0]]
    sb = sdf[all_edges[:, 1]]
    crossing = (jnp.sign(sa) != jnp.sign(sb)).astype(sdf.dtype)

    def bce_logits(x, target):
        # numerically-stable BCEWithLogits
        return jnp.clip(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))

    loss = (bce_logits(sa, (sb > 0).astype(sdf.dtype))
            + bce_logits(sb, (sa > 0).astype(sdf.dtype)))
    denom = jnp.maximum(jnp.sum(crossing), 1.0)
    return jnp.sum(loss * crossing) / denom


def laplacian_uniform(verts: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Mean squared uniform-Laplacian magnitude (reference
    regularizer.py:41-60): L(v) = v - mean(neighbors)."""
    V = verts.shape[0]
    src = jnp.concatenate([edges[:, 0], edges[:, 1]])
    dst = jnp.concatenate([edges[:, 1], edges[:, 0]])
    nbr_sum = jnp.zeros_like(verts).at[src].add(verts[dst])
    deg = jnp.zeros((V,), verts.dtype).at[src].add(1.0)
    lap = verts - nbr_sum / jnp.maximum(deg, 1.0)[:, None]
    lap = jnp.where((deg > 0)[:, None], lap, 0.0)
    return jnp.mean(jnp.sum(lap ** 2, axis=-1))
