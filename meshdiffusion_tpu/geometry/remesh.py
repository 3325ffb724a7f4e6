"""Isotropic explicit remeshing (host-side numpy post-process).

Equivalent of pymeshlab's ``meshing_isotropic_explicit_remeshing`` used by
the reference mesh post-process (``nvdiffrec/eval.py:449-456``: remesh ->
uniform Laplacian smooth -> remesh). Classic incremental isotropic
remeshing (Botsch & Kobbelt 2004): per iteration

1. split every edge longer than 4/3 of the target length (vectorized
   1-to-2/3/4 triangle subdivision, shared midpoints keep the mesh closed),
2. collapse edges shorter than 4/5 of the target (link-condition guarded
   so the mesh stays manifold),
3. flip edges to drive vertex valences toward 6,
4. tangential relaxation (uniform centroid, normal component projected out).

Runs on the host: the op is branchy connectivity surgery — the wrong shape
for XLA. Every phase is vectorized numpy (conflict-free subsets selected by
priority min-scatter instead of per-edge Python greedy): the reference's
pymeshlab call is native C++ taking seconds (nvdiffrec/eval.py:449-456),
and the original Python-loop collapse/flip took 137 s on a 200k-face mesh
(round-4 bench). The TPU-side pipeline hands over compacted numpy arrays
(extract.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _unique_edges(faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unique undirected edges (E, 2) and per-face edge ids (F, 3) in the
    order (v0-v1, v1-v2, v2-v0).

    Scalar-encoded (lo * nv + hi) so the dedup is one 1-D np.unique — the
    2-D axis=0 variant void-view-sorts and was the dominant cost of every
    remesh pass at noise-soup face counts."""
    if len(faces) == 0:
        return np.zeros((0, 2), np.int64), np.zeros((0, 3), np.int64)
    a = faces[:, [0, 1, 2]].astype(np.int64)
    b = faces[:, [1, 2, 0]].astype(np.int64)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    M = int(faces.max()) + 1
    keys, inv = np.unique(lo * M + hi, return_inverse=True)
    eu = np.stack([keys // M, keys % M], axis=1)
    return eu, inv.reshape(-1, 3)


def _edge_lengths(verts: np.ndarray, eu: np.ndarray) -> np.ndarray:
    return np.linalg.norm(verts[eu[:, 0]] - verts[eu[:, 1]], axis=1)


def split_long_edges(verts: np.ndarray, faces: np.ndarray, thresh: float,
                     max_passes: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """Split every edge longer than ``thresh`` at its midpoint; adjacent
    faces subdivide consistently (shared unique midpoint -> watertight)."""
    for _ in range(max_passes):
        eu, fe = _unique_edges(faces)
        long = _edge_lengths(verts, eu) > thresh
        if not long.any():
            break
        mid_idx = np.full(len(eu), -1, np.int64)
        mid_idx[long] = len(verts) + np.arange(int(long.sum()))
        vmid = 0.5 * (verts[eu[long, 0]] + verts[eu[long, 1]])
        verts = np.concatenate([verts, vmid])

        m = long[fe]                       # (F, 3) which face edges split
        me = mid_idx[fe]                   # midpoint ids per face edge
        a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
        mab, mbc, mca = me[:, 0], me[:, 1], me[:, 2]
        case = (m[:, 0].astype(np.int64) + 2 * m[:, 1].astype(np.int64)
                + 4 * m[:, 2].astype(np.int64))

        def tri(*cols):
            return np.stack(cols, axis=1)

        out = [faces[case == 0]]
        s = case == 1
        out += [tri(a[s], mab[s], c[s]), tri(mab[s], b[s], c[s])]
        s = case == 2
        out += [tri(b[s], mbc[s], a[s]), tri(mbc[s], c[s], a[s])]
        s = case == 4
        out += [tri(c[s], mca[s], b[s]), tri(mca[s], a[s], b[s])]
        s = case == 3
        out += [tri(mab[s], b[s], mbc[s]), tri(a[s], mab[s], mbc[s]),
                tri(a[s], mbc[s], c[s])]
        s = case == 6
        out += [tri(mbc[s], c[s], mca[s]), tri(a[s], b[s], mbc[s]),
                tri(a[s], mbc[s], mca[s])]
        s = case == 5
        out += [tri(a[s], mab[s], mca[s]), tri(mab[s], b[s], c[s]),
                tri(mab[s], c[s], mca[s])]
        s = case == 7
        out += [tri(a[s], mab[s], mca[s]), tri(mab[s], b[s], mbc[s]),
                tri(mca[s], mbc[s], c[s]), tri(mab[s], mbc[s], mca[s])]
        faces = np.concatenate([o for o in out if len(o)])
    return verts, faces


def _csr_adjacency(eu: np.ndarray, nv: int):
    """Boolean vertex-adjacency CSR matrix from unique edges."""
    import scipy.sparse as sp
    rows = np.concatenate([eu[:, 0], eu[:, 1]])
    cols = np.concatenate([eu[:, 1], eu[:, 0]])
    return sp.csr_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                         shape=(nv, nv))


def _flat_ranges(start: np.ndarray, deg: np.ndarray) -> np.ndarray:
    """Concatenate [start[i], start[i]+deg[i]) ranges without Python loops."""
    total = int(deg.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    offs = np.concatenate([[0], np.cumsum(deg)[:-1]])
    return (np.arange(total, dtype=np.int64)
            + np.repeat(start.astype(np.int64) - offs, deg))


def collapse_short_edges(verts: np.ndarray, faces: np.ndarray, low: float,
                         high: float, max_passes: int = 10
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Midpoint collapse of edges shorter than ``low``, vectorized.

    Manifold-guarded: the link condition |N(u) & N(w)| == 2 must hold and
    no edge incident to the merged vertex may exceed ``high``. Per pass, a
    conflict-free subset is applied at once: shortest-first priority, an
    edge wins iff it holds the minimum priority over its whole 1-ring
    neighborhood (both endpoints AND their neighbors — the same
    distance->=2 separation the sequential greedy enforced by freezing
    touched vertices), computed with two min-scatter sweeps. Passes repeat
    on the collapsed mesh until no short edge survives its guards.
    """
    for _ in range(max_passes):
        nv = len(verts)
        eu, _ = _unique_edges(faces)
        lens = _edge_lengths(verts, eu)
        short = np.nonzero(lens < low)[0]
        if len(short) == 0:
            break
        A = _csr_adjacency(eu, nv)
        us, ws = eu[short, 0], eu[short, 1]

        # link condition: exactly two common neighbors (the two opposite
        # vertices of the edge's faces); more = pinched/non-manifold merge
        common = np.asarray(A[us].multiply(A[ws]).sum(axis=1)).ravel()
        ok = common == 2

        # no post-collapse edge may exceed ``high``: max distance from the
        # midpoint to any neighbor of either endpoint (CSR range expansion)
        mids = 0.5 * (verts[us] + verts[ws])
        maxd = np.zeros(len(short))
        for vs in (us, ws):
            start, deg = A.indptr[vs], A.indptr[vs + 1] - A.indptr[vs]
            flat = _flat_ranges(start, deg)
            cand = np.repeat(np.arange(len(short)), deg)
            nbr = A.indices[flat]
            d = np.linalg.norm(verts[nbr] - mids[cand], axis=1)
            np.maximum.at(maxd, cand, d)
        ok &= maxd <= high
        if not ok.any():
            break
        cand_e = short[ok]
        cu, cw = eu[cand_e, 0], eu[cand_e, 1]

        # shortest-first priority; a candidate wins iff it is the strict
        # minimum over {u,w} ∪ N(u) ∪ N(w)
        prio = np.empty(len(cand_e), np.int64)
        prio[np.argsort(lens[cand_e], kind='stable')] = np.arange(len(cand_e))
        INF = np.iinfo(np.int64).max
        minp = np.full(nv, INF, np.int64)
        np.minimum.at(minp, cu, prio)
        np.minimum.at(minp, cw, prio)
        prop = minp.copy()
        np.minimum.at(prop, eu[:, 0], minp[eu[:, 1]])
        np.minimum.at(prop, eu[:, 1], minp[eu[:, 0]])
        sel = (prop[cu] == prio) & (prop[cw] == prio)
        if not sel.any():
            break
        su, sw = cu[sel], cw[sel]

        remap = np.arange(nv)
        remap[sw] = su
        newpos = verts.copy()
        newpos[su] = 0.5 * (verts[su] + verts[sw])
        faces = remap[faces]
        # drop faces that lost a vertex (two corners merged)
        good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                & (faces[:, 2] != faces[:, 0]))
        faces = faces[good]
        # compact vertex array
        used = np.zeros(nv, bool)
        used[faces.reshape(-1)] = True
        new_id = np.cumsum(used) - 1
        verts, faces = newpos[used], new_id[faces]
    return verts, faces


def flip_edges(verts: np.ndarray, faces: np.ndarray, max_passes: int = 3
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Flip interior edges when it reduces total squared valence deviation
    from 6. Vectorized: per pass, a vertex-disjoint set of improving flips
    (largest-gain priority, min-scatter selection over the four touched
    vertices) is applied at once — vertex-disjoint flips have independent
    valence updates, cannot share a face, and cannot create the same edge
    twice. Passes repeat until no improving flip survives.
    """
    nv = len(verts)
    for _ in range(max_passes):
        eu, fe = _unique_edges(faces)
        if len(eu) == 0:
            break
        val = np.zeros(nv, np.int64)
        np.add.at(val, eu.reshape(-1), 1)

        # edge -> its (<=2) adjacent faces, via one stable sort
        flat_e = fe.reshape(-1)
        face_of = np.repeat(np.arange(len(faces)), 3)
        order = np.argsort(flat_e, kind='stable')
        counts = np.bincount(flat_e, minlength=len(eu))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        interior = counts == 2
        ei = np.nonzero(interior)[0]
        f0 = face_of[order][starts[ei]]
        f1 = face_of[order][starts[ei] + 1]

        u, w = eu[ei, 0], eu[ei, 1]
        t0, t1 = faces[f0], faces[f1]
        a = t0.sum(axis=1) - u - w          # opposite vertex in f0
        b = t1.sum(axis=1) - u - w          # opposite vertex in f1

        dev = lambda x: (x - 6) ** 2
        gain = (dev(val[u]) + dev(val[w]) + dev(val[a]) + dev(val[b])
                - dev(val[u] - 1) - dev(val[w] - 1)
                - dev(val[a] + 1) - dev(val[b] + 1))
        ok = (gain > 0) & (a != b)

        # the flipped diagonal must not already exist
        M = nv
        new_key = np.minimum(a, b) * M + np.maximum(a, b)
        keys = eu[:, 0] * M + eu[:, 1]      # sorted by construction
        pos = np.searchsorted(keys, new_key)
        pos_c = np.minimum(pos, len(keys) - 1)
        ok &= keys[pos_c] != new_key

        # orientation from t0's cyclic order: if u->w in t0 the flipped
        # diagonal runs b->a seen from u's side, else a->b
        ku = np.argmax(t0 == u[:, None], axis=1)
        uw_order = t0[np.arange(len(t0)), (ku + 1) % 3] == w
        nt0 = np.where(uw_order[:, None],
                       np.stack([u, b, a], 1), np.stack([u, a, b], 1))
        nt1 = np.where(uw_order[:, None],
                       np.stack([w, a, b], 1), np.stack([w, b, a], 1))
        # geometric guard: reject flips that would fold the surface
        n0 = np.cross(verts[t0[:, 1]] - verts[t0[:, 0]],
                      verts[t0[:, 2]] - verts[t0[:, 0]])
        nn0 = np.cross(verts[nt0[:, 1]] - verts[nt0[:, 0]],
                       verts[nt0[:, 2]] - verts[nt0[:, 0]])
        ok &= np.einsum('ij,ij->i', n0, nn0) > 0
        if not ok.any():
            break

        # vertex-disjoint selection, largest gain first
        cu, cw, ca, cb = u[ok], w[ok], a[ok], b[ok]
        prio = np.empty(int(ok.sum()), np.int64)
        prio[np.argsort(-gain[ok], kind='stable')] = np.arange(len(prio))
        INF = np.iinfo(np.int64).max
        minp = np.full(nv, INF, np.int64)
        for vs in (cu, cw, ca, cb):
            np.minimum.at(minp, vs, prio)
        sel = ((minp[cu] == prio) & (minp[cw] == prio)
               & (minp[ca] == prio) & (minp[cb] == prio))
        if not sel.any():
            break
        faces = faces.copy()
        faces[f0[ok][sel]] = nt0[ok][sel]
        faces[f1[ok][sel]] = nt1[ok][sel]
    return verts, faces


def tangential_relax(verts: np.ndarray, faces: np.ndarray, lam: float = 0.5
                     ) -> np.ndarray:
    """Move each vertex toward its 1-ring centroid, keeping only the
    component tangent to the (area-weighted) vertex normal."""
    nv = len(verts)
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    vn = np.zeros((nv, 3))
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)

    eu, _ = _unique_edges(faces)
    csum = np.zeros((nv, 3))
    cnt = np.zeros(nv)
    np.add.at(csum, eu[:, 0], verts[eu[:, 1]])
    np.add.at(csum, eu[:, 1], verts[eu[:, 0]])
    np.add.at(cnt, eu.reshape(-1), 1)
    cent = csum / np.maximum(cnt, 1)[:, None]
    d = lam * (cent - verts)
    d -= vn * np.sum(d * vn, axis=1, keepdims=True)
    return verts + d


def isotropic_remesh(verts: np.ndarray, faces: np.ndarray,
                     target_len: Optional[float] = None,
                     iterations: int = 3
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Botsch-Kobbelt isotropic remeshing.

    target_len defaults to the median input edge length: this keeps the
    tessellation density (pymeshlab's default of 1%% bbox diagonal happens
    to coincide with the native DMTet edge length at the reference's
    standard 64^3 usage, but 70x-upsamples smaller grids).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    if len(faces) == 0:
        return verts.astype(np.float32), faces.astype(np.int32)
    if target_len is None:
        eu, _ = _unique_edges(faces)
        target_len = float(np.median(_edge_lengths(verts, eu)))
    for _ in range(iterations):
        verts, faces = split_long_edges(verts, faces, 4.0 / 3.0 * target_len)
        verts, faces = collapse_short_edges(
            verts, faces, 0.8 * target_len, 4.0 / 3.0 * target_len)
        verts, faces = flip_edges(verts, faces)
        verts = tangential_relax(verts, faces)
    return verts.astype(np.float32), faces.astype(np.int32)
