"""Isotropic explicit remeshing (host-side numpy post-process).

Equivalent of pymeshlab's ``meshing_isotropic_explicit_remeshing`` used by
the reference mesh post-process (``nvdiffrec/eval.py:449-456``: remesh ->
uniform Laplacian smooth -> remesh). Classic incremental isotropic
remeshing (Botsch & Kobbelt 2004): per iteration

1. split every edge longer than 4/3 of the target length (vectorized
   1-to-2/3/4 triangle subdivision, shared midpoints keep the mesh closed),
2. collapse edges shorter than 4/5 of the target (greedy, link-condition
   guarded so the mesh stays manifold),
3. flip edges to drive vertex valences toward 6,
4. tangential relaxation (uniform centroid, normal component projected out).

Runs on the host: extraction output is small (tens of k faces) and the op
is branchy connectivity surgery — the wrong shape for XLA. The TPU-side
pipeline hands over compacted numpy arrays (extract.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _unique_edges(faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unique undirected edges (E, 2) and per-face edge ids (F, 3) in the
    order (v0-v1, v1-v2, v2-v0)."""
    e = np.sort(faces[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2), axis=1)
    eu, inv = np.unique(e, axis=0, return_inverse=True)
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


def _vertex_adjacency(faces: np.ndarray, nv: int):
    """List-of-sets vertex adjacency."""
    adj = [set() for _ in range(nv)]
    for tri in faces:
        a, b, c = int(tri[0]), int(tri[1]), int(tri[2])
        adj[a].update((b, c))
        adj[b].update((a, c))
        adj[c].update((a, b))
    return adj


def collapse_short_edges(verts: np.ndarray, faces: np.ndarray, low: float,
                         high: float) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy midpoint collapse of edges shorter than ``low``.

    Manifold-guarded: the link condition |N(u) & N(w)| == 2 must hold and
    no edge incident to the merged vertex may exceed ``high``. One pass
    (touched vertices are frozen); repeated across remesh iterations.
    """
    eu, _ = _unique_edges(faces)
    lens = _edge_lengths(verts, eu)
    short = np.nonzero(lens < low)[0]
    if len(short) == 0:
        return verts, faces
    short = short[np.argsort(lens[short])]
    adj = _vertex_adjacency(faces, len(verts))

    remap = np.arange(len(verts))
    newpos = verts.copy()
    touched = np.zeros(len(verts), bool)
    for ei in short:
        u, w = int(eu[ei, 0]), int(eu[ei, 1])
        if touched[u] or touched[w]:
            continue
        common = adj[u] & adj[w]
        if len(common) != 2:          # non-manifold or boundary collapse
            continue
        mid = 0.5 * (verts[u] + verts[w])
        nbrs = (adj[u] | adj[w]) - {u, w}
        if any(np.linalg.norm(verts[n] - mid) > high for n in nbrs):
            continue
        remap[w] = u
        newpos[u] = mid
        touched[u] = touched[w] = True
        for n in nbrs:
            touched[n] = True
    faces = remap[faces]
    # drop faces that lost a vertex (two corners merged)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 2] != faces[:, 0]))
    faces = faces[good]
    # compact vertex array
    used = np.zeros(len(verts), bool)
    used[faces.reshape(-1)] = True
    new_id = np.cumsum(used) - 1
    return newpos[used], new_id[faces]


def flip_edges(verts: np.ndarray, faces: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Flip interior edges when it reduces total squared valence deviation
    from 6. Greedy, at most one flip per face per pass."""
    nv = len(verts)
    eu, fe = _unique_edges(faces)
    # valences
    val = np.zeros(nv, np.int64)
    np.add.at(val, eu.reshape(-1), 1)
    # edge -> adjacent faces (manifold: <= 2)
    e2f = {}
    for fi in range(len(faces)):
        for k in range(3):
            e2f.setdefault(int(fe[fi, k]), []).append(fi)
    existing = set(map(tuple, eu))
    face_used = np.zeros(len(faces), bool)
    new_faces = faces.copy()
    for ei, fl in e2f.items():
        if len(fl) != 2:
            continue
        f0, f1 = fl
        if face_used[f0] or face_used[f1]:
            continue
        u, w = int(eu[ei, 0]), int(eu[ei, 1])
        t0 = [int(x) for x in new_faces[f0]]
        t1 = [int(x) for x in new_faces[f1]]
        opp0 = [x for x in t0 if x != u and x != w]
        opp1 = [x for x in t1 if x != u and x != w]
        if len(opp0) != 1 or len(opp1) != 1:
            continue
        a, b = opp0[0], opp1[0]
        if a == b or tuple(sorted((a, b))) in existing:
            continue
        dev = lambda x: (x - 6) ** 2
        before = dev(val[u]) + dev(val[w]) + dev(val[a]) + dev(val[b])
        after = (dev(val[u] - 1) + dev(val[w] - 1)
                 + dev(val[a] + 1) + dev(val[b] + 1))
        if after >= before:
            continue
        # geometric guard: reject flips that would fold the surface
        n0 = np.cross(verts[t0[1]] - verts[t0[0]], verts[t0[2]] - verts[t0[0]])
        ku = t0.index(u)
        # orientation from t0's cyclic order: if u->w in t0 the flipped
        # diagonal runs b->a seen from u's side, else a->b
        if t0[(ku + 1) % 3] == w:
            nt0 = [u, b, a]
            nt1 = [w, a, b]
        else:
            nt0 = [u, a, b]
            nt1 = [w, b, a]
        nn0 = np.cross(verts[nt0[1]] - verts[nt0[0]],
                       verts[nt0[2]] - verts[nt0[0]])
        if np.dot(n0, nn0) <= 0:
            continue
        new_faces[f0] = nt0
        new_faces[f1] = nt1
        face_used[f0] = face_used[f1] = True
        val[u] -= 1
        val[w] -= 1
        val[a] += 1
        val[b] += 1
        existing.discard((min(u, w), max(u, w)))
        existing.add(tuple(sorted((a, b))))
    return verts, new_faces


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
