"""Marching tetrahedra: fixed-shape kernel vs an independent dynamic-shape
numpy oracle implementing the reference algorithm
(nvdiffrec/lib/geometry/dmtet.py:105-163), plus geometric sanity checks."""

import jax
import jax.numpy as jnp
import numpy as np

from meshdiffusion_tpu.geometry.marching_tets import marching_tets, compact_mesh
from meshdiffusion_tpu.geometry.tet_grid import (
    TRIANGLE_TABLE, NUM_TRIANGLES_TABLE, BASE_TET_EDGES)


def oracle_marching_tets(pos, sdf, tets):
    """Slow dynamic-shape numpy reference (dual-implementation oracle)."""
    occ = sdf > 0
    occ4 = occ[tets]
    occ_sum = occ4.sum(-1)
    valid = (occ_sum > 0) & (occ_sum < 4)

    all_edges = tets[valid][:, BASE_TET_EDGES].reshape(-1, 2)
    all_edges = np.sort(all_edges, axis=1)
    unique_edges, idx_map = np.unique(all_edges, axis=0, return_inverse=True)
    cross = occ[unique_edges].sum(-1) == 1
    mapping = -np.ones(len(unique_edges), np.int64)
    mapping[cross] = np.arange(cross.sum())
    idx_map = mapping[idx_map].reshape(-1, 6)

    interp = unique_edges[cross]
    sa, sb = sdf[interp[:, 0]], sdf[interp[:, 1]]
    denom = sa - sb
    verts = (pos[interp[:, 0]] * (-sb / denom)[:, None]
             + pos[interp[:, 1]] * (sa / denom)[:, None])

    pow2 = 2 ** np.arange(4)
    tetindex = (occ4[valid] * pow2).sum(-1)
    ntri = NUM_TRIANGLES_TABLE[tetindex]
    faces = []
    for row, case, n in zip(idx_map, tetindex, ntri):
        tt = TRIANGLE_TABLE[case]
        for k in range(n):
            faces.append(row[tt[3 * k:3 * k + 3]])
    faces = np.asarray(faces if faces else np.zeros((0, 3)), np.int64)
    return verts, faces


def canonical(verts, faces, decimals=5):
    """Order-independent canonical form of a mesh for comparison."""
    v = np.round(verts, decimals)
    tri = v[faces]                      # (F, 3, 3)
    # roll each triangle so its lexicographically smallest vertex is first
    # (preserves orientation/winding), then sort triangles
    flat = tri.reshape(len(tri), 3, 3)
    order = np.argmin(
        [tuple_key(flat[:, i]) for i in range(3)], axis=0) if len(tri) else []
    rolled = np.stack([np.roll(flat[i], -order[i], axis=0)
                       for i in range(len(flat))]) if len(tri) else flat
    keys = rolled.reshape(len(tri), -1)
    idx = np.lexsort(keys.T[::-1]) if len(tri) else []
    return rolled[idx] if len(tri) else rolled


def tuple_key(arr):
    """Lexicographic scalar key per row of an (N, 3) array."""
    a = np.round(arr, 5)
    return a[:, 0] * 1e6 + a[:, 1] * 1e3 + a[:, 2]


def test_matches_oracle_on_sphere(tiny_tet_grid):
    tg = tiny_tet_grid
    pos = tg.verts
    sdf = 0.3 - np.linalg.norm(pos, axis=1).astype(np.float32)
    out = jax.jit(lambda s: marching_tets(tg, jnp.asarray(pos), s))(
        jnp.asarray(sdf))
    v1, f1 = compact_mesh(out)
    v2, f2 = oracle_marching_tets(pos, sdf, tg.indices)
    assert f1.shape == f2.shape
    t1 = canonical(v1, f1)
    t2 = canonical(v2, f2)
    np.testing.assert_allclose(t1, t2, atol=1e-4)


def test_matches_oracle_on_random_sdf(tiny_tet_grid, rng):
    tg = tiny_tet_grid
    pos = tg.verts
    for seed in range(3):
        sdf = rng.standard_normal(tg.num_verts).astype(np.float32)
        sdf[sdf == 0] = 1.0
        out = marching_tets(tg, jnp.asarray(pos), jnp.asarray(sdf))
        v1, f1 = compact_mesh(out)
        v2, f2 = oracle_marching_tets(pos, sdf, tg.indices)
        assert f1.shape == f2.shape
        np.testing.assert_allclose(canonical(v1, f1), canonical(v2, f2),
                                   atol=1e-4)


def test_sphere_geometry(tiny_tet_grid):
    tg = tiny_tet_grid
    pos = tg.verts
    sdf = 0.3 - np.linalg.norm(pos, axis=1).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(pos), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 0.3) < 0.01
    assert r.std() < 0.02
    # closed genus-0 mesh: F = 2V - 4
    assert f.shape[0] == 2 * v.shape[0] - 4


def test_differentiable_wrt_sdf(tiny_tet_grid):
    tg = tiny_tet_grid
    pos = jnp.asarray(tg.verts)
    sdf = jnp.asarray(0.3 - np.linalg.norm(tg.verts, axis=1), jnp.float32)

    def loss(s):
        out = marching_tets(tg, pos, s)
        w = out.vert_mask.astype(jnp.float32)[:, None]
        return jnp.sum(out.verts * w)

    g = jax.grad(loss)(sdf)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_empty_and_full_sdf(tiny_tet_grid):
    tg = tiny_tet_grid
    pos = jnp.asarray(tg.verts)
    for val in (1.0, -1.0):
        out = marching_tets(tg, pos, jnp.full((tg.num_verts,), val))
        assert int(out.num_faces()) == 0
        assert not bool(out.vert_mask.any())


def test_map_uv_static_chart(tiny_tet_grid):
    from meshdiffusion_tpu.geometry.marching_tets import map_uv
    tg = tiny_tet_grid
    uvs, uv_idx = map_uv(tg)
    assert uv_idx.shape == (2 * tg.num_tets, 3)
    assert uvs.shape[1] == 2
    assert uv_idx.max() < len(uvs)
    assert (uvs >= 0).all() and (uvs <= 1).all()
    # the two triangles of a tet share corner 0 and corner 2/3 patterns
    t0 = uv_idx[0::2]
    t1 = uv_idx[1::2]
    assert (t0[:, 0] == t1[:, 0]).all()


def test_winding_consistent_and_outward(tiny_tet_grid):
    """All surface triangles wind consistently (outward for sdf>0 =
    outside, the reference carving convention, dmtet.py:377) — requires
    the tet-parity normalization in TetGrid.from_arrays for Kuhn grids."""
    import numpy as np
    import jax.numpy as jnp
    from meshdiffusion_tpu.geometry.marching_tets import (marching_tets,
                                                          compact_mesh)
    tg = tiny_tet_grid
    sdf = np.linalg.norm(tg.verts, axis=1).astype(np.float32) - 0.3
    out = marching_tets(tg, jnp.asarray(tg.verts), jnp.asarray(sdf))
    v, f = compact_mesh(out)
    v, f = np.asarray(v), np.asarray(f)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    d = np.einsum('ij,ij->i', np.cross(b - a, c - a), (a + b + c) / 3)
    assert (d > 0).all()


def test_crop_tets_drops_boundary_layer():
    """crop_tets removes the outermost lattice layer and reindexes
    (reference crop_tets.py:16-63)."""
    import numpy as np
    from meshdiffusion_tpu.geometry.generate_tets import (generate_tet_grid,
                                                          crop_tets)
    v, t = generate_tet_grid(10)          # 9^3 verts
    v2, t2 = crop_tets(v, t)
    assert len(v2) == 7 ** 3
    assert t2.min() >= 0 and t2.max() < len(v2)
    # all interior coordinates survive untouched
    for k in range(3):
        assert v2[:, k].min() > v[:, k].min()
        assert v2[:, k].max() < v[:, k].max()
    # cropped tets span only interior cells: 6 per cell, (7-1)^3 cells
    assert len(t2) == 6 * 6 ** 3


def test_marching_tets_soa_matches_aos(tiny_tet_grid):
    """The structure-of-arrays path (large-grid extraction layout) yields
    the same compacted mesh as the default path — same vertex set and the
    same triangles with identical winding (face ORDER is a permutation)."""
    from meshdiffusion_tpu.geometry.marching_tets import (
        compact_mesh, compact_mesh_soa, marching_tets, marching_tets_soa,
        soa_tables)
    tg = tiny_tet_grid
    rng = np.random.default_rng(7)
    sdf = (np.linalg.norm(tg.verts, axis=1) - 0.3
           + rng.normal(0, 0.02, tg.verts.shape[0])).astype(np.float32)
    vpos = (tg.verts + rng.normal(0, 0.005, tg.verts.shape)
            ).astype(np.float32)
    out = marching_tets(tg, jnp.asarray(vpos), jnp.asarray(sdf))
    v0, f0 = compact_mesh(out)
    soa = marching_tets_soa(soa_tables(tg),
                            jnp.asarray(vpos.T.copy()), jnp.asarray(sdf))
    v1, f1 = compact_mesh_soa(*soa)
    # same vertex array (compaction order is edge order in both paths)
    np.testing.assert_allclose(v0, v1, atol=1e-6)
    assert f0.shape == f1.shape
    # same triangle set with same winding, up to face-order permutation:
    # canonicalize by rotating each face to start at its smallest index
    def canon(f):
        roll = np.argmin(f, axis=1)
        rows = np.arange(f.shape[0])[:, None]
        cols = (roll[:, None] + np.arange(3)[None, :]) % 3
        c = f[rows, cols]
        return c[np.lexsort(c.T[::-1])]
    np.testing.assert_array_equal(canon(f0), canon(f1))
