"""Fixed-shape differentiable marching tetrahedra.

Behavioral counterpart of the reference ``nvdiffrec/lib/geometry/dmtet.py``
``DMTet.__call__`` (dmtet.py:105-163), re-designed for XLA/TPU:

The reference deduplicates crossing edges per call with ``torch.unique`` and
emits compacted, data-dependent-size vertex/face arrays — untraceable under
jit. Here the unique-edge table of the (static) tet grid is precomputed once
(``TetGrid``), so each call is pure fixed-shape gather/arithmetic:

* one interpolated vertex PER UNIQUE EDGE (E total), valid only where the
  edge crosses the surface (``vert_mask``);
* two triangle slots PER TET (2T total), valid per ``face_mask``; face
  indices point into the E-sized vertex array.

Outputs are padded to static shapes, jit/vmap-compatible, and differentiable
w.r.t. both vertex positions and SDF values (the interpolation weights carry
the SDF gradient exactly as in the reference). Host-side compaction for
.obj export lives in ``compact_mesh``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tet_grid import TetGrid, TRIANGLE_TABLE, NUM_TRIANGLES_TABLE


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MarchingTetsOutput:
    verts: jnp.ndarray       # (E, 3) f32, junk where ~vert_mask
    vert_mask: jnp.ndarray   # (E,) bool, True where edge crosses surface
    faces: jnp.ndarray       # (2T, 3) i32 into the E-sized vertex array
    face_mask: jnp.ndarray   # (2T,) bool
    face_tet_idx: jnp.ndarray  # (2T,) i32, source tet of each face slot
    valid_vert_mask: jnp.ndarray  # (V,) bool over TET vertices touching geometry

    def num_faces(self) -> jnp.ndarray:
        return jnp.sum(self.face_mask)


def marching_tets(grid: TetGrid, v_pos: jnp.ndarray, sdf: jnp.ndarray
                  ) -> MarchingTetsOutput:
    """Extract the zero-isosurface triangle mesh.

    Args:
      grid: static TetGrid (edge tables precomputed on host).
      v_pos: (V, 3) deformed tet-vertex positions.
      sdf: (V,) signed distance values.
    """
    edges = jnp.asarray(grid.unique_edges)           # (E, 2)
    tet2edge = jnp.asarray(grid.tet_edge_to_unique)  # (T, 6)
    tets = jnp.asarray(grid.indices)                 # (T, 4)

    occ = sdf > 0                                    # (V,)

    # --- per-unique-edge interpolated vertices (reference dmtet.py:125-132)
    ea, eb = edges[:, 0], edges[:, 1]
    sa, sb = sdf[ea], sdf[eb]
    crossing = occ[ea] ^ occ[eb]                     # (E,)
    denom = sa - sb
    safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    wa = -sb / safe                                  # weight of vertex a
    wb = sa / safe
    verts = v_pos[ea] * wa[:, None] + v_pos[eb] * wb[:, None]

    # --- per-tet triangle emission (reference dmtet.py:134-152)
    occ4 = occ[tets]                                 # (T, 4)
    pow2 = jnp.asarray([1, 2, 4, 8], jnp.int32)
    tetindex = jnp.sum(occ4.astype(jnp.int32) * pow2, axis=-1)   # (T,)
    tri_table = jnp.asarray(TRIANGLE_TABLE)          # (16, 6)
    ntri_table = jnp.asarray(NUM_TRIANGLES_TABLE)    # (16,)
    num_tri = ntri_table[tetindex]                   # (T,)
    local = tri_table[tetindex]                      # (T, 6) local edge slots
    local_safe = jnp.maximum(local, 0)
    global_edge = jnp.take_along_axis(tet2edge, local_safe, axis=1)  # (T, 6)

    T = grid.num_tets
    faces = global_edge.reshape(T, 2, 3).reshape(2 * T, 3)
    face_mask = jnp.stack([num_tri >= 1, num_tri == 2], axis=1).reshape(2 * T)
    face_tet_idx = jnp.repeat(jnp.arange(T, dtype=jnp.int32), 2)

    # --- valid tet-vertex mask (reference dmtet.py:161)
    active_tet = num_tri > 0
    valid_vert = jnp.zeros((grid.num_verts,), bool)
    valid_vert = valid_vert.at[tets.reshape(-1)].max(
        jnp.repeat(active_tet, 4))

    return MarchingTetsOutput(verts=verts, vert_mask=crossing,
                              faces=faces, face_mask=face_mask,
                              face_tet_idx=face_tet_idx,
                              valid_vert_mask=valid_vert)


def map_uv(grid: TetGrid) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-tet UV chart layout (reference dmtet.py:70-99): each tet
    owns a 4-corner square cell in a sqrt(num_tets)-sized chart atlas; the
    two possible triangles of a tet index corners (0,1,2)/(0,2,3).

    Returns (uvs (N*N*4, 2) f32, uv_idx (2*T, 3) i32) aligned with the fixed
    face slots of ``marching_tets`` (slot k -> tet k//2, tri k%2). Everything
    is static per grid resolution, so it is computed once on host.
    """
    num_tets = grid.num_tets
    N = int(np.ceil(np.sqrt((num_tets * 2 + 1) // 2)))
    tex_y, tex_x = np.meshgrid(
        np.linspace(0, 1 - 1 / N, N, dtype=np.float32),
        np.linspace(0, 1 - 1 / N, N, dtype=np.float32), indexing='ij')
    pad = 0.9 / N
    uvs = np.stack([tex_x, tex_y,
                    tex_x + pad, tex_y,
                    tex_x + pad, tex_y + pad,
                    tex_x, tex_y + pad], axis=-1).reshape(-1, 2)

    face_gidx = np.arange(2 * num_tets, dtype=np.int64)
    tet_idx_raw = face_gidx // 2
    x = tet_idx_raw % N
    y = tet_idx_raw // N
    tet_idx = y * N + x
    tri_idx = face_gidx % 2
    uv_idx = np.stack([tet_idx * 4,
                       tet_idx * 4 + tri_idx + 1,
                       tet_idx * 4 + tri_idx + 2], axis=-1)
    return uvs.astype(np.float32), uv_idx.astype(np.int32)


def compact_mesh(out: MarchingTetsOutput) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side compaction of a padded marching-tets output to dense
    (verts, faces) numpy arrays, with face winding identical to the
    reference (vertex order within each face is preserved)."""
    verts = np.asarray(out.verts)
    vmask = np.asarray(out.vert_mask)
    faces = np.asarray(out.faces)[np.asarray(out.face_mask)]
    remap = -np.ones(verts.shape[0], np.int64)
    used = np.zeros(verts.shape[0], bool)
    used[faces.reshape(-1)] = True
    used &= vmask
    remap[used] = np.arange(used.sum())
    v = verts[used]
    f = remap[faces]
    assert (f >= 0).all(), "face references a non-crossing edge vertex"
    return v.astype(np.float32), f.astype(np.int64)


# --------------------------------------------------------------------------
# Structure-of-arrays variant for very large grids (extraction path)
# --------------------------------------------------------------------------

def soa_tables(grid: TetGrid) -> dict:
    """Host-precomputed tables for :func:`marching_tets_soa`, shaped so no
    device array has a thin minor dimension.

    TPU buffer layouts tile the two minor dims to (8, 128): a (T, 6) i32
    table at the 128^3 grid's T=12.6M tets pads 6 -> 128 lanes and costs
    6.4 GB of HBM instead of 0.3 — the default AoS marching tets wants
    ~17 GB at 128^3 (XLA buffer-assignment OOM, round 3). Everything here
    is 1-D or k-major (k, N) with k <= 8 sublanes.
    """
    t2e = np.asarray(grid.tet_edge_to_unique, np.int32)      # (T, 6)
    return dict(
        tets_T=jnp.asarray(np.ascontiguousarray(
            np.asarray(grid.indices, np.int32).T)),          # (4, T)
        tet2edge_flat=jnp.asarray(t2e.reshape(-1)),          # (6T,) t-major
        edge_a=jnp.asarray(np.asarray(grid.unique_edges[:, 0], np.int32)),
        edge_b=jnp.asarray(np.asarray(grid.unique_edges[:, 1], np.int32)),
        tri_table_T=jnp.asarray(np.ascontiguousarray(TRIANGLE_TABLE.T)),
        ntri_table=jnp.asarray(NUM_TRIANGLES_TABLE),
    )


def marching_tets_soa(tables: dict, v_pos_T: jnp.ndarray, sdf: jnp.ndarray):
    """Marching tets over k-major arrays (see :func:`soa_tables`).

    v_pos_T: (3, V) deformed tet-vertex positions; sdf (V,).
    Returns (verts_T (3, E), crossing (E,), faces_T (3, 2T),
    face_mask (2T,)). Face slots are ordered [first triangle of every
    tet, then second triangle of every tet] — a permutation of the AoS
    path's per-tet interleaving, irrelevant to mesh extraction. Identical
    geometry to :func:`marching_tets` (tested)."""
    ea, eb = tables['edge_a'], tables['edge_b']
    occ = sdf > 0
    sa, sb = sdf[ea], sdf[eb]
    crossing = occ[ea] ^ occ[eb]
    denom = sa - sb
    safe = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
    wa = -sb / safe
    wb = sa / safe
    verts_T = jnp.stack([v_pos_T[j][ea] * wa + v_pos_T[j][eb] * wb
                         for j in range(3)])                 # (3, E)

    tets_T = tables['tets_T']                                # (4, T)
    T = tets_T.shape[1]
    occ4 = occ[tets_T]                                       # (4, T)
    pow2 = jnp.asarray([[1], [2], [4], [8]], jnp.int32)
    tetindex = jnp.sum(occ4.astype(jnp.int32) * pow2, axis=0)  # (T,)
    num_tri = tables['ntri_table'][tetindex]                 # (T,)
    t6 = tables['tet2edge_flat']
    base = jnp.arange(T, dtype=jnp.int32) * 6
    ge = [t6[base + jnp.maximum(tables['tri_table_T'][j][tetindex], 0)]
          for j in range(6)]                                 # 6 x (T,)
    faces_T = jnp.stack([jnp.concatenate([ge[j], ge[3 + j]])
                         for j in range(3)])                 # (3, 2T)
    face_mask = jnp.concatenate([num_tri >= 1, num_tri == 2])
    return verts_T, crossing, faces_T, face_mask


def compact_mesh_soa(verts_T, crossing, faces_T, face_mask
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side compaction of :func:`marching_tets_soa` outputs."""
    verts = np.asarray(verts_T).T
    vmask = np.asarray(crossing)
    faces = np.asarray(faces_T).T[np.asarray(face_mask)]
    remap = -np.ones(verts.shape[0], np.int64)
    used = np.zeros(verts.shape[0], bool)
    used[faces.reshape(-1)] = True
    used &= vmask
    remap[used] = np.arange(used.sum())
    v = verts[used]
    f = remap[faces]
    assert (f >= 0).all(), "face references a non-crossing edge vertex"
    return v.astype(np.float32), f.astype(np.int64)
