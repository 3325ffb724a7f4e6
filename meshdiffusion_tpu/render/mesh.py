"""Triangle-mesh container and geometry ops.

Counterpart of reference ``nvdiffrec/lib/render/mesh.py`` (Mesh
container:20-93, aabb:108-116, unique edges:121-173, center_by_reference:
190-195, auto_normals:200-225, mikktspace compute_tangents:231-277).
All per-vertex ops are fixed-shape jnp scatter/gather and support padded
meshes through an optional face validity mask — so they compose with the
padded marching-tets output under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .utils import dot, safe_normalize


@dataclasses.dataclass
class Mesh:
    """Attribute bundle with base-inheritance (reference mesh.py:20-93)."""
    v_pos: Optional[jnp.ndarray] = None          # (V, 3)
    t_pos_idx: Optional[jnp.ndarray] = None      # (F, 3) int32
    v_nrm: Optional[jnp.ndarray] = None
    t_nrm_idx: Optional[jnp.ndarray] = None
    v_tex: Optional[jnp.ndarray] = None
    t_tex_idx: Optional[jnp.ndarray] = None
    v_tng: Optional[jnp.ndarray] = None
    t_tng_idx: Optional[jnp.ndarray] = None
    f_nrm: Optional[jnp.ndarray] = None
    material: Any = None
    face_mask: Optional[jnp.ndarray] = None      # (F,) bool for padded meshes
    valid_vert_idx: Any = None

    @staticmethod
    def combine(base: "Mesh", **updates) -> "Mesh":
        fields = {f.name: getattr(base, f.name) for f in dataclasses.fields(base)}
        fields.update({k: v for k, v in updates.items() if v is not None})
        return Mesh(**fields)

    def copy_none(self, other: "Mesh") -> None:
        for f in dataclasses.fields(self):
            if getattr(self, f.name) is None:
                setattr(self, f.name, getattr(other, f.name))


def aabb(v_pos: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return v_pos.min(axis=0), v_pos.max(axis=0)


def center_by_reference(mesh: Mesh, ref_aabb, scale: float) -> Mesh:
    center = (ref_aabb[0] + ref_aabb[1]) * 0.5
    s = scale / float(np.max(np.asarray(ref_aabb[1] - ref_aabb[0])))
    return Mesh.combine(mesh, v_pos=(mesh.v_pos - center[None]) * s)


def _face_weights(mesh: Mesh, like: jnp.ndarray) -> jnp.ndarray:
    if mesh.face_mask is None:
        return jnp.ones(like.shape[:1], like.dtype)[:, None]
    return mesh.face_mask.astype(like.dtype)[:, None]


def auto_normals(mesh: Mesh) -> Mesh:
    """Area-weighted smooth vertex normals (reference mesh.py:200-225)."""
    i0, i1, i2 = (mesh.t_pos_idx[:, k] for k in range(3))
    v0, v1, v2 = mesh.v_pos[i0], mesh.v_pos[i1], mesh.v_pos[i2]
    f_nrm = jnp.cross(v1 - v0, v2 - v0)
    w = _face_weights(mesh, f_nrm)
    fw = f_nrm * w
    v_nrm = jnp.zeros_like(mesh.v_pos)
    v_nrm = v_nrm.at[i0].add(fw).at[i1].add(fw).at[i2].add(fw)
    v_nrm = jnp.where(dot(v_nrm, v_nrm) > 1e-20, v_nrm,
                      jnp.asarray([0.0, 0.0, 1.0], v_nrm.dtype))
    v_nrm = safe_normalize(v_nrm)
    return Mesh.combine(mesh, v_nrm=v_nrm, t_nrm_idx=mesh.t_pos_idx,
                        f_nrm=f_nrm)


def compute_tangents(mesh: Mesh) -> Mesh:
    """Per-vertex tangents from UVs, mikktspace conventions
    (reference mesh.py:231-277)."""
    pos = [mesh.v_pos[mesh.t_pos_idx[:, i]] for i in range(3)]
    tex = [mesh.v_tex[mesh.t_tex_idx[:, i]] for i in range(3)]
    vn_idx = [mesh.t_nrm_idx[:, i] for i in range(3)]

    uve1 = tex[1] - tex[0]
    uve2 = tex[2] - tex[0]
    pe1 = pos[1] - pos[0]
    pe2 = pos[2] - pos[0]

    nom = pe1 * uve2[..., 1:2] - pe2 * uve1[..., 1:2]
    denom = uve1[..., 0:1] * uve2[..., 1:2] - uve1[..., 1:2] * uve2[..., 0:1]
    denom_safe = jnp.where(denom > 0.0, jnp.clip(denom, min=1e-6),
                           jnp.clip(denom, max=-1e-6))
    tang = nom / denom_safe

    w = _face_weights(mesh, tang)
    tangents = jnp.zeros_like(mesh.v_nrm)
    tansum = jnp.zeros_like(mesh.v_nrm)
    for i in range(3):
        tangents = tangents.at[vn_idx[i]].add(tang * w)
        tansum = tansum.at[vn_idx[i]].add(jnp.ones_like(tang) * w)
    tangents = tangents / jnp.maximum(tansum, 1e-20)
    tangents = safe_normalize(tangents)
    tangents = safe_normalize(tangents - dot(tangents, mesh.v_nrm) * mesh.v_nrm)
    return Mesh.combine(mesh, v_tng=tangents, t_tng_idx=mesh.t_nrm_idx)


def unique_edges(t_pos_idx: np.ndarray) -> np.ndarray:
    """Sorted unique mesh edges (host-side; reference mesh.py:121-141)."""
    e = np.concatenate([t_pos_idx[:, [0, 1]], t_pos_idx[:, [1, 2]],
                        t_pos_idx[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)
