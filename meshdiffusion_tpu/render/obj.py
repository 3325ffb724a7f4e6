"""Wavefront OBJ mesh I/O with materials.

Counterpart of reference ``nvdiffrec/lib/render/obj.py`` (load_obj:31-160,
write_obj:165-216): parses v/vt/vn/f with mtllib/usemtl, fan-triangulates,
merges multi-material meshes into one atlas, injects a default material when
none is present.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import material as material_mod
from . import mesh as mesh_mod
from . import texture


def load_obj(filename: str, clear_ks: bool = True,
             mtl_override: Optional[str] = None) -> mesh_mod.Mesh:
    obj_path = os.path.dirname(filename)

    verts, texcoords, normals = [], [], []
    faces, tfaces, nfaces, mfaces = [], [], [], []
    all_materials = []
    used_materials = []
    active_mat = -1

    with open(filename) as f:
        lines = f.readlines()

    # pass 1: materials
    for line in lines:
        if line.split() and line.split()[0] == 'mtllib':
            path = (mtl_override if mtl_override
                    else os.path.join(obj_path, line.split()[1]))
            if os.path.exists(path):
                all_materials += material_mod.load_mtl(path, clear_ks)
    mat_by_name = {m.get('name'): m for m in all_materials}

    # pass 2: geometry
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        tag = parts[0]
        if tag == 'v':
            verts.append([float(v) for v in parts[1:4]])
        elif tag == 'vt':
            val = [float(v) for v in parts[1:3]]
            texcoords.append([val[0], 1.0 - val[1]])
        elif tag == 'vn':
            normals.append([float(v) for v in parts[1:4]])
        elif tag == 'usemtl':
            name = parts[1]
            if name in mat_by_name:
                m = mat_by_name[name]
                if m not in used_materials:
                    used_materials.append(m)
                active_mat = used_materials.index(m)
            else:
                active_mat = -1
        elif tag == 'f':
            vv = parts[1:]

            def split_idx(s):
                comp = (s.split('/') + ['', ''])[:3]
                vi = int(comp[0]) - 1
                ti = int(comp[1]) - 1 if comp[1] else -1
                ni = int(comp[2]) - 1 if comp[2] else -1
                return vi, ti, ni

            v0, t0, n0 = split_idx(vv[0])
            for i in range(len(vv) - 2):  # fan triangulation
                v1, t1, n1 = split_idx(vv[i + 1])
                v2, t2, n2 = split_idx(vv[i + 2])
                faces.append([v0, v1, v2])
                tfaces.append([t0, t1, t2])
                nfaces.append([n0, n1, n2])
                mfaces.append(max(active_mat, 0))

    assert len(faces) > 0, 'empty mesh'
    if not used_materials:
        used_materials = [material_mod.Material({
            'name': '_default',
            'bsdf': 'pbr',
            'kd': texture.Texture2D(np.asarray([0.5, 0.5, 0.5], np.float32)),
            'ks': texture.Texture2D(np.asarray([0.0, 0.5, 0.0], np.float32)),
        })]

    if not texcoords:
        texcoords = [[0.0, 0.0]]
        tfaces = [[0, 0, 0]] * len(faces)
    uber, texcoords, tfaces = material_mod.merge_materials(
        used_materials, texcoords, tfaces, mfaces)

    m = mesh_mod.Mesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(texcoords, jnp.float32),
        t_tex_idx=jnp.asarray(tfaces, jnp.int32),
        v_nrm=jnp.asarray(normals, jnp.float32) if normals else None,
        t_nrm_idx=jnp.asarray(nfaces, jnp.int32) if normals else None,
        material=uber)
    return m


def load_mesh(filename: str, mtl_override: Optional[str] = None
              ) -> mesh_mod.Mesh:
    """Dispatch by extension (reference mesh.py:99-103)."""
    assert filename.lower().endswith('.obj'), f'unsupported format: {filename}'
    return load_obj(filename, clear_ks=True, mtl_override=mtl_override)


def write_obj(folder: str, mesh: mesh_mod.Mesh, save_material: bool = True
              ) -> str:
    """Write mesh.obj (+ mesh.mtl + textures) into folder
    (reference obj.py:165-216)."""
    os.makedirs(folder, exist_ok=True)
    obj_file = os.path.join(folder, 'mesh.obj')
    v_pos = np.asarray(mesh.v_pos)
    t_pos_idx = np.asarray(mesh.t_pos_idx)
    v_tex = np.asarray(mesh.v_tex) if mesh.v_tex is not None else None
    t_tex_idx = np.asarray(mesh.t_tex_idx) if mesh.t_tex_idx is not None else None
    v_nrm = np.asarray(mesh.v_nrm) if mesh.v_nrm is not None else None
    t_nrm_idx = np.asarray(mesh.t_nrm_idx) if mesh.t_nrm_idx is not None else None

    with open(obj_file, 'w') as f:
        f.write('mtllib mesh.mtl\ng default\n')
        for v in v_pos:
            f.write(f'v {v[0]} {v[1]} {v[2]}\n')
        if v_tex is not None:
            for t in v_tex:
                f.write(f'vt {t[0]} {1.0 - t[1]}\n')
        if v_nrm is not None:
            for n in v_nrm:
                f.write(f'vn {n[0]} {n[1]} {n[2]}\n')
        f.write('s 1\ng pMesh1\nusemtl defaultMat\n')
        for i in range(len(t_pos_idx)):
            f.write('f ')
            for j in range(3):
                vi = t_pos_idx[i][j] + 1
                ti = '' if t_tex_idx is None else t_tex_idx[i][j] + 1
                ni = '' if t_nrm_idx is None else t_nrm_idx[i][j] + 1
                f.write(f' {vi}/{ti}/{ni}')
            f.write('\n')

    if save_material and mesh.material is not None:
        material_mod.save_mtl(os.path.join(folder, 'mesh.mtl'), mesh.material)
    return obj_file
