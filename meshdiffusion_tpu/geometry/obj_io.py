"""Minimal Wavefront OBJ I/O (replaces pytorch3d.io.save_obj, reference
nvdiffrec/eval.py:443-447)."""

from __future__ import annotations

import numpy as np


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Write a triangle mesh. faces are 0-based and written 1-based."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    lines = []
    for v in verts:
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for f in faces:
        lines.append(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}")
    with open(path, 'w') as fh:
        fh.write("\n".join(lines) + "\n")


def read_obj(path: str):
    """Read vertex positions and triangle faces (positions only)."""
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == 'v':
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == 'f':
                idx = [int(p.split('/')[0]) - 1 for p in parts[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int64)
