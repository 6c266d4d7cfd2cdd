"""Minimal OBJ/STL mesh loading for collision geometry.

Host-side only (numpy); meshes become convex-hull vertex sets consumed by the
collision pipeline and renderer. Missing mesh files (the reference repo strips
large blobs — /root/reference/.MISSING_LARGE_BLOBS) degrade gracefully to None
so asset loading never fails on them.
"""
from __future__ import annotations

import os
import struct
from typing import Optional, Tuple

import numpy as np


def load_mesh(path: str) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Returns (vertices (V,3) float32, faces (F,3) int32) or (None, None)."""
    if not path or not os.path.exists(path):
        return None, None
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".obj":
            return _load_obj(path)
        if ext == ".stl":
            return _load_stl(path)
        if ext == ".dae":
            return _load_dae(path)
    except Exception:
        return None, None
    return None, None


def _load_obj(path):
    verts, faces = [], []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    if not verts:
        return None, None
    return (
        np.asarray(verts, dtype=np.float32),
        np.asarray(faces, dtype=np.int32) if faces else None,
    )


def _load_stl(path):
    with open(path, "rb") as f:
        header = f.read(80)
        if header[:5] == b"solid" and b"facet" in open(path, "rb").read(2048):
            return _load_stl_ascii(path)
        (n,) = struct.unpack("<I", f.read(4))
        data = np.fromfile(f, dtype=np.uint8, count=n * 50)
    if len(data) < n * 50:
        return None, None
    rec = data.reshape(n, 50)
    tri = rec[:, 12:48].copy().view(np.float32).reshape(n, 3, 3)
    verts = tri.reshape(-1, 3)
    uniq, inv = np.unique(verts.round(6), axis=0, return_inverse=True)
    faces = inv.reshape(n, 3).astype(np.int32)
    return uniq.astype(np.float32), faces


def _load_stl_ascii(path):
    verts = []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            t = line.split()
            if t and t[0] == "vertex":
                verts.append([float(t[1]), float(t[2]), float(t[3])])
    if not verts:
        return None, None
    v = np.asarray(verts, dtype=np.float32)
    n = len(v) // 3
    uniq, inv = np.unique(v.round(6), axis=0, return_inverse=True)
    return uniq.astype(np.float32), inv[: n * 3].reshape(n, 3).astype(np.int32)


def _load_dae(path):
    """Very small COLLADA reader: pulls the first float_array of positions.
    Visual-only fidelity; fine for hulls/bounds."""
    import xml.etree.ElementTree as ET

    tree = ET.parse(path)
    ns = {"c": tree.getroot().tag.split("}")[0].strip("{")}
    for fa in tree.iter():
        if fa.tag.endswith("float_array") and "positions" in fa.get("id", ""):
            vals = np.fromstring(fa.text, sep=" ", dtype=np.float32)
            if len(vals) >= 9:
                return vals.reshape(-1, 3), None
    return None, None


def convex_hull_vertices(verts: np.ndarray, max_verts: int = 64) -> np.ndarray:
    """Convex hull vertex set, decimated to <= max_verts (farthest-point
    sampling). TPU collision kernels need a fixed small vertex budget."""
    try:
        from scipy.spatial import ConvexHull

        hull = ConvexHull(verts)
        hv = verts[hull.vertices]
    except Exception:
        hv = verts
    if len(hv) <= max_verts:
        return hv.astype(np.float32)
    # farthest point sampling
    sel = [int(np.argmax(np.linalg.norm(hv - hv.mean(0), axis=1)))]
    d = np.linalg.norm(hv - hv[sel[0]], axis=1)
    for _ in range(max_verts - 1):
        i = int(np.argmax(d))
        sel.append(i)
        d = np.minimum(d, np.linalg.norm(hv - hv[i], axis=1))
    return hv[sel].astype(np.float32)
