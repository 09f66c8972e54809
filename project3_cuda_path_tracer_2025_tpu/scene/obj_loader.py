"""Wavefront OBJ import (pure Python, no tiny_obj_loader).

Parity with ``Scene::loadFromOBJ`` (``src/scene.cpp:226-363``):

* supports v / vn / vt / f records with 1-based and negative indices,
* per-face fan triangulation (``src/scene.cpp:324-341``),
* vertex positions pre-transformed to world space (``:274-275``),
* normals transformed by the inverse-transpose and normalized (``:286-287``),
* UVs default to (0, 0) when absent (``:291-297``),
* flat face normal when the OBJ provides none for a face (``:306-321``),
* per-triangle centroid (``:331``), material id (``:334``) and UV-derived
  tangent frame dpdu/dpdv with degenerate-UV fallback
  (``computeTriangleTangents``, ``:395-426``).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _parse_index(tok: str, count: int) -> int:
    i = int(tok)
    return i - 1 if i > 0 else count + i


def parse_obj(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[List[Tuple[int, int, int]]]]:
    """Parse an OBJ file.

    Returns (positions [V,3], normals [VN,3], uvs [VT,2], faces) where each
    face is a list of (v_idx, vt_idx, vn_idx) with -1 for absent indices.
    """
    positions: List[List[float]] = []
    normals: List[List[float]] = []
    uvs: List[List[float]] = []
    faces: List[List[Tuple[int, int, int]]] = []

    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                positions.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif tag == "vn":
                normals.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif tag == "vt":
                uvs.append([float(parts[1]), float(parts[2])])
            elif tag == "f":
                face = []
                for vert in parts[1:]:
                    comps = vert.split("/")
                    vi = _parse_index(comps[0], len(positions))
                    ti = (
                        _parse_index(comps[1], len(uvs))
                        if len(comps) > 1 and comps[1]
                        else -1
                    )
                    ni = (
                        _parse_index(comps[2], len(normals))
                        if len(comps) > 2 and comps[2]
                        else -1
                    )
                    face.append((vi, ti, ni))
                if len(face) >= 3:
                    faces.append(face)

    return (
        np.asarray(positions, np.float64).reshape(-1, 3),
        np.asarray(normals, np.float64).reshape(-1, 3),
        np.asarray(uvs, np.float64).reshape(-1, 2),
        faces,
    )


def compute_triangle_tangents(p: np.ndarray, uv: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """dpdu/dpdv from UV deltas, degenerate fallback to an arbitrary frame
    (``src/scene.cpp:395-426``).  ``p``: [3,3] positions, ``uv``: [3,2]."""
    dp1 = p[1] - p[0]
    dp2 = p[2] - p[0]
    duv1 = uv[1] - uv[0]
    duv2 = uv[2] - uv[0]
    det = duv1[0] * duv2[1] - duv1[1] * duv2[0]
    if abs(det) < 1e-8:
        n = np.cross(dp1, dp2)
        nl = np.linalg.norm(n)
        n = n / nl if nl > 0 else n
        tl = np.linalg.norm(dp1)
        tangent = dp1 / tl if tl > 0 else dp1
        bitangent = np.cross(n, tangent)
        bl = np.linalg.norm(bitangent)
        bitangent = bitangent / bl if bl > 0 else bitangent
        return tangent, bitangent
    inv_det = 1.0 / det
    dpdu = (dp1 * duv2[1] - dp2 * duv1[1]) * inv_det
    dpdv = (-dp1 * duv2[0] + dp2 * duv1[0]) * inv_det
    return dpdu, dpdv


def load_obj_triangles(
    path: str,
    material_id: int,
    transform: np.ndarray,
    inv_transpose: np.ndarray,
) -> dict:
    """Load an OBJ into world-space-baked SoA triangle arrays.

    Returns a dict matching the ``tri_*`` fields of ``HostScene``.
    """
    positions, normals, uvs, faces = parse_obj(path)

    tri_p: List[np.ndarray] = []
    tri_n: List[np.ndarray] = []
    tri_uv: List[np.ndarray] = []
    tri_mat: List[int] = []
    tri_c: List[np.ndarray] = []
    tri_du: List[np.ndarray] = []
    tri_dv: List[np.ndarray] = []

    r3 = transform[:3, :3]
    t3 = transform[:3, 3]
    n3 = inv_transpose[:3, :3]

    for face in faces:
        fp = []
        fn = []
        fuv = []
        for (vi, ti, ni) in face:
            wp = r3 @ positions[vi] + t3
            fp.append(wp)
            if ni >= 0:
                wn = n3 @ normals[ni]
                ln = np.linalg.norm(wn)
                fn.append(wn / ln if ln > 0 else wn)
            else:
                fn.append(np.zeros(3))
            fuv.append(uvs[ti] if ti >= 0 else np.zeros(2))

        # Flat face normal when the OBJ provided none for this face
        # (src/scene.cpp:306-321; "missing" means every vertex normal ~ 0).
        if all(np.linalg.norm(n) <= 1e-6 for n in fn):
            e1 = fp[1] - fp[0]
            e2 = fp[2] - fp[0]
            fnormal = np.cross(e1, e2)
            ln = np.linalg.norm(fnormal)
            fnormal = fnormal / ln if ln > 0 else fnormal
            fn = [fnormal for _ in fn]

        # Fan triangulation (src/scene.cpp:324-341).
        for i in range(1, len(face) - 1):
            p = np.stack([fp[0], fp[i], fp[i + 1]])
            n = np.stack([fn[0], fn[i], fn[i + 1]])
            uv = np.stack([fuv[0], fuv[i], fuv[i + 1]])
            tri_p.append(p)
            tri_n.append(n)
            tri_uv.append(uv)
            tri_mat.append(material_id)
            tri_c.append(p.mean(axis=0))
            du, dv = compute_triangle_tangents(p, uv)
            tri_du.append(du)
            tri_dv.append(dv)

    if not tri_p:
        from .types import empty_triangle_arrays

        return empty_triangle_arrays()

    return dict(
        tri_positions=np.stack(tri_p).astype(np.float32),
        tri_normals=np.stack(tri_n).astype(np.float32),
        tri_uvs=np.stack(tri_uv).astype(np.float32),
        tri_material_ids=np.asarray(tri_mat, np.int32),
        tri_centroids=np.stack(tri_c).astype(np.float32),
        tri_dpdu=np.stack(tri_du).astype(np.float32),
        tri_dpdv=np.stack(tri_dv).astype(np.float32),
    )
