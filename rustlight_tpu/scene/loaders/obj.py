"""Wavefront OBJ (+MTL) loader.

Reference: src/geometry.rs:13-97 (tobj-based load with diffuse material and
texture import). Pure-Python parser producing TriMesh objects per material
group; polygon faces triangulate as fans.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...bsdfs import diffuse, MaterialDesc, TEX_BITMAP
from ..geometry import TriMesh


def _parse_mtl(path: Path) -> Dict[str, dict]:
    mats: Dict[str, dict] = {}
    cur = None
    if not path.exists():
        return mats
    for line in path.read_text(errors="ignore").splitlines():
        tok = line.split()
        if not tok or tok[0].startswith("#"):
            continue
        if tok[0] == "newmtl":
            cur = tok[1]
            mats[cur] = {}
        elif cur is not None:
            if tok[0] == "Kd":
                mats[cur]["kd"] = tuple(float(x) for x in tok[1:4])
            elif tok[0] == "Ks":
                mats[cur]["ks"] = tuple(float(x) for x in tok[1:4])
            elif tok[0] == "Ns":
                mats[cur]["ns"] = float(tok[1])
            elif tok[0] == "Ke":
                mats[cur]["ke"] = tuple(float(x) for x in tok[1:4])
            elif tok[0] == "map_Kd":
                mats[cur]["map_kd"] = tok[-1]
    return mats


def load_obj(path, default_material: int = 0):
    """Parse an OBJ file.

    Returns (meshes, materials, textures): per-material TriMesh groups, the
    corresponding MaterialDesc list (indices are *local*; the caller offsets
    them), and a list of texture file paths (may be empty).
    """
    path = Path(path)
    vs: List[Tuple[float, float, float]] = []
    vns: List[Tuple[float, float, float]] = []
    vts: List[Tuple[float, float]] = []
    mtl: Dict[str, dict] = {}

    groups: Dict[str, list] = {}
    cur_mat = ""

    for line in path.read_text(errors="ignore").splitlines():
        tok = line.split()
        if not tok or tok[0].startswith("#"):
            continue
        t = tok[0]
        if t == "v":
            vs.append(tuple(float(x) for x in tok[1:4]))
        elif t == "vn":
            vns.append(tuple(float(x) for x in tok[1:4]))
        elif t == "vt":
            vts.append(tuple(float(x) for x in tok[1:3]))
        elif t == "mtllib":
            mtl.update(_parse_mtl(path.parent / tok[1]))
        elif t == "usemtl":
            cur_mat = tok[1]
        elif t == "f":
            corners = []
            for c in tok[1:]:
                parts = c.split("/")
                vi = int(parts[0])
                vi = vi - 1 if vi > 0 else len(vs) + vi
                ti = ni = -1
                if len(parts) > 1 and parts[1]:
                    ti = int(parts[1])
                    ti = ti - 1 if ti > 0 else len(vts) + ti
                if len(parts) > 2 and parts[2]:
                    ni = int(parts[2])
                    ni = ni - 1 if ni > 0 else len(vns) + ni
                corners.append((vi, ti, ni))
            g = groups.setdefault(cur_mat, [])
            for i in range(1, len(corners) - 1):  # fan triangulation
                g.append((corners[0], corners[i], corners[i + 1]))

    meshes, materials, textures = [], [], []
    for mat_name, faces in groups.items():
        md = mtl.get(mat_name, {})
        kd = md.get("kd", (0.8, 0.8, 0.8))
        desc = diffuse(kd)
        if "map_kd" in md:
            tex_path = str(path.parent / md["map_kd"])
            desc.tex_kind = TEX_BITMAP
            desc.tex_img = len(textures)
            textures.append(tex_path)
        materials.append(desc)
        emission = np.asarray(md.get("ke", (0, 0, 0)), np.float32)

        # build indexed arrays with deduped (v, t, n) corners
        remap: Dict[Tuple[int, int, int], int] = {}
        verts, uvs, norms, idx = [], [], [], []
        has_uv = has_n = False
        for tri in faces:
            ids = []
            for corner in tri:
                if corner not in remap:
                    remap[corner] = len(verts)
                    vi, ti, ni = corner
                    verts.append(vs[vi])
                    uvs.append(vts[ti] if ti >= 0 else (0.0, 0.0))
                    norms.append(vns[ni] if ni >= 0 else (0.0, 0.0, 0.0))
                    if ti >= 0:
                        has_uv = True
                    if ni >= 0:
                        has_n = True
                ids.append(remap[corner])
            idx.append(ids)
        meshes.append(TriMesh(
            vertices=np.asarray(verts, np.float32),
            indices=np.asarray(idx, np.int32),
            normals=np.asarray(norms, np.float32) if has_n else None,
            uvs=np.asarray(uvs, np.float32) if has_uv else None,
            material=len(materials) - 1,
            emission=emission,
            name=f"{path.stem}:{mat_name}",
        ))
    return meshes, materials, textures
