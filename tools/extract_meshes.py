"""Extract + decimate the Bez visual meshes into a compact shipped asset.

The reference renders per-link .obj/.dae visual meshes through the Isaac Gym
viewer (soccerbot_stl.urdf <visual> entries; meshes under
resources/assets/bez/meshes/).  Headless on TPU we ship the same geometry,
decimated by vertex clustering to a small triangle budget per link, as ONE
npz (bez_isaacgym_tpu/assets/meshes.npz) that viz/render.py transforms
through our forward kinematics.

Run once at development time (requires /root/reference mounted):

    python tools/extract_meshes.py [--tris-per-link 400]

Decimation is quadric-free vertex clustering: snap vertices to a uniform
grid, merge coincident cells, drop degenerate triangles; the grid pitch is
binary-searched per mesh to land under the triangle budget.  Good enough for
viewer silhouettes, tiny enough to commit (~100 KB total vs 12 MB of source
meshes).
"""

from __future__ import annotations

import argparse
import os
import re
import xml.etree.ElementTree as ET

import numpy as np

REF = "/root/reference/resources/assets/bez"
OUT = os.path.join(os.path.dirname(__file__), "..", "bez_isaacgym_tpu",
                   "assets", "meshes.npz")


def load_obj(path: str):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):     # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def load_dae(path: str):
    """Minimal COLLADA reader for the meshlab-exported bez .dae files:
    one positions float_array + <triangles> with VERTEX at offset 0."""
    txt = open(path).read()
    ns = {"c": re.search(r'xmlns="([^"]+)"', txt).group(1)}
    root = ET.fromstring(txt)
    arrs, tris = [], []
    for src in root.iterfind(".//c:source", ns):
        if "position" in src.get("id", ""):
            fa = src.find("c:float_array", ns)
            arrs.append(np.array(fa.text.split(), dtype=np.float64).reshape(-1, 3))
    verts = np.concatenate(arrs, 0) if arrs else np.zeros((0, 3))
    for tr in root.iterfind(".//c:triangles", ns):
        inputs = tr.findall("c:input", ns)
        stride = max(int(i.get("offset")) for i in inputs) + 1
        voff = next(int(i.get("offset")) for i in inputs
                    if i.get("semantic") == "VERTEX")
        p = np.array(tr.find("c:p", ns).text.split(), dtype=np.int64)
        tris.append(p.reshape(-1, 3 * stride)[:, voff::stride])
    faces = np.concatenate(tris, 0) if tris else np.zeros((0, 3), np.int64)
    up = root.find(".//c:up_axis", ns)
    if up is not None and up.text.strip() == "Y_UP":
        verts = verts[:, [0, 2, 1]] * np.array([1.0, -1.0, 1.0])
    return verts, faces


def cluster_decimate(verts, faces, max_tris: int):
    """Vertex-clustering decimation to <= max_tris triangles."""
    if len(faces) <= max_tris:
        return verts, faces
    lo = verts.min(0)
    span = float((verts.max(0) - lo).max()) + 1e-9

    def at(pitch):
        cell = np.floor((verts - lo) / pitch).astype(np.int64)
        key = (cell[:, 0] << 42) | (cell[:, 1] << 21) | cell[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
        # new vertex = mean of cluster members
        nv = np.zeros((len(uniq), 3))
        np.add.at(nv, inv, verts)
        cnt = np.bincount(inv, minlength=len(uniq))[:, None]
        nv /= cnt
        nf = inv[faces]
        keep = ((nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2])
                & (nf[:, 0] != nf[:, 2]))
        nf = np.unique(np.sort(nf[keep], axis=1), axis=0)
        return nv, nf

    lo_p, hi_p = span / 512, span / 2
    best = at(hi_p)
    for _ in range(24):                      # binary-search the pitch
        mid = (lo_p * hi_p) ** 0.5
        nv, nf = at(mid)
        if len(nf) <= max_tris:
            best, hi_p = (nv, nf), mid
        else:
            lo_p = mid
    return best


def euler_to_rot(rpy):
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = (np.cos(r), np.sin(r), np.cos(p), np.sin(p),
                              np.cos(y), np.sin(y))
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris-per-link", type=int, default=400)
    args = ap.parse_args()

    urdf = ET.parse(os.path.join(REF, "model", "soccerbot_stl.urdf"))
    out = {}
    total = 0
    for link in urdf.iterfind(".//link"):
        vis = link.find("visual")
        if vis is None:
            continue
        mesh = vis.find("geometry/mesh")
        if mesh is None:
            continue
        name = link.get("name").lstrip("/")
        fn = os.path.normpath(os.path.join(REF, "model",
                                           mesh.get("filename")))
        # Prefer the .obj twin (already Z-up, simpler); fall back to .dae.
        obj = fn[:-4] + ".obj"
        verts, faces = (load_obj(obj) if os.path.exists(obj)
                        else load_dae(fn))
        scale = np.array(mesh.get("scale", "1 1 1").split(), dtype=np.float64)
        verts = verts * scale
        org = vis.find("origin")
        if org is not None:
            xyz = np.array(org.get("xyz", "0 0 0").split(), dtype=np.float64)
            rpy = np.array(org.get("rpy", "0 0 0").split(), dtype=np.float64)
            verts = verts @ euler_to_rot(rpy).T + xyz
        nv, nf = cluster_decimate(verts, faces, args.tris_per_link)
        out[f"{name}:verts"] = nv.astype(np.float32)
        out[f"{name}:faces"] = nf.astype(np.int32)
        total += len(nf)
        print(f"{name:18s} {len(verts):6d}v {len(faces):6d}t -> "
              f"{len(nv):5d}v {len(nf):5d}t")
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)//2} links, {total} tris, "
          f"{os.path.getsize(OUT)/1024:.0f} KB")


if __name__ == "__main__":
    main()
