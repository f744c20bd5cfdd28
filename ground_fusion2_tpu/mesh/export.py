"""Map export: colored point clouds and voxel-surface meshes to PLY.

The reference's ImMesh subsystem (OpenGL GUI + per-voxel Delaunay
retriangulation, ``mesh/``) is visualization, not localization — SURVEY.md §7
scopes the TPU rebuild to offline exports: the LIO voxel map dumps as a point
cloud or as a blocky voxel-surface mesh (exposed faces of occupied voxels),
both standard PLY consumable by MeshLab/CloudCompare.
"""

from __future__ import annotations

import numpy as np

from ..lio import voxel_map as vm


def export_pointcloud_ply(path: str, pts: np.ndarray,
                          colors: np.ndarray | None = None):
    pts = np.asarray(pts, np.float32)
    n = pts.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            line = f"{pts[i, 0]:.4f} {pts[i, 1]:.4f} {pts[i, 2]:.4f}"
            if colors is not None:
                c = colors[i].astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")


def voxel_surface_mesh(map_: vm.VoxelMap, cfg: vm.VoxelMapConfig):
    """Exposed faces of occupied voxels -> (vertices [V,3], faces [F,4])."""
    codes = np.asarray(map_.code)
    valid = codes != int(vm.INVALID)
    occ = set(codes[valid].tolist())
    vs = cfg.voxel_size
    origin = np.asarray(map_.origin)

    def unpack(code):
        m = (1 << vm.BITS) - 1
        ix = (code & m) - vm.HALF
        iy = ((code >> vm.BITS) & m) - vm.HALF
        iz = ((code >> (2 * vm.BITS)) & m) - vm.HALF
        return ix, iy, iz

    def pack(ix, iy, iz):
        return ((ix + vm.HALF) | ((iy + vm.HALF) << vm.BITS)
                | ((iz + vm.HALF) << (2 * vm.BITS)))

    verts: list = []
    faces: list = []
    vid: dict = {}

    def vertex(ix, iy, iz):
        key = (ix, iy, iz)
        if key not in vid:
            vid[key] = len(verts)
            verts.append(origin + np.array([ix, iy, iz]) * vs)
        return vid[key]

    # face corner offsets per axis direction
    FACE = {
        (+1, 0, 0): [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],
        (-1, 0, 0): [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],
        (0, +1, 0): [(0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0)],
        (0, -1, 0): [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
        (0, 0, +1): [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
        (0, 0, -1): [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],
    }
    for code in occ:
        ix, iy, iz = unpack(code)
        for (dx, dy, dz), corners in FACE.items():
            if pack(ix + dx, iy + dy, iz + dz) in occ:
                continue  # neighbor occupied: face hidden
            faces.append([vertex(ix + cx, iy + cy, iz + cz)
                          for cx, cy, cz in corners])
    return (np.asarray(verts, np.float32).reshape(-1, 3),
            np.asarray(faces, np.int64).reshape(-1, 4))


def export_voxel_mesh_ply(path: str, map_: vm.VoxelMap, cfg: vm.VoxelMapConfig):
    verts, faces = voxel_surface_mesh(map_, cfg)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {verts.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {faces.shape[0]}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for fc in faces:
            f.write(f"4 {fc[0]} {fc[1]} {fc[2]} {fc[3]}\n")
    return verts.shape[0], faces.shape[0]
