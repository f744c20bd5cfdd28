"""Online incremental meshing (ImMesh analog) tests.

Reference behavior being matched: mesh/src/ImMesh_mesh_reconstruction.cpp
(point append with dedup, per-voxel Delaunay retriangulation, per-point RGB
update) re-designed fixed-shape for TPU in mesh/incremental.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.mesh import incremental as im


def _floor_points(rng, extent=1.8, n=400, z=0.0, noise=5e-3):
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-extent / 2, extent / 2, n)
    pts[:, 1] = rng.uniform(-extent / 2, extent / 2, n)
    pts[:, 2] = z + rng.normal(0, noise, n)
    return pts


def test_insert_dedups_and_assigns_stable_vids(rng):
    cfg = im.MeshConfig(capacity=2048, insert_chunk=512)
    mesh = im.MeshMap.empty(cfg)
    pts = _floor_points(rng, n=512)
    mesh, _ = im.insert(mesh, jnp.asarray(pts), jnp.ones((512,)), cfg)
    code = np.asarray(mesh.code)
    live = code != int(im.INVALID)
    n1 = int(live.sum())
    assert n1 > 50
    # codes sorted, vids unique, all in [0, 512)
    assert np.all(np.diff(code[live]) >= 0)
    vids = np.asarray(mesh.vid)[live]
    assert len(set(vids.tolist())) == n1
    assert vids.min() >= 0 and vids.max() < 512
    # re-inserting the same points must not create new vertices
    mesh2, ev = im.insert(mesh, jnp.asarray(pts), jnp.ones((512,)), cfg)
    assert np.all(np.asarray(ev) == int(im.INVALID))  # no capacity eviction
    live2 = np.asarray(mesh2.code) != int(im.INVALID)
    assert int(live2.sum()) == n1
    # survivors keep their original (stable) ids
    assert set(np.asarray(mesh2.vid)[live2].tolist()) == set(vids.tolist())


def test_retriangulate_covers_flat_floor(rng):
    cfg = im.MeshConfig(capacity=4096, insert_chunk=1024)
    mesher = im.OnlineMesher(cfg)
    pts = _floor_points(rng, extent=1.8, n=1024)
    mesher.add_frame(pts)
    st = mesher.stats()
    assert st["triangles"] > 20, st
    # triangle area sum approximates the sampled floor area
    vids, vpts, _ = mesher.vertices()
    row = {int(v): i for i, v in enumerate(vids)}
    tris = mesher.triangles()
    area = 0.0
    for t in tris:
        a, b, c = (vpts[row[int(v)]] for v in t)
        area += 0.5 * np.linalg.norm(np.cross(b - a, c - a))
    hull_area = 1.8 * 1.8
    assert 0.4 * hull_area < area < 1.3 * hull_area, area
    # every triangle nearly coplanar with the floor
    for t in tris[:64]:
        a, b, c = (vpts[row[int(v)]] for v in t)
        n = np.cross(b - a, c - a)
        n = n / (np.linalg.norm(n) + 1e-12)
        assert abs(n[2]) > 0.95


def test_triangles_unique_ownership(rng):
    """Centroid-ownership must emit each triangle from exactly one voxel."""
    cfg = im.MeshConfig(capacity=4096, insert_chunk=1024)
    mesher = im.OnlineMesher(cfg)
    mesher.add_frame(_floor_points(rng, extent=2.2, n=1024))
    tris = mesher.triangles()
    keys = {tuple(sorted(map(int, t))) for t in tris}
    assert len(keys) == tris.shape[0], "duplicate triangles across voxels"


def test_incremental_updates_on_new_frames(rng):
    cfg = im.MeshConfig(capacity=8192, insert_chunk=1024)
    mesher = im.OnlineMesher(cfg)
    mesher.add_frame(_floor_points(rng, extent=1.5, n=700))
    t1 = mesher.stats()["triangles"]
    # second frame extends the floor in +x: mesh grows, old region intact
    pts2 = _floor_points(rng, extent=1.5, n=700)
    pts2[:, 0] += 1.5
    mesher.add_frame(pts2)
    t2 = mesher.stats()["triangles"]
    assert t2 > t1


def test_update_rgb_textures_vertices(rng):
    cfg = im.MeshConfig(capacity=2048, insert_chunk=512)
    intr = np.array([200.0, 200.0, 120.0, 90.0], np.float32)  # fx fy cx cy
    mesher = im.OnlineMesher(cfg, intrinsics=intr)
    pts = _floor_points(rng, extent=1.0, n=512, z=0.0)
    # camera 2 m above the floor looking straight down:
    # cam x -> world x, cam y -> world -y, cam z -> world -z
    r_wc = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    t_wc = np.array([0, 0, 2.0], np.float32)
    img = np.zeros((180, 240, 3), np.float32)
    img[:, :, 0] = 210.0  # uniform red
    img[:, :, 1] = 40.0
    mesher.add_frame(pts, image=img, r_wc=r_wc, t_wc=t_wc)
    vids, vpts, rgb = mesher.vertices()
    w = np.asarray(mesher.mesh.w)
    seen = w[np.asarray(mesher.mesh.code) != int(im.INVALID)] > 0
    assert seen.sum() > 20
    np.testing.assert_allclose(rgb[seen][:, 0], 210.0, atol=1e-3)
    np.testing.assert_allclose(rgb[seen][:, 1], 40.0, atol=1e-3)
    # second differently-colored view blends (running mean)
    img2 = np.zeros_like(img)
    img2[:, :, 0] = 10.0
    img2[:, :, 1] = 240.0
    mesher.add_frame(np.zeros((0, 3), np.float32), image=img2,
                     r_wc=r_wc, t_wc=t_wc)
    _, _, rgb2 = mesher.vertices()
    assert np.all(rgb2[seen][:, 0] < 210.0)
    assert np.all(rgb2[seen][:, 1] > 40.0)


def test_export_ply(tmp_path, rng):
    cfg = im.MeshConfig(capacity=2048, insert_chunk=512)
    mesher = im.OnlineMesher(cfg)
    mesher.add_frame(_floor_points(rng, n=512))
    path = str(tmp_path / "mesh.ply")
    nv, nf = mesher.export_ply(path)
    assert nv > 0 and nf > 0
    lines = open(path).read().splitlines()
    assert lines[0] == "ply"
    hdr_end = lines.index("end_header")
    assert f"element vertex {nv}" in lines[:hdr_end]
    assert f"element face {nf}" in lines[:hdr_end]
    body = lines[hdr_end + 1:]
    assert len(body) == nv + nf
    # faces reference valid vertex rows
    for fl in body[nv:]:
        parts = fl.split()
        assert parts[0] == "3"
        assert all(0 <= int(x) < nv for x in parts[1:])


def test_capacity_overflow_surfaces_evictions(rng):
    """Overflowing cfg.capacity must report evicted voxels (not silently
    truncate) and the mesher must re-mesh/prune them."""
    cfg = im.MeshConfig(capacity=64, insert_chunk=256, max_per_voxel=12)
    mesher = im.OnlineMesher(cfg)
    pts = _floor_points(rng, extent=4.0, n=1000)  # far more survivors than 64
    mesher.add_frame(pts)
    assert mesher.evicted_vertices > 0
    # no stale triangle may reference a dead vid
    vids, _, _ = mesher.vertices()
    live = set(int(v) for v in vids)
    for t in mesher.triangles():
        assert all(int(v) in live for v in t), "stale triangle after eviction"


def test_update_rgb_occlusion_gate(rng):
    """A far view must not repaint vertices first seen up close (reference
    RGB_pts::update_rgb obs-distance gate, pointcloud_rgbd.cpp:138)."""
    cfg = im.MeshConfig(capacity=2048, insert_chunk=512)
    intr = np.array([200.0, 200.0, 120.0, 90.0], np.float32)
    mesher = im.OnlineMesher(cfg, intrinsics=intr)
    pts = _floor_points(rng, extent=1.0, n=512, z=0.0)
    r_wc = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    img_red = np.zeros((180, 240, 3), np.float32)
    img_red[:, :, 0] = 200.0
    mesher.add_frame(pts, image=img_red, r_wc=r_wc,
                     t_wc=np.array([0, 0, 2.0], np.float32))
    _, _, rgb1 = mesher.vertices()
    w1 = np.asarray(mesher.mesh.w).copy()
    # same direction but 3x farther: outside the 1.2x margin -> skipped
    img_blue = np.zeros_like(img_red)
    img_blue[:, :, 2] = 200.0
    mesher.add_frame(np.zeros((0, 3), np.float32), image=img_blue,
                     r_wc=r_wc, t_wc=np.array([0, 0, 6.0], np.float32))
    _, _, rgb2 = mesher.vertices()
    seen = w1[np.asarray(mesher.mesh.code) != int(im.INVALID)] > 0
    np.testing.assert_allclose(rgb2[seen], rgb1[seen], atol=1e-4)


def test_position_running_mean_denoises(rng):
    """Re-observing a surface must average vertex positions toward truth."""
    cfg = im.MeshConfig(capacity=4096, insert_chunk=1024)
    mesher = im.OnlineMesher(cfg)
    base = _floor_points(rng, extent=1.5, n=1024, noise=0.0)
    for _ in range(4):
        noisy = base.copy()
        noisy[:, 2] += rng.normal(0, 5e-3, base.shape[0]).astype(np.float32)
        mesher.add_frame(noisy)
    _, vpts, _ = mesher.vertices()
    assert np.abs(vpts[:, 2]).std() < 4e-3   # below single-scan noise


def test_delaunay_empty_circumcircle_property(rng):
    """Spot-check the Delaunay condition on one voxel's triangulation."""
    cfg = im.MeshConfig(capacity=1024, insert_chunk=256)
    mesher = im.OnlineMesher(cfg)
    # a handful of points well inside one voxel (voxel_size 0.5)
    pts = np.zeros((256, 3), np.float32)
    m = 10
    pts[:m, 0] = rng.uniform(0.05, 0.45, m)
    pts[:m, 1] = rng.uniform(0.05, 0.45, m)
    mesher.add_frame(pts[:m])
    vids, vpts, _ = mesher.vertices()
    row = {int(v): i for i, v in enumerate(vids)}
    tris = mesher.triangles()
    assert tris.shape[0] >= 1
    p2 = vpts[:, :2]
    for t in tris:
        a, b, c = (p2[row[int(v)]] for v in t)
        # circumcenter
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                 + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
              + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
              + (c @ c) * (b[0] - a[0])) / d
        cen = np.array([ux, uy])
        r = np.linalg.norm(a - cen)
        ids = {int(v) for v in t}
        for v, q in zip(vids, p2):
            if int(v) in ids:
                continue
            assert np.linalg.norm(q - cen) > r - 5e-3, (t, v)


def test_mesh_snapshot_tool(tmp_path, rng):
    """Offline mesh viewer (tools/mesh_snapshot.py): PLY -> rendered image
    with nonzero coverage (VERDICT r3 missing #7 inspection gap)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    from mesh_snapshot import snapshot, load_ply

    from ground_fusion2_tpu.mesh.incremental import MeshConfig, OnlineMesher
    mesher = OnlineMesher(MeshConfig(capacity=1 << 12))
    # flat textured floor patch
    xs, ys = np.meshgrid(np.linspace(0, 3, 40), np.linspace(0, 3, 40))
    pts = np.stack([xs.ravel(), ys.ravel(),
                    np.zeros(xs.size)], -1).astype(np.float32)
    mesher.add_frame(pts)
    ply = tmp_path / "m.ply"
    n_v, n_f = mesher.export_ply(str(ply))
    assert n_f > 10
    verts, rgb, faces = load_ply(str(ply))
    assert verts.shape[0] == n_v and faces.shape[0] == n_f
    img = snapshot(str(ply), str(tmp_path / "snap.ppm"))
    assert img.shape == (480, 640, 3)
    # the floor fills a substantial part of the frame
    assert (img.sum(axis=2) > 0).mean() > 0.1
    assert (tmp_path / "snap.ppm").exists()
