"""M3DGR-format end-to-end regression: rendered images -> full pipeline -> ATE.

The north-star validation path (reference ``README.md:146-189``): a sequence
with the *real M3DGR calibration* (``configs/m3dgr.yaml``) in the exact
converted-bag log format, replayed through the complete pipeline — CLAHE,
Shi-Tomasi/KLT, RANSAC rejection, depth association, sliding-window VIO,
LIO with the degeneracy switch, online meshing — and scored by ATE against
ground truth. Real bags are not shippable; the sequence is rendered
(data/render.py), but every pipeline stage runs exactly as it would on
converted real data.

Budget note: ONE full LVIO+mesh replay is shared module-wide (the replay is
the expensive part); each test asserts one aspect of the same run.
"""

import numpy as np
import pytest

from ground_fusion2_tpu.config.loader import load_config
from ground_fusion2_tpu.data.m3dgr_sim import generate_m3dgr_log, replay_m3dgr_log
from ground_fusion2_tpu.eval.metrics import ate_rmse


@pytest.fixture(scope="module")
def m3dgr_run(tmp_path_factory):
    cfg = load_config("configs/m3dgr.yaml")
    d = tmp_path_factory.mktemp("m3dgr")
    path = str(d / "seq01.gf2log")
    generate_m3dgr_log(path, cfg, duration=8.0, with_lidar=True, seed=0)
    ply = str(d / "mesh.ply")
    res = replay_m3dgr_log(path, cfg, num_feats=64, use_lidar=True,
                           use_mesh=True, mesh_ply=ply, use_occupancy=True)
    return res, ply


@pytest.mark.slow
def test_m3dgr_sim_vio_ate(m3dgr_run):
    res, _ = m3dgr_run
    assert len(res.est_p_vio) > 20, "VIO produced too few poses"
    ate = ate_rmse(res.est_p_vio, res.gt_p_vio, align=True)
    assert ate < 0.30, f"M3DGR-sim VIO ATE {ate:.3f} m"


@pytest.mark.slow
def test_m3dgr_sim_full_lvio(m3dgr_run):
    res, _ = m3dgr_run
    assert len(res.est_p) > 20, "LIO produced too few poses"
    ate = ate_rmse(res.est_p, res.gt_p, align=True)
    assert ate < 0.30, f"M3DGR-sim fused ATE {ate:.3f} m"


@pytest.mark.slow
def test_m3dgr_sim_mesh_artifact(m3dgr_run):
    """System-level meshing: LIO world clouds + fused poses + camera images
    through the online mesher during the SAME replay, textured mesh
    exported (reference ImMesh intake + reconstruction,
    ``ImMesh_mesh_reconstruction.cpp:102-560, 734-800``)."""
    res, ply = m3dgr_run
    st = res.mesh_stats
    assert st is not None
    assert st["vertices"] > 200, st
    assert st["triangles"] > 100, st
    nv, nf = st["exported"]
    assert nv > 200 and nf > 100
    # texturing reached the camera-visible share of the vertex store (the
    # LiDAR maps 360 deg; the camera frustum covers ~10% of the room over
    # this short sequence)
    lines = open(ply).read().splitlines()
    hdr_end = lines.index("end_header")
    body = lines[hdr_end + 1:hdr_end + 1 + nv]
    rgb = np.asarray([[int(x) for x in ln.split()[3:6]] for ln in body])
    assert (rgb.sum(axis=1) > 0).mean() > 0.05, "mesh untextured"


@pytest.mark.slow
def test_m3dgr_sim_occupancy_grid(m3dgr_run):
    """System-level 2D occupancy mapping during the SAME replay
    (support_files/grid_mapping; grid publish pose_graph_node.cpp:861-900):
    driven space is carved free, walls accumulate occupied cells."""
    res, _ = m3dgr_run
    p = res.occ_prob
    assert p is not None and p.shape == (240, 320)
    # cells under the actual trajectory must be free (robot drove there)
    free_hits = total = 0
    for xy in res.est_p[::5]:
        ix, iy = int(xy[0] / 0.1) + 160, int(xy[1] / 0.1) + 120
        if 0 <= ix < 320 and 0 <= iy < 240:
            total += 1
            free_hits += p[iy, ix] < 0.35
    assert total > 5 and free_hits / total > 0.8, (free_hits, total)
    # walls exist: a meaningful number of confidently-occupied cells
    assert (p > 0.65).sum() > 100, (p > 0.65).sum()
    # most of the grid is untouched prior (bounded room in a big grid)
    assert (np.abs(p - 0.5) < 1e-3).mean() > 0.5
