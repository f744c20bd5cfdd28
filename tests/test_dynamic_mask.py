"""Dynamic-object mask producer (frontend/dynamic.py).

Functional analog of the reference's YOLO box path
(``feature_tracker.cpp:trackImagebox``): a moving object composited into two
rendered views must be flagged by the rigid-warp inconsistency check, the
static background must not, and tracker slots inside the mask must die.
"""

import jax.numpy as jnp
import numpy as np

from ground_fusion2_tpu.core.cameras import Pinhole
from ground_fusion2_tpu.data.render import SceneRenderer, make_room_scene
from ground_fusion2_tpu.frontend.dynamic import DynMaskConfig, dynamic_mask
from ground_fusion2_tpu.frontend.tracker import FeatureTracker, TrackerConfig

FX = FY = 300.0
CX, CY = 160.0, 120.0
W, H = 320, 240


def _render_pair():
    rend = SceneRenderer(make_room_scene(seed=2), FX, FY, CX, CY, W, H)
    R_wc = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])  # look +x
    p1 = np.array([0.0, 0.0, 1.0])
    p2 = p1 + R_wc @ [0.05, 0.0, 0.0]       # 5 cm right in camera frame
    g1, d1 = rend.render(p1, R_wc)
    g2, d2 = rend.render(p2, R_wc)
    # current-cam -> previous-cam transform
    R_pc = np.eye(3)
    t_pc = R_wc.T @ (p2 - p1)               # prev_p = cur_p + t_pc... sign:
    # point fixed in world: pc2 = R_wc^T (x - p2); pc1 = R_wc^T (x - p1)
    #   => pc1 = pc2 + R_wc^T (p2 - p1)
    return g1, d1, g2, d2, R_pc, t_pc


def _paste(gray, depth, u0, v0, size=44, val=0.95, d=1.2):
    g, dd = gray.copy(), depth.copy()
    g[v0:v0 + size, u0:u0 + size] = val
    dd[v0:v0 + size, u0:u0 + size] = d
    return g, dd


def test_moving_object_flagged_static_scene_not():
    g1, d1, g2, d2, R_pc, t_pc = _render_pair()
    K = jnp.array([FX, FY, CX, CY], jnp.float32)
    cfg = DynMaskConfig()

    # moving object: jumps 60 px between frames
    g1m, d1m = _paste(g1, d1, 60, 90)
    g2m, d2m = _paste(g2, d2, 120, 90)
    mask = np.asarray(dynamic_mask(jnp.asarray(g1m), jnp.asarray(d1m),
                                   jnp.asarray(g2m), jnp.asarray(d2m),
                                   jnp.asarray(R_pc, jnp.float32),
                                   jnp.asarray(t_pc, jnp.float32), K, cfg))
    obj = mask[90:134, 120:164]
    assert obj.mean() > 0.7, f"moving object unmasked ({obj.mean():.2f})"

    # same scene with NO moving object: background stays clean
    mask0 = np.asarray(dynamic_mask(jnp.asarray(g1), jnp.asarray(d1),
                                    jnp.asarray(g2), jnp.asarray(d2),
                                    jnp.asarray(R_pc, jnp.float32),
                                    jnp.asarray(t_pc, jnp.float32), K, cfg))
    assert mask0.mean() < 0.10, f"static scene flagged ({mask0.mean():.2f})"
    # and the with-object mask stays local: far corner clean
    assert mask[:60, 200:].mean() < 0.15


def test_fused_vio_auto_mask_integration():
    """FusedVio(auto_dyn_mask=True): a moving patch under a static camera is
    auto-masked — no live tracker slot survives on it."""
    from ground_fusion2_tpu.vio.estimator import EstimatorConfig
    from ground_fusion2_tpu.vio.fused import FusedVio

    rend = SceneRenderer(make_room_scene(seed=2), FX, FY, CX, CY, W, H)
    R_wc = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    g0, d0 = rend.render(np.array([0.0, 0.0, 1.0]), R_wc)

    cam = Pinhole.create(FX, FY, CX, CY)
    fv = FusedVio(EstimatorConfig(num_feats=64),
                  TrackerConfig(num_slots=64, cell=18), cam,
                  auto_dyn_mask=True)
    n = 4
    imu = (np.tile([[0.0, 0.0, 9.81]], (n + 1, 1)).astype(np.float32),
           np.zeros((n + 1, 3), np.float32),
           np.full((n,), 0.025, np.float32))
    for k in range(3):
        g, d = _paste(g0, d0, 60 + 45 * k, 90)
        fv.process_image(0.1 * k, g, d, imu)

    uv = np.asarray(fv.tracker.uv)
    alive = np.asarray(fv.tracker.alive) > 0.5
    u0 = 60 + 45 * 2
    on_patch = ((uv[:, 0] >= u0) & (uv[:, 0] < u0 + 44)
                & (uv[:, 1] >= 90) & (uv[:, 1] < 134))
    assert alive.sum() > 10
    assert not np.any(alive & on_patch), "auto mask failed to kill patch"


def test_tracker_kills_features_inside_mask():
    g1, d1, g2, d2, R_pc, t_pc = _render_pair()
    g1m, d1m = _paste(g1, d1, 60, 90, val=0.95)
    g2m, d2m = _paste(g2, d2, 120, 90, val=0.95)
    K = jnp.array([FX, FY, CX, CY], jnp.float32)
    mask = dynamic_mask(jnp.asarray(g1m), jnp.asarray(d1m),
                        jnp.asarray(g2m), jnp.asarray(d2m),
                        jnp.asarray(R_pc, jnp.float32),
                        jnp.asarray(t_pc, jnp.float32), K)

    cam = Pinhole.create(FX, FY, CX, CY)
    tr = FeatureTracker(TrackerConfig(num_slots=64, cell=18), cam)
    tr.track(0.0, jnp.asarray(g1m), depth_img=jnp.asarray(d1m))
    obs = tr.track(0.1, jnp.asarray(g2m), depth_img=jnp.asarray(d2m),
                   dyn_mask=mask)
    uv = np.asarray(tr.uv)
    alive = np.asarray(tr.alive) > 0.5
    m_np = np.asarray(mask)
    inside = np.array([m_np[min(int(v), H - 1), min(int(u), W - 1)] > 0.5
                       for u, v in uv])
    assert alive.sum() > 10                 # background still tracks
    assert not np.any(alive & inside), "live slots survived inside dyn mask"
