"""Frontend robustness layer: CLAHE, RANSAC-F rejection, rendered-scene KLT.

Covers the reference's image-conditioning + outlier-rejection path
(``rosNodeTest.cpp:271-276`` CLAHE, ``feature_tracker.cpp:711`` rejectWithF)
that round 1 lacked, driven by real rendered images, not noise textures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ground_fusion2_tpu.frontend.clahe import clahe
from ground_fusion2_tpu.frontend.ransac import ransac_f_reject


def test_clahe_improves_contrast():
    """A low-contrast image (values squeezed into [0.4, 0.5]) must come out
    with materially higher dynamic range, and output stays in [0, 1]."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0.4, 0.5, size=(120, 160)).astype(np.float32)
    out = np.asarray(clahe(jnp.asarray(base)))
    assert out.shape == base.shape
    assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5
    assert (out.max() - out.min()) > 3 * (base.max() - base.min())


def test_clahe_preserves_uniform_regions_order():
    """Monotone mapping per tile: brighter pixels stay >= darker ones
    within the same tile."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(64, 64)).astype(np.float32)
    out = np.asarray(clahe(jnp.asarray(img), tiles=(1, 1)))
    # single tile -> global equalization is monotone in input value
    flat_in = img.reshape(-1)
    flat_out = out.reshape(-1)
    order = np.argsort(flat_in)
    d = np.diff(flat_out[order])
    assert (d >= -1e-4).all()


def _epipolar_pair(n=80, outliers=10, seed=0):
    """Generate two views of random 3D points + contaminated tracks."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 3], [2, 2, 8], size=(n, 3))
    # camera 1 at origin; camera 2 translated + slightly rotated
    t = np.array([0.3, 0.05, 0.0])
    ang = 0.05
    R = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    p1 = pts[:, :2] / pts[:, 2:]
    pc2 = (pts - t) @ R
    p2 = pc2[:, :2] / pc2[:, 2:]
    bad = rng.choice(n, size=outliers, replace=False)
    p2[bad] += rng.uniform(0.05, 0.2, size=(outliers, 2)) * \
        rng.choice([-1, 1], size=(outliers, 2))
    return (p1.astype(np.float32), p2.astype(np.float32),
            np.isin(np.arange(n), bad))


def test_ransac_rejects_outliers():
    p1, p2, is_bad = _epipolar_pair()
    valid = jnp.ones((p1.shape[0],), jnp.float32)
    keep = np.asarray(ransac_f_reject(
        jnp.asarray(p1), jnp.asarray(p2), valid, jax.random.PRNGKey(0),
        thresh=2.0 / 460.0))
    # every gross outlier must be rejected; most inliers survive
    assert keep[is_bad].sum() == 0
    assert keep[~is_bad].mean() > 0.85


def test_ransac_small_set_noop():
    p1 = jnp.zeros((20, 2))
    p2 = jnp.zeros((20, 2))
    valid = jnp.zeros((20,)).at[:5].set(1.0)
    keep = ransac_f_reject(p1, p2, valid, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(keep), np.asarray(valid))


@pytest.mark.slow
def test_klt_tracks_rendered_scene():
    """Real pipeline on rendered frames: CLAHE + detect + KLT track across a
    small camera translation; tracked points' flow must match geometry."""
    from ground_fusion2_tpu.core.cameras import Pinhole
    from ground_fusion2_tpu.data.render import SceneRenderer, make_room_scene
    from ground_fusion2_tpu.frontend.tracker import FeatureTracker, TrackerConfig

    rects = make_room_scene(seed=3)
    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    rend = SceneRenderer(rects, fx, fy, cx, cy, 320, 240)
    # camera->world: columns are the camera axes in world (optical z -> +x)
    R_wc = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    cam = Pinhole.create(fx, fy, cx, cy)
    tracker = FeatureTracker(TrackerConfig(
        num_slots=48, equalize=True, use_ransac=True, focal=fx,
        depth_range=(0.1, 20.0)), cam)

    poses = [np.array([0, 0, 0.5]), np.array([0.15, 0, 0.5]),
             np.array([0.30, 0, 0.5])]
    obs = []
    for i, p in enumerate(poses):
        g, d = rend.render(p, R_wc)
        obs.append(tracker.track(0.1 * i, jnp.asarray(g), jnp.asarray(d)))

    o0, o1, o2 = obs
    cont = (np.asarray(o2.alive) > 0) & (np.asarray(o2.fresh) == 0) \
        & (np.asarray(o1.alive) > 0) & (np.asarray(o1.fresh) == 0)
    assert cont.sum() >= 15, f"only {cont.sum()} continuing tracks"
    # camera moved forward along its optical axis => features flow radially
    # outward. Per-feature KLT noise (~0.3 px) swamps the expansion of
    # near-center features, so check (a) the mean radial flow is positive
    # and (b) off-center features (where expansion >> noise) flow outward.
    r1 = np.linalg.norm(np.asarray(o1.ray)[cont], axis=1)
    r2 = np.linalg.norm(np.asarray(o2.ray)[cont], axis=1)
    dr = r2 - r1
    assert dr.mean() > 0, f"mean radial flow {dr.mean():.5f}"
    far = r1 > 0.12
    assert far.sum() >= 8, f"only {far.sum()} off-center tracks"
    frac_outward = np.mean(dr[far] > 0)
    assert frac_outward > 0.7, f"outward flow fraction {frac_outward:.2f}"


def test_voxel_map_recenter():
    """Recentering re-keys points: queries near the new center keep finding
    their neighbors, and the map survives walking past the packing range."""
    from ground_fusion2_tpu.lio import voxel_map as vm

    cfg = vm.VoxelMapConfig(capacity=1 << 12, voxel_size=0.2, max_range=500.0)
    m = vm.VoxelMap.empty(cfg)
    rng = np.random.default_rng(0)
    # cluster of points near x = 90 m (inside the ±102.4 m packing box)
    pts = (rng.uniform(-1, 1, size=(512, 3)) * [2, 2, 0.5]
           + [90.0, 0, 0]).astype(np.float32)
    m = vm.insert(m, jnp.asarray(pts), jnp.ones((512,), jnp.float32), cfg)
    assert vm.needs_recenter(m, np.array([90.0, 0, 0]), cfg)
    m2 = vm.recenter(m, jnp.asarray([90.0, 0, 0], jnp.float32), cfg)
    # same neighborhoods before/after recentering
    q = jnp.asarray(pts[:32])
    n1, k1 = vm.knn_gather(m, q, cfg)
    n2, k2 = vm.knn_gather(m2, q, cfg)
    assert int(k1.sum()) == int(k2.sum())
    np.testing.assert_allclose(
        np.asarray(jnp.sort(n1.reshape(-1))), np.asarray(jnp.sort(n2.reshape(-1))),
        atol=1e-6)
    # points far beyond the *new* packing box drop out; near ones insert fine
    far = (pts + [150.0, 0, 0]).astype(np.float32)
    m3 = vm.insert(m2, jnp.asarray(far), jnp.ones((512,), jnp.float32), cfg)
    n3, k3 = vm.knn_gather(m3, jnp.asarray(far[:8]), cfg)
    assert int(k3.sum()) == 0  # out of range of current origin: not inserted
    m4 = vm.recenter(m3, jnp.asarray([240.0, 0, 0], jnp.float32), cfg)
    m4 = vm.insert(m4, jnp.asarray(far), jnp.ones((512,), jnp.float32), cfg)
    n4, k4 = vm.knn_gather(m4, jnp.asarray(far[:8]), cfg)
    assert int(k4.sum()) > 0
