import numpy as np
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.frontend import klt
from ground_fusion2_tpu.frontend.tracker import FeatureTracker, TrackerConfig
from ground_fusion2_tpu.core.cameras import Pinhole


def make_texture(rng, H=240, W=320, blur=2):
    img = rng.normal(size=(H, W)).astype(np.float32)
    x = jnp.asarray(img)
    for _ in range(blur):
        x = klt._blur(x)
    x = (x - x.min()) / (x.max() - x.min())
    return x


def shift_image(img, dx, dy):
    """Subpixel shift via bilinear sampling."""
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xy = jnp.stack([xx - dx, yy - dy], axis=-1)
    return klt._bilinear(img, xy.reshape(-1, 2)).reshape(H, W)


def test_shi_tomasi_finds_corner():
    img = jnp.zeros((64, 64), jnp.float32)
    img = img.at[30:, 30:].set(1.0)  # one corner at (30, 30)
    img = klt._blur(img)
    r = klt.shi_tomasi(img)
    iy, ix = np.unravel_index(int(jnp.argmax(r)), r.shape)
    assert abs(iy - 30) <= 2 and abs(ix - 30) <= 2


def test_detect_grid_respects_occupancy(rng):
    img = make_texture(rng)
    resp = klt.shi_tomasi(img)
    uv, score, ok = klt.detect_grid(resp, jnp.zeros((0, 2)), 30, 32,
                                    occupied_mask=jnp.zeros((0,)))
    assert int(ok.sum()) > 10
    # detect again with those points occupied: no new corners in same cells
    uv2, score2, ok2 = klt.detect_grid(resp, uv, 30, 32,
                                       occupied_mask=ok)
    cells1 = {(int(u[0] // 30), int(u[1] // 30))
              for u, o in zip(np.asarray(uv), np.asarray(ok)) if o > 0}
    cells2 = {(int(u[0] // 30), int(u[1] // 30))
              for u, o in zip(np.asarray(uv2), np.asarray(ok2)) if o > 0}
    assert not (cells1 & cells2)


@pytest.mark.slow
def test_klt_recovers_known_shift(rng):
    img0 = make_texture(rng)
    shift = (3.3, -2.7)
    img1 = shift_image(img0, *shift)
    pyr0 = tuple(klt.build_pyramid(img0, 3))
    pyr1 = tuple(klt.build_pyramid(img1, 3))
    resp = klt.shi_tomasi(img0)
    uv, score, ok = klt.detect_grid(resp, jnp.zeros((0, 2)), 30, 48,
                                    occupied_mask=jnp.zeros((0,)))
    pts1, tracked = klt.klt_track(pyr0, pyr1, uv, ok)
    assert int(tracked.sum()) > 0.7 * int(ok.sum())
    d = np.asarray(pts1 - uv)[np.asarray(tracked) > 0]
    err = np.abs(d - np.asarray(shift)).max(axis=0)
    assert err.max() < 0.15, err


@pytest.mark.slow
def test_klt_large_motion_coarse_to_fine(rng):
    img0 = make_texture(rng, H=256, W=256, blur=4)
    shift = (14.0, -9.0)
    img1 = shift_image(img0, *shift)
    pyr0 = tuple(klt.build_pyramid(img0, 4))
    pyr1 = tuple(klt.build_pyramid(img1, 4))
    resp = klt.shi_tomasi(img0)
    uv, score, ok = klt.detect_grid(resp, jnp.zeros((0, 2)), 30, 32,
                                    occupied_mask=jnp.zeros((0,)),
                                    border=20)
    pts1, tracked = klt.klt_track(pyr0, pyr1, uv, ok)
    assert int(tracked.sum()) > 0.5 * int(ok.sum())
    d = np.asarray(pts1 - uv)[np.asarray(tracked) > 0]
    err = np.abs(d - np.asarray(shift)).mean(axis=0)
    assert err.max() < 0.3, err


@pytest.mark.slow
def test_tracker_end_to_end(rng):
    cam = Pinhole.create(200.0, 200.0, 160.0, 120.0)
    trk = FeatureTracker(TrackerConfig(num_slots=48), cam)
    img0 = make_texture(rng)
    obs0 = trk.track(0.0, img0)
    assert int(np.asarray(obs0.alive).sum()) > 10
    assert np.all(np.asarray(obs0.fresh) == np.asarray(obs0.alive))

    img1 = shift_image(img0, 2.0, 1.0)
    obs1 = trk.track(0.1, img1)
    survived = np.asarray(obs0.alive * obs1.alive * (1 - obs1.fresh))
    assert survived.sum() > 0.6 * np.asarray(obs0.alive).sum()
    # normalized-plane displacement = pixel shift / focal
    dn = np.asarray(obs1.ray - obs0.ray)[survived > 0]
    np.testing.assert_allclose(dn.mean(axis=0), [2.0 / 200, 1.0 / 200],
                               atol=2e-3)
