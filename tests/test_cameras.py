import numpy as np
import jax.numpy as jnp

from ground_fusion2_tpu.core.cameras import Pinhole, Equidistant, Mei


def make_points(rng, n=64):
    p = rng.normal(size=(n, 3)) * np.array([0.5, 0.5, 0.0]) + np.array([0, 0, 3.0])
    return jnp.asarray(p, dtype=jnp.float32)


def test_pinhole_project_lift_roundtrip(rng):
    cam = Pinhole.create(460.0, 460.0, 320.0, 240.0, k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4)
    p = make_points(rng)
    uv, valid = cam.project(p)
    assert bool(valid.all())
    ray = cam.lift(uv)
    dirs = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    np.testing.assert_allclose(ray, dirs, atol=1e-4)


def test_pinhole_no_distortion_closed_form():
    cam = Pinhole.create(400.0, 400.0, 320.0, 240.0)
    uv, valid = cam.project(jnp.array([1.0, -0.5, 2.0]))
    np.testing.assert_allclose(uv, [320.0 + 200.0, 240.0 - 100.0], atol=1e-4)


def test_equidistant_roundtrip(rng):
    cam = Equidistant.create(350.0, 350.0, 367.0, 248.0, k2=-0.02, k3=0.002, k4=-0.001, k5=0.0002)
    p = make_points(rng)
    uv, valid = cam.project(p)
    ray = cam.lift(uv)
    dirs = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    np.testing.assert_allclose(ray, dirs, atol=1e-4)


def test_mei_roundtrip(rng):
    cam = Mei.create(1.5, 600.0, 600.0, 320.0, 240.0, k1=-0.1, k2=0.02)
    p = make_points(rng)
    uv, valid = cam.project(p)
    ray = cam.lift(uv)
    dirs = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    np.testing.assert_allclose(ray, dirs, atol=2e-4)


def test_behind_camera_invalid():
    cam = Pinhole.create(400.0, 400.0, 320.0, 240.0)
    _, valid = cam.project(jnp.array([0.0, 0.0, -1.0]))
    assert not bool(valid)


def test_scaramuzza_pinhole_limit(rng):
    """a2=a3=a4=0 degenerates to a pinhole with focal -a0."""
    from ground_fusion2_tpu.core.cameras import Scaramuzza
    cam = Scaramuzza.create(cx=320.0, cy=240.0, a0=-400.0)
    p = jnp.asarray(rng.normal(size=(64, 3)) * [1, 1, 0.3] + [0, 0, 3.0],
                    jnp.float32)
    uv, ok = cam.project(p)
    u_ref = 400.0 * p[:, 0] / p[:, 2] + 320.0
    v_ref = 400.0 * p[:, 1] / p[:, 2] + 240.0
    np.testing.assert_allclose(np.asarray(uv[:, 0]), np.asarray(u_ref),
                               atol=0.01)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), np.asarray(v_ref),
                               atol=0.01)
    assert np.asarray(ok).all()


def test_scaramuzza_roundtrip(rng):
    """Full polynomial + affine: lift(project(p)) returns the ray of p."""
    from ground_fusion2_tpu.core.cameras import Scaramuzza
    cam = Scaramuzza.create(cx=321.5, cy=243.2, a0=-380.0, a2=6e-4,
                            a3=-9e-7, a4=3e-10, c=1.001, d=3e-4, e=-2e-4)
    p = jnp.asarray(rng.normal(size=(128, 3)) * [1.2, 1.2, 0.5]
                    + [0, 0, 2.5], jnp.float32)
    uv, ok = cam.project(p)
    assert np.asarray(ok).mean() > 0.95
    ray = cam.lift(uv)
    p_dir = np.asarray(p / jnp.linalg.norm(p, axis=-1, keepdims=True))
    cos = np.sum(np.asarray(ray) * p_dir, axis=-1)
    assert (cos[np.asarray(ok)] > 1 - 1e-5).all(), cos.min()


def test_pinhole_full_roundtrip(rng):
    from ground_fusion2_tpu.core.cameras import PinholeFull
    cam = PinholeFull.create(460.0, 460.0, 320.0, 240.0,
                             k1=-0.28, k2=0.07, k3=-0.005,
                             k4=-0.01, k5=0.002, k6=-0.0005,
                             p1=1e-4, p2=-2e-4)
    p = make_points(rng)
    uv, valid = cam.project(p)
    assert bool(valid.all())
    ray = cam.lift(uv)
    dirs = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    np.testing.assert_allclose(ray, dirs, atol=1e-4)


def test_pinhole_full_reduces_to_pinhole(rng):
    """k3..k6 = 0 must reproduce the plain radtan Pinhole exactly."""
    from ground_fusion2_tpu.core.cameras import PinholeFull
    full = PinholeFull.create(460.0, 460.0, 320.0, 240.0,
                              k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4)
    plain = Pinhole.create(460.0, 460.0, 320.0, 240.0,
                           k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4)
    p = make_points(rng)
    uv_f, _ = full.project(p)
    uv_p, _ = plain.project(p)
    np.testing.assert_allclose(uv_f, uv_p, atol=1e-5)
