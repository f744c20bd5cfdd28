import numpy as np
import jax
import jax.numpy as jnp

from ground_fusion2_tpu.core import lie
from ground_fusion2_tpu.sensors.imu_preint import (
    ImuNoise, bias_corrected, preintegrate, propagate_state,
)
from ground_fusion2_tpu.sensors.wheel_preint import (
    WheelNoise, WheelPreint, intrinsic_corrected, preintegrate_wheel,
)

G = np.array([0.0, 0.0, -9.81])


def simulate_imu(n_steps, dt, omega_body, accel_world_fn, q0=None):
    """Generate perfect IMU samples along a trajectory with constant body
    angular rate and a world-frame acceleration profile. Returns samples and
    ground-truth relative motion (frame of first sample)."""
    q = np.array([1.0, 0, 0, 0]) if q0 is None else q0
    p = np.zeros(3)
    v = np.zeros(3)
    qs, ps, vs, accs, gyrs = [q.copy()], [p.copy()], [v.copy()], [], []
    for k in range(n_steps + 1):
        t = k * dt
        a_w = accel_world_fn(t)
        R = np.array(lie.quat_to_mat(jnp.asarray(q, dtype=jnp.float32)))
        accs.append(R.T @ (a_w - G))
        gyrs.append(omega_body.copy())
        if k < n_steps:
            # integrate ground truth with small substeps for accuracy
            sub = 20
            h = dt / sub
            for _ in range(sub):
                Rn = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
                a_w_now = accel_world_fn(t)
                p = p + v * h + 0.5 * a_w_now * h * h
                v = v + a_w_now * h
                q = np.array(lie.quat_mul(jnp.asarray(q), lie.quat_exp(jnp.asarray(omega_body * h))))
                q /= np.linalg.norm(q)
                t += h
            qs.append(q.copy()); ps.append(p.copy()); vs.append(v.copy())
    return (np.array(accs), np.array(gyrs), np.array(qs), np.array(ps), np.array(vs))


def test_imu_preint_matches_ground_truth():
    dt = 0.005
    n = 40
    omega = np.array([0.1, -0.2, 0.3])
    acc_fn = lambda t: np.array([0.5, -0.3, 0.2])
    accs, gyrs, qs, ps, vs = simulate_imu(n, dt, omega, acc_fn)

    noise = ImuNoise()
    pre = preintegrate(
        jnp.asarray(accs, dtype=jnp.float32),
        jnp.asarray(gyrs, dtype=jnp.float32),
        jnp.full((n,), dt, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
        jnp.zeros(3, jnp.float32),
        noise,
    )
    # ground-truth deltas in the frame of sample 0 (q0 = I):
    T = n * dt
    dp_gt = ps[-1] - 0.5 * G * T * T  # since p0=0, v0=0: dp = p - v0 T - 0.5 g T^2
    dv_gt = vs[-1] - G * T
    dq_gt = qs[-1]
    np.testing.assert_allclose(pre.dp, dp_gt, atol=2e-4)
    np.testing.assert_allclose(pre.dv, dv_gt, atol=2e-4)
    assert np.abs(np.dot(np.asarray(pre.dq), dq_gt)) > 1 - 1e-6
    np.testing.assert_allclose(pre.sum_dt, T, atol=1e-6)


def test_imu_preint_mask_equals_truncation():
    rng = np.random.default_rng(1)
    n = 20
    accs = rng.normal(size=(n + 1, 3)).astype(np.float32)
    gyrs = rng.normal(size=(n + 1, 3)).astype(np.float32) * 0.3
    dts = np.full((n,), 0.01, dtype=np.float32)
    noise = ImuNoise()
    ba = jnp.zeros(3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    k = 12
    mask = (np.arange(n) < k).astype(np.float32)
    full = preintegrate(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), ba, bg, noise,
                        mask=jnp.asarray(mask))
    trunc = preintegrate(jnp.asarray(accs[: k + 1]), jnp.asarray(gyrs[: k + 1]),
                         jnp.asarray(dts[:k]), ba, bg, noise)
    np.testing.assert_allclose(full.dp, trunc.dp, atol=1e-6)
    np.testing.assert_allclose(full.dv, trunc.dv, atol=1e-6)
    np.testing.assert_allclose(full.cov, trunc.cov, atol=1e-8)


def test_imu_bias_jacobian_vs_repropagation():
    rng = np.random.default_rng(2)
    n = 30
    accs = (rng.normal(size=(n + 1, 3)) * 0.5 + np.array([0, 0, 9.81])).astype(np.float32)
    gyrs = (rng.normal(size=(n + 1, 3)) * 0.2).astype(np.float32)
    dts = np.full((n,), 0.005, dtype=np.float32)
    noise = ImuNoise()
    z3 = jnp.zeros(3, jnp.float32)

    pre = preintegrate(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), z3, z3, noise)
    dba = jnp.asarray([0.01, -0.005, 0.008], dtype=jnp.float32)
    dbg = jnp.asarray([-0.004, 0.006, 0.002], dtype=jnp.float32)

    dp_c, dq_c, dv_c = bias_corrected(pre, dba, dbg)
    re = preintegrate(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), dba, dbg, noise)
    np.testing.assert_allclose(dp_c, re.dp, atol=5e-5)
    np.testing.assert_allclose(dv_c, re.dv, atol=5e-5)
    ang_err = np.linalg.norm(np.asarray(lie.quat_boxminus(dq_c, re.dq)))
    assert ang_err < 5e-5


def test_imu_covariance_psd_and_monotone():
    rng = np.random.default_rng(3)
    n = 50
    accs = (rng.normal(size=(n + 1, 3)) + np.array([0, 0, 9.81])).astype(np.float32)
    gyrs = rng.normal(size=(n + 1, 3)).astype(np.float32) * 0.1
    dts = np.full((n,), 0.005, dtype=np.float32)
    pre = preintegrate(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
                       jnp.zeros(3), jnp.zeros(3), ImuNoise())
    cov = np.asarray(pre.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-10)
    eig = np.linalg.eigvalsh(cov)
    assert eig.min() > -1e-10
    assert np.trace(cov) > 0


def test_propagate_state_free_fall():
    n = 100
    dt = 0.01
    accs = jnp.zeros((n + 1, 3), jnp.float32)  # free fall: accelerometer reads 0
    gyrs = jnp.zeros((n + 1, 3), jnp.float32)
    p, q, v = propagate_state(
        jnp.zeros(3), lie.quat_identity(), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros(3), jnp.asarray(G, dtype=jnp.float32),
        accs, gyrs, jnp.full((n,), dt),
    )
    T = n * dt
    np.testing.assert_allclose(p, 0.5 * G * T * T, atol=1e-4)
    np.testing.assert_allclose(v, G * T, atol=1e-4)


def test_wheel_preint_straight_line():
    n = 50
    dt = 0.01
    vel = jnp.tile(jnp.asarray([1.0, 0, 0], jnp.float32), (n + 1, 1))
    gyr = jnp.zeros((n + 1, 3), jnp.float32)
    pre = preintegrate_wheel(vel, gyr, jnp.full((n,), dt), 1.0, 1.0, 1.0, WheelNoise())
    np.testing.assert_allclose(pre.dp, [n * dt, 0, 0], atol=1e-5)
    np.testing.assert_allclose(pre.dq, [1, 0, 0, 0], atol=1e-6)
    # scale sx multiplies x displacement
    pre2 = preintegrate_wheel(vel, gyr, jnp.full((n,), dt), 1.1, 1.0, 1.0, WheelNoise())
    np.testing.assert_allclose(pre2.dp, [1.1 * n * dt, 0, 0], atol=1e-5)


def test_wheel_preint_circle():
    # drive a circle: v = [1,0,0], omega_z = 1 rad/s for pi seconds -> half circle
    n = 314
    dt = 0.01
    vel = jnp.tile(jnp.asarray([1.0, 0, 0], jnp.float32), (n + 1, 1))
    gyr = jnp.tile(jnp.asarray([0.0, 0, 1.0], jnp.float32), (n + 1, 1))
    pre = preintegrate_wheel(vel, gyr, jnp.full((n,), dt), 1.0, 1.0, 1.0, WheelNoise())
    # radius 1 circle: after theta = pi, dp = [sin, 1-cos, 0] = [0, 2, 0]
    theta = n * dt
    np.testing.assert_allclose(
        pre.dp, [np.sin(theta), 1 - np.cos(theta), 0], atol=2e-3)
    yaw = lie.quat_yaw(pre.dq)
    np.testing.assert_allclose(yaw, theta, atol=1e-4)


def test_wheel_intrinsic_jacobian_vs_repropagation():
    rng = np.random.default_rng(4)
    n = 40
    vel = (rng.normal(size=(n + 1, 3)) * np.array([1.0, 0.2, 0.0]) + np.array([1.0, 0, 0])).astype(np.float32)
    gyr = (rng.normal(size=(n + 1, 3)) * np.array([0.05, 0.05, 0.5])).astype(np.float32)
    dts = np.full((n,), 0.01, dtype=np.float32)
    pre = preintegrate_wheel(jnp.asarray(vel), jnp.asarray(gyr), jnp.asarray(dts),
                             1.0, 1.0, 1.0, WheelNoise())
    ds = 1e-3
    for i, (sx, sy, sw) in enumerate([(1 + ds, 1, 1), (1, 1 + ds, 1), (1, 1, 1 + ds)]):
        re = preintegrate_wheel(jnp.asarray(vel), jnp.asarray(gyr), jnp.asarray(dts),
                                sx, sy, sw, WheelNoise())
        dp_c, dq_c = intrinsic_corrected(pre, sx, sy, sw)
        np.testing.assert_allclose(dp_c, re.dp, atol=2e-5,
                                   err_msg=f"intrinsic {i} dp mismatch")
        ang = np.linalg.norm(np.asarray(lie.quat_boxminus(dq_c, re.dq)))
        assert ang < 2e-5, f"intrinsic {i} dq mismatch: {ang}"


def test_preint_jit_vmap():
    # the per-frame batched path used by the estimator: vmap over windows
    n = 16
    B = 4
    rng = np.random.default_rng(5)
    accs = rng.normal(size=(B, n + 1, 3)).astype(np.float32)
    gyrs = rng.normal(size=(B, n + 1, 3)).astype(np.float32)
    dts = np.full((B, n), 0.01, dtype=np.float32)
    z = jnp.zeros((B, 3), jnp.float32)
    f = jax.jit(jax.vmap(lambda a, g, d, ba, bg: preintegrate(a, g, d, ba, bg, ImuNoise())))
    out = f(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), z, z)
    assert out.dp.shape == (B, 3)
    assert out.cov.shape == (B, 15, 15)
    assert np.all(np.isfinite(np.asarray(out.cov)))


# ------------------------------------------------- parallel-form parity
def test_parallel_preintegrate_matches_sequential(rng):
    from ground_fusion2_tpu.sensors.imu_preint import (
        ImuNoise, preintegrate, preintegrate_sequential)
    import jax.numpy as jnp
    n = 50
    acc = jnp.asarray(rng.normal(size=(n + 1, 3)) * 2 + [0, 0, 9.81],
                      jnp.float32)
    gyr = jnp.asarray(rng.normal(size=(n + 1, 3)) * 0.5, jnp.float32)
    dt = jnp.full((n,), 0.005, jnp.float32)
    mask = jnp.asarray((np.arange(n) < 37), jnp.float32)
    ba = jnp.asarray([0.01, -0.02, 0.005], jnp.float32)
    bg = jnp.asarray([0.002, 0.001, -0.003], jnp.float32)
    a = preintegrate(acc, gyr, dt, ba, bg, ImuNoise(), mask=mask)
    b = preintegrate_sequential(acc, gyr, dt, ba, bg, ImuNoise(), mask=mask)
    np.testing.assert_allclose(np.asarray(a.dp), np.asarray(b.dp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.dq), np.asarray(b.dq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.dv), np.asarray(b.dv), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov),
                               atol=1e-6, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a.jac), np.asarray(b.jac),
                               atol=1e-5, rtol=1e-3)
