import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry import lie
from tpuslam.imu import preintegration as pre

FREQ = 200.0
DT = 1.0 / FREQ
NGA, WALK = pre.discrete_noise(1.7e-4, 2.0e-3, 1.9e-5, 3.0e-3, FREQ)


def integrate_simple(acc, gyro, n, bias_g=None, bias_a=None):
    state = pre.init_state(bias_g, bias_a)
    accs = jnp.tile(jnp.asarray(acc, jnp.float32), (n, 1))
    gyrs = jnp.tile(jnp.asarray(gyro, jnp.float32), (n, 1))
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.ones((n,), bool)
    return pre.integrate(state, accs, gyrs, dts, mask, NGA, WALK)


def test_constant_acceleration():
    # Zero rotation, constant acceleration a: dV = a T, dP = 0.5 a T^2.
    a = [0.1, -0.2, 9.81]
    n = 200
    T = n * DT
    s = integrate_simple(a, [0, 0, 0], n)
    np.testing.assert_allclose(s.dT, T, rtol=1e-6)
    np.testing.assert_allclose(s.dR, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(s.dV, np.array(a) * T, rtol=1e-4)
    # Discrete sum: 0.5*a*h^2 * sum_{k} (2k+1) = 0.5 a T^2 exactly for midpoint.
    np.testing.assert_allclose(s.dP, 0.5 * np.array(a) * T * T, rtol=1e-2)


def test_constant_rotation():
    w = np.array([0.0, 0.0, 0.5])
    n = 400
    T = n * DT
    s = integrate_simple([0, 0, 0], w, n)
    np.testing.assert_allclose(s.dR, lie.so3_exp(jnp.asarray(w * T, jnp.float32)),
                               atol=1e-5)


def test_mask_skips_samples():
    n = 100
    state = pre.init_state()
    accs = jnp.ones((n, 3), jnp.float32)
    gyrs = jnp.zeros((n, 3), jnp.float32)
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.arange(n) < 50
    s = pre.integrate(state, accs, gyrs, dts, mask, NGA, WALK)
    np.testing.assert_allclose(s.dT, 50 * DT, rtol=1e-6)


def test_bias_jacobians_vs_reintegration(rng):
    """Corrected deltas via Jacobians must match re-integration with the
    perturbed bias (first order) — the core trick of preintegration
    (GetDeltaRotation/Velocity/Position vs Reintegrate)."""
    n = 100
    acc = rng.normal(size=(n, 3)) * 2 + [0, 0, 9.81]
    gyro = rng.normal(size=(n, 3)) * 0.3
    accs = jnp.asarray(acc, jnp.float32)
    gyrs = jnp.asarray(gyro, jnp.float32)
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.ones((n,), bool)

    s0 = pre.integrate(pre.init_state(), accs, gyrs, dts, mask, NGA, WALK)

    dbg = jnp.asarray([1e-3, -2e-3, 1.5e-3], jnp.float32)
    dba = jnp.asarray([-2e-2, 1e-2, 3e-2], jnp.float32)

    # Re-integrate at the perturbed bias (ground truth).
    s1 = pre.integrate(pre.init_state(dbg, dba), accs, gyrs, dts, mask, NGA, WALK)

    dR_corr = pre.delta_rotation(s0, dbg)
    dV_corr = pre.delta_velocity(s0, dbg, dba)
    dP_corr = pre.delta_position(s0, dbg, dba)

    np.testing.assert_allclose(dR_corr, s1.dR, atol=5e-4)
    np.testing.assert_allclose(dV_corr, s1.dV, atol=5e-3)
    np.testing.assert_allclose(dP_corr, s1.dP, atol=5e-3)


def test_covariance_psd_and_growing(rng):
    n = 200
    accs = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    gyrs = jnp.asarray(rng.normal(size=(n, 3)) * 0.1, jnp.float32)
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.ones((n,), bool)
    s = pre.integrate(pre.init_state(), accs, gyrs, dts, mask, NGA, WALK)
    eig = np.linalg.eigvalsh(np.asarray(s.cov, np.float64))
    assert eig.min() > -1e-12
    assert np.trace(np.asarray(s.cov)) > 0


def test_predict_consistency(rng):
    """predict() must make inertial_residual() zero for a noiseless window."""
    n = 150
    acc = rng.normal(size=(n, 3)) + [0, 0, 9.81]
    gyro = rng.normal(size=(n, 3)) * 0.2
    accs = jnp.asarray(acc, jnp.float32)
    gyrs = jnp.asarray(gyro, jnp.float32)
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.ones((n,), bool)
    s = pre.integrate(pre.init_state(), accs, gyrs, dts, mask, NGA, WALK)

    R_i = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32))
    p_i = jnp.asarray(rng.normal(size=3), jnp.float32)
    v_i = jnp.asarray(rng.normal(size=3), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    ba = jnp.zeros(3, jnp.float32)

    R_j, p_j, v_j = pre.predict(s, R_i, p_i, v_i, bg, ba)
    res = pre.inertial_residual(s, R_i, p_i, v_i, R_j, p_j, v_j, bg, ba)
    np.testing.assert_allclose(res, 0.0, atol=1e-4)


def test_merge_matches_full_integration(rng):
    n = 120
    acc = rng.normal(size=(n, 3)) + [0, 0, 9.81]
    gyro = rng.normal(size=(n, 3)) * 0.2
    accs = jnp.asarray(acc, jnp.float32)
    gyrs = jnp.asarray(gyro, jnp.float32)
    dts = jnp.full((n,), DT, jnp.float32)
    mask = jnp.ones((n,), bool)

    full = pre.integrate(pre.init_state(), accs, gyrs, dts, mask, NGA, WALK)
    h1 = pre.integrate(pre.init_state(), accs[:60], gyrs[:60], dts[:60], mask[:60],
                       NGA, WALK)
    h2 = pre.integrate(pre.init_state(), accs[60:], gyrs[60:], dts[60:], mask[60:],
                       NGA, WALK)
    merged = pre.merge(h1, h2, NGA, WALK)

    np.testing.assert_allclose(merged.dT, full.dT, rtol=1e-6)
    np.testing.assert_allclose(merged.dR, full.dR, atol=1e-5)
    np.testing.assert_allclose(merged.dV, full.dV, atol=1e-4)
    np.testing.assert_allclose(merged.dP, full.dP, atol=1e-4)
    # Bias Jacobians of the composition should match too (first-order check).
    np.testing.assert_allclose(merged.JRg, full.JRg, atol=1e-3)
    np.testing.assert_allclose(merged.JVa, full.JVa, atol=1e-3)
    np.testing.assert_allclose(merged.JPa, full.JPa, atol=1e-3)
    np.testing.assert_allclose(merged.JVg, full.JVg, atol=2e-2)
    np.testing.assert_allclose(merged.JPg, full.JPg, atol=2e-2)
