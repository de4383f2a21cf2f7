import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.geometry import lie


def random_w(rng, n=32, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, jnp.float32)


def test_exp_log_roundtrip(rng):
    w = random_w(rng, scale=0.8)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_exp_is_rotation(rng):
    w = random_w(rng, scale=2.0)
    R = lie.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


def test_exp_small_angle():
    w = jnp.array([[0.0, 0.0, 0.0], [1e-9, -1e-9, 1e-9]])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(R[0], jnp.eye(3), atol=1e-7)
    assert np.all(np.isfinite(R))
    # Gradient defined at zero.
    g = jax.grad(lambda v: jnp.sum(lie.so3_exp(v)))(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_log_near_pi(rng):
    axis = rng.normal(size=(8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    for theta in [np.pi - 1e-4, np.pi - 1e-2]:
        w = jnp.asarray(axis * theta, jnp.float32)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        R2 = lie.so3_exp(w2)
        # Compare rotations (axis sign is ambiguous exactly at pi).
        np.testing.assert_allclose(R, R2, atol=1e-3)


def test_right_jacobian_finite_diff(rng):
    w = random_w(rng, n=8, scale=0.7)
    Jr = lie.so3_right_jacobian(w)
    eps = 1e-4
    for k in range(3):
        dw = np.zeros(3, np.float32)
        dw[k] = eps
        # Exp(w+dw) ~ Exp(w) Exp(Jr dw)
        lhs = lie.so3_exp(w + dw)
        rhs = lie.so3_exp(w) @ lie.so3_exp(jnp.einsum("nij,j->ni", Jr, dw))
        np.testing.assert_allclose(lhs, rhs, atol=5e-5)


def test_right_jacobian_inverse(rng):
    w = random_w(rng, n=16, scale=1.2)
    J = lie.so3_right_jacobian(w)
    Jinv = lie.so3_right_jacobian_inv(w)
    eye = jnp.broadcast_to(jnp.eye(3), J.shape)
    np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32) * 0.8
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_compose_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    R, t = lie.se3_exp(xi)
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-5)


def test_se3_apply_matches_compose(rng):
    xi = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    R, t = lie.se3_exp(xi)
    X = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    np.testing.assert_allclose(
        lie.se3_apply(R, t, X), (R @ X.T).T + t, atol=1e-6
    )


def test_sim3_ops(rng):
    s = jnp.asarray(rng.uniform(0.5, 2.0, size=(4,)), jnp.float32)
    R = lie.so3_exp(jnp.asarray(rng.normal(size=(4, 3)), jnp.float32))
    t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    si, Ri, ti = lie.sim3_inverse(s, R, t)
    sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
    np.testing.assert_allclose(sc, 1.0, atol=1e-5)
    np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-4)

    X = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    Y = lie.sim3_apply(s, R, t, X)
    X2 = lie.sim3_apply(si, Ri, ti, Y)
    np.testing.assert_allclose(X, X2, atol=1e-4)


def test_normalize_rotation(rng):
    w = random_w(rng, n=4)
    R = lie.so3_exp(w) + jnp.asarray(rng.normal(size=(4, 3, 3)) * 1e-3, jnp.float32)
    Rn = lie.normalize_rotation(R)
    eye = jnp.broadcast_to(jnp.eye(3), Rn.shape)
    np.testing.assert_allclose(Rn @ jnp.swapaxes(Rn, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(Rn), 1.0, atol=1e-5)
