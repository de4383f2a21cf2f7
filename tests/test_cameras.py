import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry import cameras

PINHOLE = jnp.array([458.654, 457.296, 367.215, 248.375], jnp.float32)
# TUM-VI style fisheye params.
KB8 = jnp.array(
    [190.978, 190.973, 254.932, 256.897, 0.00348, 0.000715, -0.00205, 0.000202],
    jnp.float32,
)


def random_points(rng, n=64):
    X = rng.normal(size=(n, 3))
    X[:, 2] = np.abs(X[:, 2]) + 0.5
    return jnp.asarray(X, jnp.float32)


def test_pinhole_roundtrip(rng):
    X = random_points(rng)
    uv = cameras.pinhole_project(X, PINHOLE)
    bearing = cameras.pinhole_unproject(uv, PINHOLE)
    # Bearing * z should recover the point.
    np.testing.assert_allclose(bearing * X[:, 2:3], X, rtol=1e-4, atol=1e-4)


def test_pinhole_jac_matches_ad(rng):
    X = random_points(rng, 16)
    J = cameras.pinhole_project_jac(X, PINHOLE)
    J_ad = jax.vmap(jax.jacfwd(lambda p: cameras.pinhole_project(p, PINHOLE)))(X)
    np.testing.assert_allclose(J, J_ad, rtol=1e-3, atol=1e-3)


def test_kb8_roundtrip(rng):
    X = random_points(rng)
    X = X / jnp.linalg.norm(X, axis=-1, keepdims=True)  # bearings
    uv = cameras.kb8_project(X, KB8)
    bearing = cameras.kb8_unproject(uv, KB8)
    bearing = bearing / jnp.linalg.norm(bearing, axis=-1, keepdims=True)
    np.testing.assert_allclose(bearing, X, atol=1e-4)


def test_kb8_jac_finite(rng):
    X = random_points(rng, 8)
    J = cameras.kb8_project_jac(X, KB8)
    assert J.shape == (8, 2, 3)
    assert np.all(np.isfinite(J))
    eps = 1e-3
    for k in range(3):
        dX = np.zeros(3, np.float32)
        dX[k] = eps
        num = (cameras.kb8_project(X + dX, KB8) - cameras.kb8_project(X - dX, KB8)) / (
            2 * eps
        )
        np.testing.assert_allclose(J[:, :, k], num, rtol=2e-2, atol=2e-2)


def test_radtan_roundtrip(rng):
    dist = jnp.array([-0.2834, 0.0739, 0.00019, 1.76e-05], jnp.float32)
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, size=(32, 2)), jnp.float32)
    xyd = cameras.radtan_distort(xy, dist)
    xyu = cameras.radtan_undistort(xyd, dist)
    np.testing.assert_allclose(xyu, xy, atol=1e-5)


def test_dispatch():
    X = jnp.array([[0.1, -0.2, 1.5]], jnp.float32)
    np.testing.assert_allclose(
        cameras.project(X, PINHOLE, "pinhole"), cameras.pinhole_project(X, PINHOLE)
    )
    np.testing.assert_allclose(
        cameras.project(X, KB8, "kb8"), cameras.kb8_project(X, KB8)
    )
