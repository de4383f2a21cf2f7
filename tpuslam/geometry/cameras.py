"""Camera models as pure functions over parameter vectors.

Replaces the `GeometricCamera` virtual-dispatch hierarchy
(/root/reference/include/CameraModels/GeometricCamera.h:55-85,
Pinhole.cpp, KannalaBrandt8.cpp) with two functional models sharing one
signature, so factor kernels can `vmap` over features and `lax.switch`
over model kind if ever needed. All functions broadcast over leading
batch dims.

Conventions:
- `X_cam`: 3D point in camera frame, (...,3).
- `uv`: pixel coordinates, (...,2).
- Pinhole params: [fx, fy, cx, cy]  (undistorted-keypoint pipeline: the
  reference undistorts keypoints once at Frame construction,
  /root/reference/src/Frame.cc UndistortKeyPoints, then treats the camera
  as distortion-free; we do the same).
- KB8 params: [fx, fy, cx, cy, k1, k2, k3, k4] (equidistant fisheye,
  /root/reference/include/CameraModels/KannalaBrandt8.h:107-108).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_Z_MIN = 1e-6


# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------


def pinhole_project(X_cam, params):
    """Project camera-frame points to pixels. Ref: Pinhole::project."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = jnp.maximum(X_cam[..., 2], _Z_MIN)
    u = fx * X_cam[..., 0] / z + cx
    v = fy * X_cam[..., 1] / z + cy
    return jnp.stack([u, v], axis=-1)


def pinhole_unproject(uv, params):
    """Pixel -> unit-depth bearing (z=1). Ref: Pinhole::unproject."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(X_cam, params):
    """Jacobian d(uv)/d(X_cam), (...,2,3). Ref: Pinhole::projectJac."""
    fx, fy = params[0], params[1]
    x, y = X_cam[..., 0], X_cam[..., 1]
    z = jnp.maximum(X_cam[..., 2], _Z_MIN)
    zi = 1.0 / z
    zi2 = zi * zi
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([fx * zi, zeros, -fx * x * zi2], axis=-1)
    row_v = jnp.stack([zeros, fy * zi, -fy * y * zi2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def radtan_distort(xy, dist):
    """Apply radial-tangential distortion [k1,k2,p1,p2] to normalized coords.

    Used only by dataset loaders to undistort detected keypoints once per
    frame (the reference does this with cv::undistortPoints in
    Frame::UndistortKeyPoints)."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def radtan_undistort(xy_dist, dist, iters: int = 8):
    """Invert radtan distortion by fixed-point iteration (jit-safe, fixed
    iteration count — replaces cv::undistortPoints' iterative solve)."""

    def body(_, xy):
        d = radtan_distort(xy, dist) - xy
        return xy_dist - d

    return jax.lax.fori_loop(0, iters, body, xy_dist)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (equidistant fisheye)
# ---------------------------------------------------------------------------


def kb8_project(X_cam, params):
    """Ref: KannalaBrandt8::project (src/CameraModels/KannalaBrandt8.cpp).

    r = |xy|, theta = atan2(r, z), d(theta) = theta + k1 th^3 + k2 th^5 +
    k3 th^7 + k4 th^9; uv = f * d(theta) * xy / r + c.
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    x, y, z = X_cam[..., 0], X_cam[..., 1], X_cam[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    d = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    scale = jnp.where(r2 < 1e-14, jnp.ones_like(r), d / r)
    u = fx * scale * x + cx
    v = fy * scale * y + cy
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(uv, params, iters: int = 10):
    """Pixel -> unit-depth bearing via Newton solve of d(theta)=r_d.

    Ref: KannalaBrandt8::unprojectEig Newton iteration; fixed iteration count
    for jit."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    rd = jnp.sqrt(mx * mx + my * my)
    rd = jnp.minimum(rd, jnp.pi)  # clamp like the reference (theta_d in [0, pi])

    def f_and_df(th):
        th2 = th * th
        f = th * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4)))) - rd
        df = 1.0 + th2 * (3 * k1 + th2 * (5 * k2 + th2 * (7 * k3 + th2 * 9 * k4)))
        return f, df

    def body(_, th):
        f, df = f_and_df(th)
        return th - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df)

    theta = jax.lax.fori_loop(0, iters, body, rd)
    # Bearing with z=1: scale normalized distorted coords by tan(theta)/rd.
    scale = jnp.where(rd < 1e-9, jnp.ones_like(rd), jnp.tan(theta) / rd)
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(X_cam, params):
    """Jacobian d(uv)/d(X_cam) via forward-mode AD (analytic form in
    KannalaBrandt8::projectJac; AD yields the same values and fuses fine)."""
    flat = X_cam.reshape(-1, 3)
    jac = jax.vmap(jax.jacfwd(lambda p: kb8_project(p, params)))(flat)
    return jac.reshape(X_cam.shape[:-1] + (2, 3))


# ---------------------------------------------------------------------------
# Dispatch helpers (static on model name)
# ---------------------------------------------------------------------------


def project(X_cam, params, model: str = "pinhole"):
    if model == "pinhole":
        return pinhole_project(X_cam, params)
    if model == "kb8":
        return kb8_project(X_cam, params)
    raise ValueError(f"unknown camera model {model!r}")


def unproject(uv, params, model: str = "pinhole"):
    if model == "pinhole":
        return pinhole_unproject(uv, params)
    if model == "kb8":
        return kb8_unproject(uv, params)
    raise ValueError(f"unknown camera model {model!r}")


def project_jac(X_cam, params, model: str = "pinhole"):
    if model == "pinhole":
        return pinhole_project_jac(X_cam, params)
    if model == "kb8":
        return kb8_project_jac(X_cam, params)
    raise ValueError(f"unknown camera model {model!r}")
