"""Batched two-view triangulation + cheirality/parallax/reprojection checks.

Replaces `GeometricCamera::Triangulate` / the per-point DLT loops in
`TwoViewReconstruction::Triangulate` and `LocalMapping::CreateNewMapPoints`
(/root/reference/src/LocalMapping.cc:470) with one batched linear solve:
the 4x4 DLT normal matrix per correspondence is eigendecomposed in batch
(small dense eigh maps fine onto the MXU-adjacent units; no data-dependent
loops)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def triangulate_dlt(R1, t1, R2, t2, b1, b2):
    """DLT triangulation of N correspondences.

    R*, t*: camera-from-world poses. b1, b2: (N,3) unit-depth bearings
    (normalized image coords with z=1) in each camera.
    Returns X_w (N,3).
    """
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)  # (3,4)
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
    # Rows: x*(P r3) - (P r1); y*(P r3) - (P r2) for each view.
    A = jnp.stack(
        [
            b1[:, 0, None] * P1[2] - P1[0],
            b1[:, 1, None] * P1[2] - P1[1],
            b2[:, 0, None] * P2[2] - P2[0],
            b2[:, 1, None] * P2[2] - P2[1],
        ],
        axis=1,
    )  # (N,4,4)
    AtA = jnp.einsum("nij,nik->njk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = vecs[..., 0]  # (N,4) null-ish vector
    w = X[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[:, :3] / safe_w[:, None]


class TriCheck(NamedTuple):
    ok: jax.Array          # (N,) bool
    z1: jax.Array          # (N,) depths in cam 1
    z2: jax.Array
    parallax: jax.Array    # (N,) cos of ray angle


def check_triangulation(
    R1, t1, R2, t2, X_w, b1, b2,
    reproj_th2: float = 4.0,
    min_parallax_cos: float = 0.9998,
    focal: float = 450.0,
    min_z: float = 1e-3,
):
    """Cheirality + parallax + reprojection gates, batched.

    Mirrors the checks of TwoViewReconstruction::CheckRT and
    CreateNewMapPoints: positive depth in both views, ray parallax below
    the cos threshold, pixel reprojection error below th (converted from
    normalized coords with `focal`)."""
    Xc1 = X_w @ R1.T + t1
    Xc2 = X_w @ R2.T + t2
    z1, z2 = Xc1[:, 2], Xc2[:, 2]

    # Parallax between rays from the two camera centers.
    c1 = -R1.T @ t1
    c2 = -R2.T @ t2
    r1 = X_w - c1
    r2 = X_w - c2
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )

    def reproj_err2(Xc, b):
        xy = Xc[:, :2] / jnp.maximum(Xc[:, 2:3], min_z)
        d = (xy - b[:, :2]) * focal
        return jnp.sum(d * d, axis=-1)

    e1 = reproj_err2(Xc1, b1)
    e2 = reproj_err2(Xc2, b2)
    ok = (
        (z1 > min_z)
        & (z2 > min_z)
        & (cosp < min_parallax_cos)
        & (e1 < reproj_th2)
        & (e2 < reproj_th2)
    )
    return TriCheck(ok=ok, z1=z1, z2=z2, parallax=cosp)
