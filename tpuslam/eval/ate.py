"""Absolute trajectory error via Horn closed-form alignment.

Same methodology as the reference's evaluation harness
(/root/reference/evaluation/evaluate_ate_scale.py:50-101 `align`): SVD
Horn alignment of estimated onto ground-truth positions, optional
optimal scale (monocular), RMS of the residual translations. Host-side
numpy (float64) — this is the metric gate, not a compute path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ATEResult(NamedTuple):
    rmse: float
    rmse_scaled: float
    scale: float
    aligned: np.ndarray  # (F,3) estimate aligned (with scale) onto GT


def align_horn(gt: np.ndarray, est: np.ndarray):
    """Returns (R, t, s) minimizing ||gt - (s R est + t)||^2."""
    gt = np.asarray(gt, np.float64)
    est = np.asarray(est, np.float64)
    mu_g = gt.mean(0)
    mu_e = est.mean(0)
    gc = gt - mu_g
    ec = est - mu_e
    W = ec.T @ gc
    U, d, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = Vt.T @ S @ U.T
    # Optimal scale (evaluate_ate_scale.py:68-73).
    dots = float(np.sum(gc * (ec @ R.T)))
    norms = float(np.sum(ec * ec))
    s = dots / max(norms, 1e-12)
    t = mu_g - s * R @ mu_e
    return R, t, s


def ate(gt: np.ndarray, est: np.ndarray) -> ATEResult:
    """RMS ATE with and without scale correction."""
    R, t, s = align_horn(gt, est)
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    aligned_scaled = (s * (R @ est.T)).T + t
    # Unscaled: re-solve translation with s=1.
    t1 = gt.mean(0) - R @ est.mean(0)
    aligned_unscaled = (R @ est.T).T + t1
    rmse = float(np.sqrt(np.mean(np.sum((aligned_unscaled - gt) ** 2, 1))))
    rmse_s = float(np.sqrt(np.mean(np.sum((aligned_scaled - gt) ** 2, 1))))
    return ATEResult(rmse=rmse, rmse_scaled=rmse_s, scale=s,
                     aligned=aligned_scaled.astype(np.float32))
