"""Chessboard intrinsic calibration (vio_tpu/calib/intrinsics.py) — the
camodocal calibration tooling capability (reference: src/camera_models/
Chessboard.cc + CameraCalibration / CostFunctionFactory.cc).

Pipeline under test: rendered chessboard image → batched saddle-point
sub-pixel corner refinement → Zhang closed-form init → full LM bundle
refinement of intrinsics + distortion + per-view poses.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from vio_tpu.calib import intrinsics as ic
from vio_tpu.utils import lie

TRUE = dict(fx=460.0, fy=458.0, cx=325.0, cy=238.0,
            k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4)
NX, NY, SQ = 9, 6, 0.03


def board_corners():
    bx, by = np.meshgrid(np.arange(NX) * SQ, np.arange(NY) * SQ)
    return np.stack([bx.ravel(), by.ravel()], axis=1)


def project_true(board_xy, R, t):
    p3 = np.concatenate([board_xy, np.zeros((len(board_xy), 1))], axis=1)
    pc = p3 @ R.T + t
    xn, yn = pc[:, 0] / pc[:, 2], pc[:, 1] / pc[:, 2]
    r2 = xn * xn + yn * yn
    rad = 1 + TRUE["k1"] * r2 + TRUE["k2"] * r2 * r2
    xd = xn * rad + 2 * TRUE["p1"] * xn * yn + TRUE["p2"] * (r2 + 2 * xn * xn)
    yd = yn * rad + TRUE["p1"] * (r2 + 2 * yn * yn) + 2 * TRUE["p2"] * xn * yn
    return np.stack([TRUE["fx"] * xd + TRUE["cx"],
                     TRUE["fy"] * yd + TRUE["cy"]], axis=1)


def synth_views(V=10, seed=3):
    rng = np.random.default_rng(seed)
    board = board_corners()
    img_pts = []
    for _ in range(V):
        w = rng.normal(0, 0.25, 3)
        R = np.asarray(lie.so3_exp_mat(jnp.asarray(w)))
        t = np.array([-0.12 + 0.02 * rng.normal(),
                      -0.08 + 0.02 * rng.normal(),
                      0.55 + 0.1 * rng.random()])
        img_pts.append(project_true(board, R, t))
    return board, np.stack(img_pts)


def test_zhang_closed_form_init_lands_near_truth():
    board, img_pts = synth_views()
    Hs = [ic.homography_dlt(board, img_pts[v]) for v in range(len(img_pts))]
    K4 = ic.zhang_init(Hs)
    # distortion biases the closed form a little; it only needs to seed LM
    assert abs(K4[0] - TRUE["fx"]) / TRUE["fx"] < 0.05
    assert abs(K4[1] - TRUE["fy"]) / TRUE["fy"] < 0.05
    assert abs(K4[2] - TRUE["cx"]) < 15 and abs(K4[3] - TRUE["cy"]) < 15


def test_full_calibration_recovers_intrinsics_exact_corners():
    board, img_pts = synth_views()
    out = ic.calibrate_chessboard(board, img_pts)
    assert abs(out["fx"] - TRUE["fx"]) < 0.01
    assert abs(out["fy"] - TRUE["fy"]) < 0.01
    assert abs(out["cx"] - TRUE["cx"]) < 0.01
    assert abs(out["cy"] - TRUE["cy"]) < 0.01
    assert abs(out["k1"] - TRUE["k1"]) < 1e-4
    assert abs(out["k2"] - TRUE["k2"]) < 1e-4
    assert abs(out["p1"] - TRUE["p1"]) < 1e-5
    assert abs(out["p2"] - TRUE["p2"]) < 1e-5
    assert out["reproj_rms_px"] < 1e-4


def test_full_calibration_with_noisy_corners():
    board, img_pts = synth_views()
    rng = np.random.default_rng(11)
    noisy = img_pts + rng.normal(0, 0.2, img_pts.shape)
    out = ic.calibrate_chessboard(board, noisy)
    assert abs(out["fx"] - TRUE["fx"]) / TRUE["fx"] < 0.01
    assert abs(out["fy"] - TRUE["fy"]) / TRUE["fy"] < 0.01
    assert abs(out["cx"] - TRUE["cx"]) < 3.0
    assert abs(out["cy"] - TRUE["cy"]) < 3.0
    assert abs(out["k1"] - TRUE["k1"]) < 0.02
    assert 0.1 < out["reproj_rms_px"] < 0.35   # consistent with 0.2 px noise


def _render_checker(Hm, H_img=240, W_img=320, sq=24.0, soft=6.0):
    Hi = np.linalg.inv(Hm)
    u, v = np.meshgrid(np.arange(W_img, dtype=np.float64),
                       np.arange(H_img, dtype=np.float64))
    den = Hi[2, 0] * u + Hi[2, 1] * v + Hi[2, 2]
    X = (Hi[0, 0] * u + Hi[0, 1] * v + Hi[0, 2]) / den
    Y = (Hi[1, 0] * u + Hi[1, 1] * v + Hi[1, 2]) / den
    return 128 + 100 * np.tanh(soft * np.sin(np.pi * X / sq)) * \
        np.tanh(soft * np.sin(np.pi * Y / sq))


def test_subpixel_saddle_refinement_on_rendered_board():
    """cv::cornerSubPix analog: from 0.7 px-off starts on a rendered,
    perspective-warped chessboard, corners refine to ~0.03 px."""
    rng = np.random.default_rng(0)
    sq = 24.0
    Hm = np.array([[1.05, 0.08, 40.0], [-0.05, 0.98, 30.0],
                   [1e-4, -8e-5, 1.0]])
    img = _render_checker(Hm, sq=sq)
    pts = []
    for i in range(1, 10):
        for j in range(1, 7):
            p = Hm @ np.array([i * sq, j * sq, 1.0])
            p = p[:2] / p[2]
            if 15 < p[0] < 320 - 15 and 15 < p[1] < 240 - 15:
                pts.append(p)
    pts = np.asarray(pts)
    assert len(pts) >= 40
    start = pts + rng.uniform(-0.7, 0.7, pts.shape)
    ref = np.asarray(ic.refine_corners_subpix(
        img.astype(np.float32), start, half=4, n_iter=4))
    err = np.linalg.norm(ref - pts, axis=1)
    assert err.mean() < 0.05, err.mean()
    assert np.percentile(err, 90) < 0.08
