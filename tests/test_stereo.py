"""Stereo disparity via optical flow + back-projection to a point cloud
(reference capabilities: 06-frontend-direct-method/03-disparity-map/
disparity_map.cpp — LK disparity vs GT, Pearson correlation;
04-camera-model/02-stereo-vision/disparity.cpp — disparity->pointcloud)."""
import jax.numpy as jnp
import numpy as np

from vio_tpu import sim
from vio_tpu.features import stereo

FX = FY = 460.0
CX = CY = 320.0
BASELINE = 0.11  # m (~EuRoC-like rig)
K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])


def _make_stereo_pair(seed=0, n=40):
    rng = np.random.default_rng(seed)
    # identical blobs sharing a scanline are inherently ambiguous — spread
    # features over distinct rows (real texture is locally unique)
    uv_l = np.stack([rng.uniform(80, 580, n),
                     np.linspace(40, 600, n) + rng.uniform(-3, 3, n)], axis=1)
    Z = rng.uniform(2.0, 12.0, n)
    disp_gt = FX * BASELINE / Z
    uv_r = uv_l.copy()
    uv_r[:, 0] -= disp_gt
    left = sim.render_blobs(uv_l)
    right = sim.render_blobs(uv_r)
    return left, right, uv_l, Z, disp_gt


def test_disparity_from_flow_matches_gt():
    left, right, uv_l, Z, disp_gt = _make_stereo_pair()
    disp, ok = stereo.disparity_from_flow(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(uv_l),
        jnp.ones(len(uv_l), bool))
    ok = np.asarray(ok)
    assert ok.sum() >= 0.8 * len(uv_l)
    err = np.abs(np.asarray(disp)[ok] - disp_gt[ok])
    assert np.median(err) < 0.1, np.median(err)
    # the reference's quality metric: Pearson correlation vs GT disparity
    r = float(stereo.pearson(jnp.asarray(disp)[ok], jnp.asarray(disp_gt)[ok]))
    assert r > 0.99, r


def test_pointcloud_backprojection_recovers_depth():
    left, right, uv_l, Z, disp_gt = _make_stereo_pair(seed=3)
    disp, ok = stereo.disparity_from_flow(
        jnp.asarray(left), jnp.asarray(right), jnp.asarray(uv_l),
        jnp.ones(len(uv_l), bool))
    pts, valid = stereo.points_to_pointcloud(jnp.asarray(uv_l), disp, K,
                                             BASELINE)
    sel = np.asarray(ok & valid)
    z_err = np.abs(np.asarray(pts)[sel, 2] - Z[sel]) / Z[sel]
    assert np.median(z_err) < 0.01  # depth to <1 % at sub-0.1px disparity

    # dense variant: exact synthetic disparity image round-trips
    H, W = 64, 96
    K_small = jnp.asarray([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]])
    dense = np.full((H, W), 5.0, np.float32)
    pc, valid = stereo.disparity_to_pointcloud(jnp.asarray(dense), K_small,
                                               BASELINE)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(pc[..., 2]),
                               FX * BASELINE / 5.0, rtol=1e-6)
    # back-projecting the principal point gives X=Y=0
    np.testing.assert_allclose(np.asarray(pc[H // 2, W // 2, :2]),
                               [0.0, 0.0], atol=1e-5)
