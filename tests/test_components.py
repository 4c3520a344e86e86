"""Component-assignment parity tests: ICP (05), direct method (06),
Jacobi-PCG (capstone problem.cc:580), rotation-update equivalence (11),
camera undistortion round trip (04)."""
import numpy as np
import jax.numpy as jnp

from vio_tpu import sim
from vio_tpu.camera import PinholeCamera
from vio_tpu.features import direct
from vio_tpu.init import icp
from vio_tpu.solver import pcg
from vio_tpu.utils import lie


def test_icp_umeyama_exact():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((50, 3)) * 2.0
    R_gt = np.asarray(lie.so3_exp_mat(jnp.asarray([0.2, -0.1, 0.5])))
    t_gt = np.array([1.0, -2.0, 0.5])
    dst = src @ R_gt.T + t_gt
    R, t = icp.umeyama(jnp.asarray(src), jnp.asarray(dst))
    assert np.allclose(np.asarray(R), R_gt, atol=1e-10)
    assert np.allclose(np.asarray(t), t_gt, atol=1e-10)


def test_icp_gn_refines_noisy():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((100, 3)) * 2.0
    R_gt = np.asarray(lie.so3_exp_mat(jnp.asarray([0.1, 0.3, -0.2])))
    t_gt = np.array([0.5, 0.2, -0.7])
    dst = src @ R_gt.T + t_gt + 0.01 * rng.standard_normal((100, 3))
    R0 = np.asarray(lie.so3_exp_mat(jnp.asarray([0.05, 0.0, 0.0]))) @ R_gt
    R, t, res = icp.icp_gn(jnp.asarray(src), jnp.asarray(dst),
                           jnp.asarray(R0), jnp.asarray(t_gt + 0.1))
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(R_gt.T @ np.asarray(R)) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.02
    assert float(res) < 0.03


def test_direct_method_recovers_motion():
    """Photometric pose estimation between two rendered sim frames with
    known depth (direct_method.cpp setup: sparse points + known disparity)."""
    data = sim.generate(noise=False)
    img0 = jnp.asarray(sim.render_image(data, 0), jnp.float32)
    img1 = jnp.asarray(sim.render_image(data, 1), jnp.float32)
    sel = data.obs_valid[0] & data.obs_valid[1]
    lids = np.where(sel)[0]
    uv0 = data.obs_uv[0][lids].astype(np.float32)
    # depths in cam0
    pc0 = np.einsum("ji,lj->li", data.cam_R[0],
                    data.landmarks[lids] - data.cam_p[0])
    depth0 = pc0[:, 2].astype(np.float32)
    R, t = direct.direct_pose_estimation(
        img0, img1, jnp.asarray(uv0), jnp.asarray(depth0),
        (460.0, 460.0, 255.0, 255.0))
    # GT relative transform cam0→cam1: X1 = R X0 + t
    R_gt = data.cam_R[1].T @ data.cam_R[0]
    t_gt = data.cam_R[1].T @ (data.cam_p[0] - data.cam_p[1])
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(R_gt.T @ np.asarray(R)) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.05, (t, t_gt)


def test_pcg_matches_direct_solve():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((40, 40))
    H = jnp.asarray(A @ A.T + 40 * np.eye(40))
    b = jnp.asarray(rng.standard_normal(40))
    x, k = pcg.pcg_solve(H, b)
    x_ref = np.linalg.solve(np.asarray(H), np.asarray(b))
    assert np.allclose(np.asarray(x), x_ref, atol=1e-4)
    assert int(k) < 80


def test_rotation_update_quat_vs_so3():
    """Assignment-11 parity: quaternion right-update q⊗[θ/2,1] equals
    R·exp(θ^) for small θ (rotation_update.cpp:36-49)."""
    rng = np.random.default_rng(3)
    q = np.asarray(lie.quat_normalize(jnp.asarray(rng.standard_normal(4))))
    w = np.array([0.01, 0.02, 0.03])
    R = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
    R_upd = R @ np.asarray(lie.so3_exp_mat(jnp.asarray(w)))
    # exact: q ⊗ exp(θ) == R·exp(θ^)
    q_exact = np.asarray(lie.quat_mul(jnp.asarray(q),
                                      lie.so3_exp_quat(jnp.asarray(w))))
    assert np.allclose(np.asarray(lie.quat_to_mat(jnp.asarray(q_exact))),
                       R_upd, atol=1e-12)
    # small-angle form [θ/2, 1]: agrees to O(|θ|²) (the assignment's point)
    q_upd = np.asarray(lie.quat_normalize(lie.quat_mul(
        jnp.asarray(q), jnp.asarray([w[0] / 2, w[1] / 2, w[2] / 2, 1.0]))))
    assert np.allclose(np.asarray(lie.quat_to_mat(jnp.asarray(q_upd))),
                       R_upd, atol=1e-3)


def test_pinhole_undistort_roundtrip():
    """Assignment-04 parity: manual radtan undistortion
    (01-undistort-image/undistort_image.cpp:27-56) as a project/lift
    round trip with EuRoC-like distortion."""
    cam = PinholeCamera(fx=461.6, fy=460.3, cx=363.0, cy=248.1,
                        k1=-0.28, k2=0.07, p1=2e-4, p2=1.8e-5,
                        width=752, height=480)
    rng = np.random.default_rng(4)
    pc = np.stack([rng.uniform(-0.5, 0.5, 100),
                   rng.uniform(-0.4, 0.4, 100),
                   np.ones(100)], axis=1)
    uv = cam.project(jnp.asarray(pc))
    pn = cam.lift(uv)
    assert np.allclose(np.asarray(pn), pc[:, :2], atol=1e-8)
