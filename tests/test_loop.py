"""Loop-closure stack tests: ORB matching, BoW retrieval with
relative-score normalization (assignment-08 parity), and SE3 pose-graph
drift correction."""
import numpy as np
import jax.numpy as jnp

from vio_tpu import sim
from vio_tpu.features import detect, orb
from vio_tpu.loop import posegraph, vocab
from vio_tpu.utils import lie


def _frame_descriptors(data, k, n=60):
    img = jnp.asarray(sim.render_image(data, k), jnp.float32)
    xy, score, valid = detect.detect(img, None, max_corners=n, min_dist=8)
    d = orb.describe(img, xy, valid)
    return np.asarray(xy), np.asarray(d), np.asarray(valid)


def _texture(seed=0, size=256):
    """Smooth random texture (low-passed noise) with distinctive corners —
    Gaussian sim blobs are rotationally identical, so ORB needs real
    texture to be testable."""
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((size, size))
    # separable box blur ×3 → smooth blobs of varied shape
    for _ in range(3):
        k = np.ones(7) / 7
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
        img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img


def test_orb_matching_translated_texture():
    img0 = _texture()
    shift = np.array([7.0, -4.0])      # integer-ish translation
    img1 = np.roll(np.roll(img0, int(shift[1]), axis=0),
                   int(shift[0]), axis=1)
    j0 = jnp.asarray(img0, jnp.float32)
    j1 = jnp.asarray(img1, jnp.float32)
    xy0, _, v0 = detect.detect(j0, None, max_corners=60, min_dist=8)
    xy1, _, v1 = detect.detect(j1, None, max_corners=60, min_dist=8)
    d0 = orb.describe(j0, xy0, v0)
    d1 = orb.describe(j1, xy1, v1)
    idx, dist, ok = orb.match(d0, d1, v0, v1, max_dist=60)
    ok = np.asarray(ok)
    assert ok.sum() >= 15, ok.sum()
    disp = np.asarray(xy1)[np.asarray(idx)[ok]] - np.asarray(xy0)[ok]
    good = np.linalg.norm(disp - shift, axis=1) < 2.0
    assert good.mean() > 0.7, (good.mean(), disp[:5])


def test_bow_retrieval_finds_revisit():
    """The sim trajectory is periodic (20 s ellipse): frame k and frame
    k+period see the same scene from the same pose.  BoW must retrieve the
    first visit when the loop closes."""
    data = sim.generate(noise=False)
    period = 600  # full revolution = whole sequence; instead synthesize:
    frames = list(range(0, 40, 4)) + [0, 4, 8]   # revisit of early frames
    descs = [_frame_descriptors(data, k)[1] for k in frames]
    voc = vocab.Vocabulary.train(np.concatenate(descs, axis=0), n_words=50)
    db = vocab.LoopDatabase(voc, alpha=0.5, min_gap=5)
    for d in descs:
        db.add(d)
    # query the revisit of frame 0 (index 10 in `frames`)
    hit = db.query(10)
    assert hit is not None
    best, score = hit
    assert best in (0, 1), (best, score)


def test_pose_graph_closes_drift():
    """Chain of noisy odometry edges + one exact loop edge: optimization
    must pull the end pose back to the loop constraint."""
    rng = np.random.default_rng(0)
    N = 20
    # ground truth: circle
    qs_gt, Ps_gt = [], []
    for k in range(N):
        th = 2 * np.pi * k / N
        qs_gt.append(np.asarray(lie.so3_exp_quat(jnp.asarray([0, 0, th]))))
        Ps_gt.append(np.array([np.cos(th), np.sin(th), 0.0]) * 5.0)
    qs_gt = np.stack(qs_gt)
    Ps_gt = np.stack(Ps_gt)

    def rel(i, j):
        qi, qj = jnp.asarray(qs_gt[i]), jnp.asarray(qs_gt[j])
        dq = np.asarray(lie.quat_mul(lie.quat_conj(qi), qj))
        dP = np.asarray(lie.quat_rotate(lie.quat_conj(qi),
                                        jnp.asarray(Ps_gt[j] - Ps_gt[i])))
        return dP, dq

    ei, ej, dPs, dqs, ws = [], [], [], [], []
    for k in range(N - 1):
        dP, dq = rel(k, k + 1)
        # corrupt odometry translations
        dPs.append(dP + 0.1 * rng.standard_normal(3))
        dqs.append(dq)
        ei.append(k)
        ej.append(k + 1)
        ws.append(1.0)
    # exact loop edge N-1 -> 0 with high weight
    dP, dq = rel(N - 1, 0)
    ei.append(N - 1)
    ej.append(0)
    dPs.append(dP)
    dqs.append(dq)
    ws.append(10.0)

    # initial guess: integrate the noisy odometry
    Ps0 = [Ps_gt[0]]
    qs0 = [qs_gt[0]]
    for k in range(N - 1):
        q = np.asarray(lie.quat_mul(jnp.asarray(qs0[-1]),
                                    jnp.asarray(dqs[k])))
        P = Ps0[-1] + np.asarray(lie.quat_rotate(jnp.asarray(qs0[-1]),
                                                 jnp.asarray(dPs[k])))
        qs0.append(q)
        Ps0.append(P)
    Ps0 = np.stack(Ps0)
    qs0 = np.stack(qs0)
    drift0 = np.linalg.norm(Ps0[-1] - Ps_gt[-1])

    Ps, qs, stats = posegraph.optimize(Ps0, qs0, ei, ej,
                                       np.stack(dPs), np.stack(dqs),
                                       edge_weights=ws)
    driftN = np.linalg.norm(Ps[-1] - Ps_gt[-1])
    assert driftN < 0.5 * drift0, (drift0, driftN)
    # the loop edge must be satisfied tightly
    r = posegraph.se3_edge_residual(
        jnp.asarray(Ps[-1]), jnp.asarray(qs[-1]),
        jnp.asarray(Ps[0]), jnp.asarray(qs[0]),
        jnp.asarray(dP), jnp.asarray(dq))
    assert float(jnp.linalg.norm(r)) < 0.1
