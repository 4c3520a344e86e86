import sys
sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from vio_tpu import metrics, runner, sim
from vio_tpu.config import sim_config
from vio_tpu.estimator import MARGIN_OLD
from vio_tpu.loop.closer import LoopCloser

_RNG = np.random.default_rng(12345)
_DESC_CACHE = {}


def oracle_desc(ids):
    out = np.zeros((len(ids), 8), np.uint32)
    for n, i in enumerate(ids):
        d = _DESC_CACHE.get(int(i))
        if d is None:
            d = _RNG.integers(0, 2 ** 32, size=8, dtype=np.uint32)
            _DESC_CACHE[int(i)] = d
        out[n] = d
    return out


class DebugCloser(LoopCloser):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.n_query = 0
        self.n_hit = 0
        self.n_verify_fail = 0
        self.reasons = []

    def add_keyframe(self, t, p, R, desc, xy, pts_cam=None, pts_xy=None):
        r = super().add_keyframe(t, p, R, desc, xy, pts_cam, pts_xy)
        if self.db is not None:
            k = len(self.kfs) - 1
            hit = self.db.query(k)
            self.n_query += 1
            if hit is not None:
                self.n_hit += 1
                if r is None:
                    self.n_verify_fail += 1
                    j, score = hit
                    # re-run verify with tracing
                    old, new = self.kfs[j], self.kfs[k]
                    why = "?"
                    if old.pts_cam is None or len(old.pts_cam) < self.min_matches:
                        why = f"old pts {0 if old.pts_cam is None else len(old.pts_cam)}"
                    else:
                        ia, ib = self._match(new.desc, old.desc)
                        if len(ia) < self.min_matches:
                            why = f"matches {len(ia)}"
                        else:
                            why = f"pnp-gate (matches={len(ia)})"
                    self.reasons.append((j, k, round(score, 3), why))
        return r


def main():
    data = sim.generate(noise=True, pixel_noise=0.0)
    cfg = sim_config(acc_n=0.2687 / 3.0, gyr_n=0.2121 / 3.0)
    closer = DebugCloser(R_ic=cfg.R_ic, t_ic=cfg.t_ic,
                         min_gap=80, train_after=25, loop_weight=5.0,
                         focal=cfg.focal_length)
    n_cb = [0, 0]

    def on_frame(est, t, feats):
        if not est.initialized or est.marg_flag != MARGIN_OLD:
            return
        n_cb[0] += 1
        ids, xy, pts_cam = est.current_landmarks()
        if len(ids) < 10:
            n_cb[1] += 1
            return
        tt, p, R = est.latest_pose()
        closer.add_keyframe(tt, p, R, oracle_desc(ids), xy,
                            pts_cam=pts_cam, pts_xy=xy)

    est, traj = runner.run_sim(data, cfg, on_frame=on_frame)
    gt_p, _ = runner.sim_ground_truth_at(data, traj["t"])
    ape = metrics.ape_rmse(traj["p"], gt_p)
    print("initialized:", est.initialized, "failures:", est.failure_count)
    print("frames:", len(traj["t"]), "ape:", ape)
    print("callbacks:", n_cb[0], "too-few-landmarks:", n_cb[1])
    print("keyframes:", len(closer.kfs), "queries:", closer.n_query,
          "hits:", closer.n_hit, "verify-fails:", closer.n_verify_fail,
          "loops:", len(closer.loops))
    for r in closer.reasons[:20]:
        print("  reason:", r)


if __name__ == "__main__":
    main()
