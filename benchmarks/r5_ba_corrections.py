"""r5: forensics for the TPU-backend BA-on gap (RESULTS section 9).

Runs the 150-frame hard synthetic through the SLAM frontend with
windowed BA and logs the per-BA-call correction applied to the latest
pose (RgbdOdometry.ba_corrections). On CPU the corrections stay at the
centimetre level and the final ATE is ~3 cm; the probe shows whether the
TPU run's divergence comes from a few spiking windows (bad landmark
inheritances amplified) or a broad drift.

Run on either backend:
    bash scripts/tpu_run.sh 3400 benchmarks/r5_ba_corrections.py
    JAX_PLATFORMS=cpu via jax.config in-process: pass --cpu
"""
import os
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    from ros_gpu_depthmap_fusion_tpu.pipeline.datasets import TumRgbdDataset
    from ros_gpu_depthmap_fusion_tpu.pipeline.tum_runner import (
        write_hard_synthetic_tum_sequence)
    from ros_gpu_depthmap_fusion_tpu.slam.ate import ate_rmse
    from ros_gpu_depthmap_fusion_tpu.slam.frontend import RgbdOdometry

    print(f"backend={jax.default_backend()}", flush=True)
    root = "/tmp/tum_hard_ba_probe"
    if not os.path.isdir(root):
        write_hard_synthetic_tum_sequence(root)
        print("sequence written", flush=True)
    ds = TumRgbdDataset(root)
    odo = RgbdOdometry(ds.intrinsics, max_keypoints=512, min_inliers=12,
                       inlier_threshold=0.08)
    est, gt = [], []
    t0 = time.time()
    n = 0
    ba_at = []
    for frame in ds:
        depth_m = frame.depth_u16.astype(np.float32) * frame.depth_scale
        r = odo.process(frame.stamp, frame.intensity, depth_m)
        pose = r.pose
        if r.is_keyframe and len(odo.keyframes) % 8 == 0:
            before = len(getattr(odo, "ba_corrections", []))
            # capture the window problem for cross-backend replay
            built = odo.build_ba_window(8)
            if built is not None and "--capture" in sys.argv:
                pr = built[0]
                os.makedirs("/tmp/ba_problems", exist_ok=True)
                np.savez(f"/tmp/ba_problems/{jax.default_backend()}_"
                         f"{len(ba_at):02d}.npz",
                         poses=np.asarray(pr.poses),
                         landmarks=np.asarray(pr.landmarks),
                         obs_pose=np.asarray(pr.obs_pose),
                         obs_lm=np.asarray(pr.obs_lm),
                         obs_pt=np.asarray(pr.obs_pt),
                         obs_valid=np.asarray(pr.obs_valid))
            import os as _os
            odo.run_ba(window=int(_os.environ.get("BA_WIN", 8)),
                       iterations=int(_os.environ.get("BA_ITERS", 4)))
            if len(getattr(odo, "ba_corrections", [])) > before:
                ba_at.append(n)
            pose = odo.pose
        est.append(np.asarray(pose)[:3, 3])
        if frame.tf_world_cam is not None:
            gt.append((len(est) - 1, frame.tf_world_cam[:3, 3]))
        n += 1
        if n % 30 == 0:
            print(f"frame {n} ({time.time() - t0:.0f}s)", flush=True)
    idx = [i for i, _ in gt]
    ate = ate_rmse(np.stack([est[i] for i in idx]),
                   np.stack([g for _, g in gt]))
    corr = np.asarray(getattr(odo, "ba_corrections", []))
    print(f"ATE {ate * 100:.2f} cm over {n} frames, "
          f"{len(odo.keyframes)} keyframes, {len(corr)} BA calls",
          flush=True)
    with np.printoptions(precision=3, suppress=True):
        print("BA corrections (m):", corr)
    print("BA call frame indices:", ba_at)


if __name__ == "__main__":
    main()
