"""r5: replay BA problems captured on one backend (r5_ba_corrections
--capture -> /tmp/ba_problems/*.npz) on THIS backend's solver and report
the correction each solve applies to the last pose — separates "the TPU
frontend builds a bad problem" from "the TPU solver mis-solves a good
problem"."""
import glob
import os
import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ros_gpu_depthmap_fusion_tpu.slam.ba import BAProblem, solve_window
    print(f"replay backend={jax.default_backend()}", flush=True)
    for f in sorted(glob.glob("/tmp/ba_problems/*.npz")):
        d = np.load(f)
        pr = BAProblem(
            poses=jnp.asarray(d["poses"]),
            landmarks=jnp.asarray(d["landmarks"]),
            obs_pose=jnp.asarray(d["obs_pose"]),
            obs_lm=jnp.asarray(d["obs_lm"]),
            obs_pt=jnp.asarray(d["obs_pt"]),
            obs_valid=jnp.asarray(d["obs_valid"]))
        solved, chi2s = solve_window(pr, iterations=4)
        dp = np.linalg.norm(np.asarray(solved.poses)[-1, :3, 3]
                            - d["poses"][-1, :3, 3])
        c = np.asarray(chi2s)
        # residual stats of the PRIOR problem (is the data itself bad?)
        print(f"{os.path.basename(f)}: obs={len(d['obs_pose'])} "
              f"chi2 {c[0]:.4f} -> {c[-1]:.4f} | last-pose "
              f"correction {dp * 100:.1f} cm", flush=True)


if __name__ == "__main__":
    main()
