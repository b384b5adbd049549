"""Windowed bundle adjustment with Schur-complement reduction.

Gauss-Newton over a window of keyframe poses and 3-D landmarks with RGB-D
point observations (landmark measured in camera frame). The landmark block
of the Hessian is eliminated analytically (each observation contributes an
identity 3x3 to its landmark block, so ``H_ll = (count + lambda) * I`` and
the Schur complement is one big MXU matmul over the per-landmark coupling
matrices) — the TPU-shaped version of the classic sparse Schur trick.

Distribution (north star): observations and landmarks shard across
devices; each shard reduces its contribution to the [6M, 6M] reduced
camera system, combined with one ``psum``, and every device solves the
tiny dense system redundantly while back-substituting only its own
landmarks. See :func:`build_sharded_ba_step`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ros_gpu_depthmap_fusion_tpu.slam.lie import se3_exp, skew


class BAProblem(NamedTuple):
    """Static-shape BA window.

    poses:     [M, 4, 4] world <- camera.
    landmarks: [L, 3] world points.
    obs_pose:  [O] int32 pose index per observation.
    obs_lm:    [O] int32 landmark index.
    obs_pt:    [O, 3] measured camera-frame point.
    obs_valid: [O] bool.
    """
    poses: jnp.ndarray
    landmarks: jnp.ndarray
    obs_pose: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_valid: jnp.ndarray


def _residuals_and_blocks(poses, landmarks, obs_pose, obs_lm, obs_pt,
                          obs_valid):
    """Per-observation residual r = R^T (X - t) - z and Jacobian blocks
    J_pose [O, 3, 6] (d r / d [dt, dtheta]) and J_lm = R^T [O, 3, 3]."""
    r_wc = poses[obs_pose, :3, :3]                  # [O, 3, 3]
    t_wc = poses[obs_pose, :3, 3]                   # [O, 3]
    x = landmarks[obs_lm]                           # [O, 3]
    rt = jnp.swapaxes(r_wc, -1, -2)
    p_cam = jnp.einsum("oij,oj->oi", rt, x - t_wc)
    res = p_cam - obs_pt                            # [O, 3]
    j_t = -rt                                       # d r / d delta_t
    j_th = skew(p_cam)                              # d r / d delta_theta
    j_pose = jnp.concatenate([j_t, j_th], axis=-1)  # [O, 3, 6]
    j_lm = rt                                       # [O, 3, 3]
    w = obs_valid.astype(poses.dtype)
    return res, j_pose, j_lm, w


HUBER_DELTA = 0.15   # metres; residuals beyond this are IRLS-down-weighted
# stereo-depth noise model sigma(z) = SIGMA0 + SIGMA2 * z^2 (RealSense
# class); observations are weighted by (sigma(2m)/sigma(z))^2 so a 6 m
# return (sigma ~ 9x a 1 m return) cannot bias the pose the way an
# isotropic weighting lets it
SIGMA0 = 0.001
SIGMA2 = 0.0025


def _huber_w(res, w, z):
    """Measurement weighting: depth-noise normalization (1/sigma(z)^2,
    normalized at 2 m) x Huber IRLS (1 inside HUBER_DELTA, delta/|r|
    beyond — keeps outlier observations, e.g. bad landmark inheritances
    that survive the frontend gates, from dominating the normal
    equations)."""
    sig = SIGMA0 + SIGMA2 * z * z
    sig_ref = SIGMA0 + SIGMA2 * 4.0
    w = w * (sig_ref / sig) ** 2
    rn = jnp.sqrt(jnp.sum(res * res, axis=-1) + 1e-12)
    return w * jnp.minimum(1.0, HUBER_DELTA / rn)


def _reduce_local(poses, landmarks, obs_pose, obs_lm, obs_pt, obs_valid,
                  num_poses: int, num_landmarks: int, damping: float):
    """One shard's contributions: (Hpp [M,6,6], b_p [M,6], W [L, 6M, 3]
    as [L, M, 6, 3], counts [L], b_l [L, 3], chi2)."""
    m, l = num_poses, num_landmarks
    res, j_pose, j_lm, w = _residuals_and_blocks(
        poses, landmarks, obs_pose, obs_lm, obs_pt, obs_valid)
    w = _huber_w(res, w, obs_pt[:, 2])
    jw = j_pose * w[:, None, None]
    hpp = jnp.zeros((m, 6, 6)).at[obs_pose].add(
        jnp.einsum("oik,oil->okl", jw, j_pose), mode="drop")
    b_p = jnp.zeros((m, 6)).at[obs_pose].add(
        -jnp.einsum("oik,oi->ok", jw, res), mode="drop")
    # landmark blocks: J_lm^T J_lm = I per valid obs
    counts = jnp.zeros((l,)).at[obs_lm].add(w, mode="drop")
    b_l = jnp.zeros((l, 3)).at[obs_lm].add(
        -jnp.einsum("oij,oi->oj", j_lm * w[:, None, None], res),
        mode="drop")
    # coupling W[j, i] = sum_obs J_pose^T J_lm  (6x3)
    wpl = jnp.einsum("oik,oij->okj", jw, j_lm)      # [O, 6, 3]
    coupling = jnp.zeros((l, m, 6, 3)).at[obs_lm, obs_pose].add(
        wpl, mode="drop")
    chi2 = jnp.sum(w * jnp.sum(res * res, axis=-1))
    return hpp, b_p, coupling, counts, b_l, chi2


def _solve_reduced(hpp, b_p, coupling, counts, b_l, damping: float,
                   fix_first: bool = True):
    """Schur-complement solve. Returns (delta_pose [M, 6],
    delta_lm [L, 3])."""
    m = hpp.shape[0]
    l = counts.shape[0]
    inv_hll = 1.0 / (counts + damping)              # [L] (H_ll = c*I + lam)
    w_flat = coupling.reshape(l, 6 * m, 3)  # pose-major flatten: row = i * 6 + a
    # S = Hpp_blockdiag + lambda I - sum_j W_j inv_hll_j W_j^T
    s_full = jax.lax.fori_loop(
        0, m, lambda i, acc: jax.lax.dynamic_update_slice(
            acc, hpp[i], (6 * i, 6 * i)),
        jnp.zeros((6 * m, 6 * m)))
    s_full = s_full + damping * jnp.eye(6 * m)
    ws = w_flat * inv_hll[:, None, None]
    s_full = s_full - jnp.einsum("lak,lbk->ab", ws, w_flat)
    b_red = b_p.reshape(-1) - jnp.einsum("lak,lk->a", ws, b_l)

    if fix_first:
        # gauge fix: pin pose 0 (identity rows/cols, zero rhs)
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (m - 1))])
        s_full = (s_full * mask[:, None] * mask[None, :]
                  + jnp.diag(1.0 - mask))
        b_red = b_red * mask

    delta_p = jnp.linalg.solve(s_full, b_red).reshape(m, 6)
    # back-substitute landmarks: dl = inv_hll (b_l - W^T dp)
    wtdp = jnp.einsum("lak,a->lk", w_flat, delta_p.reshape(-1))
    delta_l = inv_hll[:, None] * (b_l - wtdp)
    return delta_p, delta_l


def _apply_delta(poses, landmarks, delta_p, delta_l):
    """Pose update: R <- R exp([dtheta]x), t <- t + dt."""
    dr = se3_exp(jnp.concatenate(
        [jnp.zeros_like(delta_p[:, :3]), delta_p[:, 3:]], axis=-1))
    new_r = poses[:, :3, :3] @ dr[:, :3, :3]
    new_t = poses[:, :3, 3] + delta_p[:, :3]
    new_poses = poses.at[:, :3, :3].set(new_r).at[:, :3, 3].set(new_t)
    return new_poses, landmarks + delta_l


@functools.partial(jax.jit, static_argnames=("iterations",))
def solve_window(problem: BAProblem, iterations: int = 8,
                 damping: float = 1e-4) -> Tuple[BAProblem, jnp.ndarray]:
    """Run fixed Gauss-Newton iterations; returns (problem', chi2 [iters]).

    Traced under float32 matmul precision: TPU's DEFAULT matmul precision
    is bf16, which destroys the normal-equation solve (measured: the hard
    synthetic diverges from 4.7 cm ATE to 16.7 m the moment BA runs on
    the axon backend; float32 precision restores CPU-grade results).
    A no-op on CPU.

    Levenberg-Marquardt step control: a candidate update is ACCEPTED only
    if it does not increase chi2; rejected steps raise the damping 8x,
    accepted ones relax it 2x (floored at the configured damping). Plain
    fixed-iteration GN diverged on real odometry windows with outlier
    landmark inheritances (measured: chi2 0.67 -> 19.5 on a captured
    window, identically on CPU and TPU)."""
    m = problem.poses.shape[0]
    l = problem.landmarks.shape[0]

    def body(carry, _):
        poses, landmarks, damp = carry
        hpp, b_p, coupling, counts, b_l, chi2 = _reduce_local(
            poses, landmarks, problem.obs_pose, problem.obs_lm,
            problem.obs_pt, problem.obs_valid, m, l, damp)
        dp, dl = _solve_reduced(hpp, b_p, coupling, counts, b_l, damp)
        cand_p, cand_l = _apply_delta(poses, landmarks, dp, dl)
        res, _, _, w = _residuals_and_blocks(
            cand_p, cand_l, problem.obs_pose, problem.obs_lm,
            problem.obs_pt, problem.obs_valid)
        w = _huber_w(res, w, problem.obs_pt[:, 2])
        chi2_new = jnp.sum(w * jnp.sum(res * res, axis=-1))
        accept = chi2_new <= chi2
        poses = jnp.where(accept, cand_p, poses)
        landmarks = jnp.where(accept, cand_l, landmarks)
        damp = jnp.clip(jnp.where(accept, damp * 0.5, damp * 8.0),
                        damping, 1e3)
        return (poses, landmarks, damp), chi2

    with jax.default_matmul_precision("float32"):
        (poses, landmarks, _), chi2s = jax.lax.scan(
            body, (problem.poses, problem.landmarks,
                   jnp.float32(damping)), None, length=iterations)
    return problem._replace(poses=poses, landmarks=landmarks), chi2s


def build_sharded_ba_step(mesh, axis: str, num_poses: int,
                          landmarks_per_shard: int, obs_per_shard: int,
                          iterations: int = 8, damping: float = 1e-4):
    """Distributed BA: landmarks + their observations sharded over ``axis``;
    the [6M, 6M] reduced camera system is psum-combined, solved redundantly
    per device, and landmark back-substitution stays local.

    Expects inputs already sharded: landmarks [n*Ls, 3] (P(axis)),
    obs_* [n*Os] (P(axis)); poses replicated. Observation landmark indices
    must be LOCAL to their shard.
    """
    m = num_poses

    def local(poses, landmarks, obs_pose, obs_lm, obs_pt, obs_valid):
        def body(carry, _):
            poses, landmarks, damp = carry
            hpp, b_p, coupling, counts, b_l, chi2 = _reduce_local(
                poses, landmarks, obs_pose, obs_lm, obs_pt, obs_valid,
                m, landmarks_per_shard, damp)
            # combine the reduced camera system across landmark shards
            l = landmarks_per_shard
            inv_hll = 1.0 / (counts + damp)
            w_flat = coupling.reshape(l, 6 * m, 3)  # pose-major flatten: row = i * 6 + a
            ws = w_flat * inv_hll[:, None, None]
            s_contrib = -jnp.einsum("lak,lbk->ab", ws, w_flat)
            b_contrib = -jnp.einsum("lak,lk->a", ws, b_l)
            hpp = jax.lax.psum(hpp, axis)
            b_p = jax.lax.psum(b_p, axis)
            s_extra = jax.lax.psum(s_contrib, axis)
            b_extra = jax.lax.psum(b_contrib, axis)
            chi2 = jax.lax.psum(chi2, axis)

            s_full = jax.lax.fori_loop(
                0, m, lambda i, acc: jax.lax.dynamic_update_slice(
                    acc, hpp[i], (6 * i, 6 * i)),
                jnp.zeros((6 * m, 6 * m)))
            s_full = s_full + damp * jnp.eye(6 * m) + s_extra
            b_red = b_p.reshape(-1) + b_extra
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (m - 1))])
            s_full = (s_full * mask[:, None] * mask[None, :]
                      + jnp.diag(1.0 - mask))
            b_red = b_red * mask
            delta_p = jnp.linalg.solve(s_full, b_red).reshape(m, 6)
            wtdp = jnp.einsum("lak,a->lk", w_flat, delta_p.reshape(-1))
            delta_l = inv_hll[:, None] * (b_l - wtdp)
            cand_p, cand_l = _apply_delta(poses, landmarks, delta_p,
                                          delta_l)
            # LM accept/reject (see solve_window); chi2_new is the psum of
            # the per-shard candidate residuals, so every shard takes the
            # same branch
            res, _, _, w = _residuals_and_blocks(
                cand_p, cand_l, obs_pose, obs_lm, obs_pt, obs_valid)
            w = _huber_w(res, w, obs_pt[:, 2])
            chi2_new = jax.lax.psum(
                jnp.sum(w * jnp.sum(res * res, axis=-1)), axis)
            accept = chi2_new <= chi2
            poses = jnp.where(accept, cand_p, poses)
            landmarks = jnp.where(accept, cand_l, landmarks)
            damp = jnp.clip(jnp.where(accept, damp * 0.5, damp * 8.0),
                            damping, 1e3)
            return (poses, landmarks, damp), chi2

        # float32 matmul precision: TPU default bf16 destroys the
        # normal-equation solve (see solve_window)
        with jax.default_matmul_precision("float32"):
            (poses, landmarks, _), chi2s = jax.lax.scan(
                body, (poses, landmarks, jnp.float32(damping)), None,
                length=iterations)
        return poses, landmarks, chi2s

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P()),
        check_vma=False)
    return jax.jit(mapped)
