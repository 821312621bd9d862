"""Vmapped minimal-solve RANSAC for pose/motion initialization.

Replaces the reference's cv::solvePnPRansac(AP3P, 500 iters, 0.4px, 0.98)
(Tracking::GetInitModelCam / GetInitModelObj, Tracking.cc:1614-1849) with a
TPU-native formulation:

  * instead of a 3D->2D P3P minimal solver (quartic root finding — hostile to
    vmap), we use the 3D->3D rigid alignment that the RGB-D setting affords:
    both frames carry depth, so each correspondence gives a world point in
    the previous frame AND a camera-frame point in the current frame.  A
    3-point weighted Kabsch/Umeyama solve (one 3x3 SVD) is closed-form,
    branch-free and vmaps perfectly across hundreds of hypotheses;
  * inliers are still scored by 2D reprojection error with the reference's
    0.4px threshold, so the accept/reject behavior matches;
  * the motion-model comparison (constant-velocity for the camera,
    propagated last motion for objects) keeps the reference's "pick the
    model with more inliers" logic (Tracking.cc:1666-1713, 1786-1847).

Everything is fixed-shape and jit/vmap-safe; sampling uses explicit PRNG
keys (the reference seeds rand() with wall time — Tracking.cc:171).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from ..geometry import se3
from ..ops.select import compact


def rigid_from_triangle(P: jax.Array, Q: jax.Array) -> jax.Array:
    """Closed-form rigid transform from a 3-point correspondence (P -> Q).

    Builds orthonormal frames on both triangles and composes them —
    arithmetic only, no SVD/eigensolve (TPU small-matrix SVDs are iterative
    and slow), exact for rigid triples, ideal as a vmapped RANSAC hypothesis
    generator.  P, Q: (3, 3) rows are points.
    """
    def frame(A):
        e1 = A[1] - A[0]
        e1 = e1 / (jnp.linalg.norm(e1) + 1e-12)
        v2 = A[2] - A[0]
        e2 = v2 - jnp.dot(v2, e1) * e1
        e2 = e2 / (jnp.linalg.norm(e2) + 1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1)  # columns

    Fp = frame(P)
    Fq = frame(Q)
    R = Fq @ Fp.T
    t = jnp.mean(Q, axis=0) - R @ jnp.mean(P, axis=0)
    return se3.from_Rt(R, t)


def kabsch(P: jax.Array, Q: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted rigid alignment: find T (4x4) minimizing sum w ||Q - T(P)||^2.

    P, Q: (N, 3); w: (N,) nonnegative.  Returns T with Q ~= R P + t.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    wn = w / wsum
    p_bar = jnp.einsum("n,ni->i", wn, P)
    q_bar = jnp.einsum("n,ni->i", wn, Q)
    Pc = P - p_bar
    Qc = Q - q_bar
    M = jnp.einsum("n,ni,nj->ij", wn, Qc, Pc)  # (3,3)
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(det)
    R = U @ D @ Vt
    t = q_bar - R @ p_bar
    return se3.from_Rt(R, t)


def reprojection_inliers(T: jax.Array, X_src: jax.Array, uv_obs: jax.Array,
                         valid: jax.Array, K: jax.Array, thres: float):
    """Inlier mask under candidate T: ||uv_obs - pi(T X_src)|| < thres
    (the reference's RANSAC / motion-model scoring, Tracking.cc:1673-1688)."""
    Y = se3.apply(T, X_src)
    uv_hat = cam.project(Y, K)
    err = jnp.linalg.norm(uv_obs - uv_hat, axis=-1)
    ok = valid & (err < thres) & (Y[..., 2] > 0)
    return ok, jnp.sum(ok.astype(jnp.int32), axis=-1)


@functools.partial(jax.jit, static_argnames=("n_samples",))
def ransac_rigid(X_src: jax.Array, X_tgt: jax.Array, uv_obs: jax.Array,
                 valid: jax.Array, K: jax.Array, key: jax.Array,
                 n_samples: int = 256, thres: float = 0.4):
    """RANSAC over 3-point Kabsch hypotheses.

    X_src: (N,3) previous-frame points (world for camera/object solves);
    X_tgt: (N,3) current-frame points in CAMERA coordinates;
    uv_obs: (N,2) current pixels for inlier scoring.
    Returns (T_best, inlier_mask, n_inliers).
    """
    perm, n_valid = compact(valid)
    n_valid = jnp.maximum(n_valid, 1)
    picks = jax.random.randint(key, (n_samples, 3), 0, n_valid)
    idx = perm[picks]  # (S, 3) indices of valid points

    Ps = X_src[idx]  # (S, 3, 3)
    Qs = X_tgt[idx]
    Ts = jax.vmap(rigid_from_triangle)(Ps, Qs)  # (S, 4, 4)

    _, counts = jax.vmap(
        lambda T: reprojection_inliers(T, X_src, uv_obs, valid, K, thres)
    )(Ts)
    best = jnp.argmax(counts)
    T_best = Ts[best]
    mask, n_in = reprojection_inliers(T_best, X_src, uv_obs, valid, K, thres)
    return T_best, mask, n_in


def refine_with_inliers(T: jax.Array, X_src: jax.Array, X_tgt: jax.Array,
                        inlier: jax.Array) -> jax.Array:
    """One all-inlier weighted Kabsch re-fit (cheap polish of the winner)."""
    return kabsch(X_src, X_tgt, inlier.astype(jnp.float32))


def choose_init(T_ransac, mask_ransac, n_ransac, T_model, X_src, uv_obs,
                valid, K, thres: float = 0.4):
    """Reference model selection: RANSAC vs motion-model by inlier count
    (Tracking.cc:1693-1713).  Returns (T, mask, n, used_model_flag)."""
    mask_mm, n_mm = reprojection_inliers(T_model, X_src, uv_obs, valid, K, thres)
    use_mm = n_mm >= n_ransac
    T = jnp.where(use_mm, T_model, T_ransac)
    mask = jnp.where(use_mm, mask_mm, mask_ransac)
    n = jnp.where(use_mm, n_mm, n_ransac)
    return T, mask, n, use_mm
