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


def _inv3(A: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (adjugate / det) — arithmetic only, so it
    vmaps and fuses on TPU where lax LU dispatch would not."""
    c0 = jnp.cross(A[..., 1, :], A[..., 2, :])
    c1 = jnp.cross(A[..., 2, :], A[..., 0, :])
    c2 = jnp.cross(A[..., 0, :], A[..., 1, :])
    det = jnp.einsum("...i,...i->...", A[..., 0, :], c0)
    adjT = jnp.stack([c0, c1, c2], axis=-1)  # = adj(A)^T rows -> columns
    return adjT / det[..., None, None]


def _polar3(M: jax.Array, n_iters: int = 8) -> jax.Array:
    """Orthogonal polar factor of a 3x3 matrix via scaled Newton iteration
    X <- (g X + X^-T / g) / 2 (Higham scaling g = (||X^-1||/||X||)^(1/2)).

    Arithmetic only — replaces the 3x3 SVD in the Kabsch solve, which on TPU
    lowers to a slow iterative one-sided Jacobi (CLAUDE.md: avoid small
    SVD/eigensolves).  Converges quadratically; 8 iterations reach fp32
    round-off from any well-conditioned start.  For det(M) > 0 (the rigid
    inlier-refit regime) the limit is the nearest rotation."""
    X = M / jnp.maximum(jnp.linalg.norm(M, axis=(-2, -1), keepdims=True),
                        1e-12)

    def body(X, _):
        Xinv_t = jnp.swapaxes(_inv3(X), -1, -2)
        g = jnp.sqrt(jnp.sqrt(
            (jnp.sum(Xinv_t * Xinv_t, axis=(-2, -1), keepdims=True) + 1e-20)
            / (jnp.sum(X * X, axis=(-2, -1), keepdims=True) + 1e-20)))
        X = 0.5 * (g * X + Xinv_t / g)
        return X, None

    X, _ = jax.lax.scan(body, X, None, length=n_iters, unroll=n_iters)
    return X


def kabsch_polar(P: jax.Array, Q: jax.Array, w: jax.Array,
                 T_fallback: jax.Array) -> jax.Array:
    """SVD-free weighted rigid alignment (Q ~= R P + t) via the polar
    decomposition R = polar(M), M = sum w Qc Pc^T.

    Identical to `kabsch` when det(M) > 0 (always, for a consistent inlier
    set); returns T_fallback when the correspondence set is degenerate
    (fewer than 3 inliers, det <= 0, or near-singular M), so it is safe as
    an unconditional LM-init polish."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    wn = w / wsum
    p_bar = jnp.einsum("...n,...ni->...i", wn, P)
    q_bar = jnp.einsum("...n,...ni->...i", wn, Q)
    Pc = P - p_bar[..., None, :]
    Qc = Q - q_bar[..., None, :]
    M = jnp.einsum("...n,...ni,...nj->...ij", wn, Qc, Pc)
    det = jnp.linalg.det(M)
    scale2 = jnp.sum(M * M, axis=(-2, -1))
    ok = ((jnp.sum(w > 0, axis=-1) >= 3)
          & (det > 1e-9 * scale2 * jnp.sqrt(jnp.maximum(scale2, 1e-30))))
    R = _polar3(M)
    t = q_bar - jnp.einsum("...ij,...j->...i", R, p_bar)
    T = se3.from_Rt(R, t)
    return jnp.where(ok[..., None, None], T, T_fallback)


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
    """All-inlier weighted rigid re-fit of the RANSAC/motion-model winner —
    the LM-init polish (a 3-point hypothesis or a propagated motion model is
    exact only up to noise on its 3 points; the all-inlier fit is the ML
    rigid estimate under isotropic 3D noise, so the downstream flow-LM
    starts inside its quadratic basin and converges in fewer iterations).
    Falls back to T on degenerate inlier sets."""
    return kabsch_polar(X_src, X_tgt, inlier.astype(jnp.float32), T)


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
