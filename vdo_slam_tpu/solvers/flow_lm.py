"""Joint optical-flow + SE(3) Levenberg-Marquardt solver.

This is the production estimator of the rebuild — the TPU-native equivalent
of g2o's marginalized flow-vertex graphs in:
  * Optimizer::PoseOptimizationFlow2Cam (camera pose, Optimizer.cc:2333-2542)
  * Optimizer::PoseOptimizationFlow2    (object motion, Optimizer.cc:2755-2972)
with the edge model EdgeSE3ProjectFlow2 (types_six_dof_expmap.h:436-476) and
EdgeFlowPrior (types_six_dof_expmap.h:414-432).

Problem per correspondence i (uv_i = last-frame pixel, z_i = last-frame
depth, both FIXED; T_wl = last camera-to-world, FIXED):

    X_w,i  = T_wl * unproject(uv_i, z_i)                 (fixed 3D anchor)
    r_proj = (uv_i + f_i) - pi(T * X_w,i)                (2,)  info = s_p I
    r_flow = f_i - m_i                                   (2,)  info = s_f I

unknowns: T in SE(3) (camera pose T_cw, or object motion G = T_cw H) and a
2-DoF flow vector f_i per point (init m_i = measured flow).  Huber with
delta^2 = rp_thres on the information-weighted r_proj (Optimizer.cc:2371).

Where g2o marginalizes the flow vertices inside its sparse block solver, the
2x2 flow blocks here are ISOTROPIC SCALARS (both Jacobians of f are I_2), so
the Schur complement is closed-form:

    a_i      = s_p w_i + s_f + lambda              (scalar A_ff)
    H_red    = sum_i s_p w_i (1 - s_p w_i / a_i) J_i^T J_i + lambda I
    g_red    = sum_i J_i^T [ s_p w_i (1 - s_p w_i/a_i) r_p
                             + (s_p w_i s_f / a_i) r_f ]   (see derivation)
    dxi      = solve(H_red, g_red);   df_i = (b_f,i - s_p w_i J_i dxi)/a_i

One LM iteration = a handful of fused (N,2,6) einsums + a 6x6 Cholesky —
microseconds on TPU vs g2o's per-edge virtual dispatch.  vmap over the
leading axis solves all K objects simultaneously.

Left-multiplicative retraction T <- exp(dxi) T matches VertexSE3Expmap::oplus
(types_six_dof_expmap.h:79-83).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from ..geometry import se3


@dataclasses.dataclass(frozen=True)
class FlowLMParams:
    info_proj: float = 0.1        # projection information (Optimizer.cc:2405)
    info_flow: float = 0.3        # flow-prior information (0.3 cam / 0.5 obj)
    rp_thres: float = 0.04        # Huber delta^2 AND outlier chi2 threshold
    iters: int = 30
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.5
    min_corres: int = 3           # reference bails below 3 (Optimizer.cc:2450)
    gain_eps: float = 1e-5        # early stop: relative cost decrease below
                                  # this twice in a row ends the loop (the
                                  # g2o gain-threshold terminate action)
    unroll: int = 0               # >0: fixed-length scan(unroll=k) with
                                  # stall masking instead of lax.while_loop —
                                  # XLA:TPU specializes layouts/fuses across
                                  # unrolled iterations (the PCG finding in
                                  # DESIGN.md); converged iterations become
                                  # masked no-ops.  0 = dynamic while_loop.


def _proj_jacobian(Y: jax.Array, K: jax.Array) -> jax.Array:
    """d pi / d Y for camera-frame points Y (..., 3) -> (..., 2, 3)."""
    fx, fy = K[0], K[1]
    x, y, z = Y[..., 0], Y[..., 1], Y[..., 2]
    inv_z = 1.0 / jnp.maximum(jnp.abs(z), 1e-6) * jnp.sign(z + 1e-12)
    zeros = jnp.zeros_like(x)
    row0 = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z * inv_z], axis=-1)
    row1 = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z * inv_z], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _pose_point_jacobian(Y: jax.Array) -> jax.Array:
    """d(exp(xi) T X)/d xi at xi=0 with xi=(omega, upsilon): (..., 3, 6).

    Left perturbation: delta Y = -[Y]_x omega + upsilon.
    """
    W = -se3.hat(Y)  # (..., 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Y.dtype), W.shape)
    return jnp.concatenate([W, eye], axis=-1)


def _residuals(T, f, X_w, uv_last, flow_meas, K):
    Y = se3.apply(T, X_w)
    uv_hat = cam.project(Y, K)
    r_p = (uv_last + f) - uv_hat
    r_f = f - flow_meas
    return r_p, r_f, Y


def _huber_weight(chi2, delta2):
    """g2o RobustKernelHuber weight rho'(chi2) on information-weighted chi2."""
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, 1.0, delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))


def _cost(T, f, X_w, uv_last, flow_meas, valid, K, p: FlowLMParams):
    r_p, r_f, Y = _residuals(T, f, X_w, uv_last, flow_meas, K)
    chi2_p = p.info_proj * jnp.sum(r_p * r_p, axis=-1)
    # Huber rho on the projection term
    delta2 = p.rp_thres
    delta = jnp.sqrt(delta2)
    rho = jnp.where(
        chi2_p <= delta2, chi2_p,
        2.0 * delta * jnp.sqrt(jnp.maximum(chi2_p, 1e-12)) - delta2,
    )
    chi2_f = p.info_flow * jnp.sum(r_f * r_f, axis=-1)
    return jnp.sum(jnp.where(valid, rho + chi2_f, 0.0))


def solve(T_init: jax.Array, uv_last: jax.Array, depth_last: jax.Array,
          flow_meas: jax.Array, T_cw_last: jax.Array, valid: jax.Array,
          K: jax.Array, p: FlowLMParams):
    """Run the joint flow-pose LM.

    Args:
      T_init: (4,4) initial pose/motion estimate (world -> current camera).
      uv_last: (N,2) last-frame pixels (the fixed `obs` of EdgeSE3ProjectFlow2).
      depth_last: (N,) last-frame depths (optionally noise-injected upstream).
      flow_meas: (N,2) measured optical flow (the prior measurement).
      T_cw_last: (4,4) last world->camera pose; anchors X_w via its inverse.
      valid: (N,) mask.
      K: (4,) intrinsics.

    Returns dict(T, flow, inlier, chi2, n_inlier, repro_err).
    """
    T_wl = se3.inv(T_cw_last)
    X_w = cam.unproject_to_world(uv_last, depth_last, K, T_wl)
    nf = flow_meas.astype(jnp.float32)
    vf = valid.astype(jnp.float32)
    s_p, s_f = p.info_proj, p.info_flow

    def lm_step(carry):
        T, f, lam, cost, it, stall = carry
        active = stall < 2  # no-op lanes after termination (scan mode)
        r_p, r_f, Y = _residuals(T, f, X_w, uv_last, nf, K)
        chi2_p = s_p * jnp.sum(r_p * r_p, axis=-1)
        w = _huber_weight(chi2_p, p.rp_thres) * vf           # (N,)
        Jpi = _proj_jacobian(Y, K)                            # (N,2,3)
        Jxi = -jnp.einsum("nij,njk->nik", Jpi, _pose_point_jacobian(Y))  # dr_p/dxi (N,2,6)

        spw = s_p * w                                         # (N,)
        a = spw + s_f * vf + lam                              # scalar A_ff per point
        gamma = spw * (1.0 - spw / a)                         # reduced proj weight
        # reduced normal equations
        H = jnp.einsum("n,nij,nik->jk", gamma, Jxi, Jxi) + lam * jnp.eye(6)
        b_f = -(spw[:, None] * r_p + (s_f * vf)[:, None] * r_f)   # (N,2)
        b_xi = -jnp.einsum("n,nij,ni->j", spw, Jxi, r_p)
        g = b_xi - jnp.einsum("n,nij,ni->j", spw / a, Jxi, b_f)
        # Jacobi-scaled solve for fp32 conditioning
        d = jnp.sqrt(jnp.clip(jnp.diag(H), 1e-12, None))
        Hs = H / d[:, None] / d[None, :]
        gs = g / d
        dxi = jnp.linalg.solve(Hs + 1e-7 * jnp.eye(6), gs) / d
        df = (b_f - spw[:, None] * jnp.einsum("nij,j->ni", Jxi, dxi)) / a[:, None]

        T_new = se3.retract(T, dxi)
        f_new = f + df
        new_cost = _cost(T_new, f_new, X_w, uv_last, nf, valid, K, p)
        accept = active & (new_cost < cost)
        # stall counter: two consecutive accepted sub-eps relative improvements
        # stop the loop (g2o SparseOptimizerTerminateAction counts gain over
        # accepted iterations; rejected steps just inflate lambda and retry)
        rel_gain = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        small = accept & (rel_gain < p.gain_eps)
        stall = jnp.where(small, stall + 1, jnp.where(accept, 0, stall))
        T = jnp.where(accept, T_new, T)
        f = jnp.where(accept, f_new, f)
        lam = jnp.where(active,
                        jnp.where(accept, lam * p.lambda_down,
                                  lam * p.lambda_up), lam)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return (T, f, lam, cost, it + 1, stall)

    def lm_cond(carry):
        _, _, _, _, it, stall = carry
        return (it < p.iters) & (stall < 2)

    cost0 = _cost(T_init, nf, X_w, uv_last, nf, valid, K, p)
    carry0 = (T_init, nf, jnp.asarray(p.lambda_init), cost0,
              jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    if p.unroll > 0:
        # fixed-length partially-unrolled scan: every iteration runs (masked
        # no-ops once stalled), but XLA fuses/specializes across the unrolled
        # body — measured faster than while_loop on TPU despite the padding
        (T, f, _, _, _, _), _ = jax.lax.scan(
            lambda c, _: (lm_step(c), None), carry0, None,
            length=p.iters, unroll=min(p.unroll, p.iters),
        )
    else:
        (T, f, _, _, _, _) = jax.lax.while_loop(lm_cond, lm_step, carry0)

    # outlier classification on unrobustified chi2 (Optimizer.cc:2484-2506)
    r_p, _, Y = _residuals(T, f, X_w, uv_last, nf, K)
    chi2 = s_p * jnp.sum(r_p * r_p, axis=-1)
    inlier = valid & (chi2 <= p.rp_thres)
    n_inlier = jnp.sum(inlier.astype(jnp.int32))
    # too few correspondences: keep the init (reference returns early)
    enough = jnp.sum(valid.astype(jnp.int32)) >= p.min_corres
    T = jnp.where(enough, T, T_init)
    repro = jnp.sum(jnp.where(inlier, jnp.sqrt(chi2), 0.0)) / jnp.maximum(n_inlier, 1)
    return {
        "T": T,
        "flow": f,
        "inlier": inlier,
        "chi2": chi2,
        "n_inlier": n_inlier,
        "repro_err": repro,
    }


@functools.partial(jax.jit, static_argnames=("p",))
def solve_camera(T_init, uv_last, depth_last, flow_meas, T_cw_last, valid, K,
                 p: FlowLMParams):
    """Camera pose solve (PoseOptimizationFlow2Cam semantics).

    Returns the refined T_cw plus flow-updated current keypoints
    (Optimizer.cc:2524-2535: cur_key = last_key + refined_flow for inliers).
    """
    out = solve(T_init, uv_last, depth_last, flow_meas, T_cw_last, valid, K, p)
    uv_cur = uv_last + out["flow"]
    out["uv_cur"] = uv_cur
    return out


@functools.partial(jax.jit, static_argnames=("p",))
def solve_objects(G_init, uv_last, depth_last, flow_meas, T_cw_last,
                  valid, K, p: FlowLMParams):
    """All-objects motion solve, vmapped over the leading K_obj axis.

    G_init: (K,4,4) initial G = T_cw * H per object slot; per-slot validity is
    carried entirely by `valid` (K,N).  The caller maps G back to the world
    motion H = T_cw^-1 G (Tracking.cc:932-933).
    """
    fn = jax.vmap(
        lambda Ti, vi: solve(Ti, uv_last, depth_last, flow_meas, T_cw_last,
                             vi, K, p)
    )
    out = fn(G_init, valid)
    out["uv_cur"] = uv_last[None] + out["flow"]
    return out
