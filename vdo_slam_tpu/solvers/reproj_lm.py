"""Classic reprojection-only pose/motion LM — the reference's non-joint path.

Equivalents of:
  * Optimizer::PoseOptimizationNew    (camera, Optimizer.cc:2177-2331) —
    unary EdgeSE3ProjectXYZOnlyPose residuals obs - pi(T X_w), Huber
    delta^2 = 0.01, chi2 gate 0.01, optional Gaussian depth noise on the
    anchor unprojation (UnprojectStereoStat(i,1), Frame.cc:489-493)
  * Optimizer::PoseOptimizationObjMot (object, Optimizer.cc:2544-2753) —
    same residual with the vertex estimating G = T_cw H through the full
    projection P = K [R|t]; no robust kernel (commented out in the
    reference, Optimizer.cc:2640-2642)

These are selected by TrackingConfig.joint_flow=False (the reference
hardcodes bJoint=true, Tracking.cc:170, but ships both code paths).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from ..geometry import se3
from .flow_lm import _huber_weight, _pose_point_jacobian, _proj_jacobian


@dataclasses.dataclass(frozen=True)
class ReprojLMParams:
    rp_thres: float = 0.01        # chi2 gate + Huber delta^2 (Optimizer.cc:2187)
    info: float = 1.0             # unit information (Optimizer.cc:2259)
    iters: int = 30
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.5
    robust: bool = True           # camera: Huber; object: no kernel (ref)
    min_corres: int = 3


def _depth_noise(key, z, scale):
    """Reference fault-injection model: sigma = z^2 * scale
    (Frame.cc:492: z^2/(725*0.5)*0.15)."""
    return z + z * z * scale * jax.random.normal(key, z.shape)


def solve_pose(T_init, uv_obs, uv_last, depth_last, T_cw_last, valid, K,
               p: ReprojLMParams, noise_key=None, noise_scale: float = 0.0):
    """Pose-only LM: minimize Huber(|uv_obs - pi(T X_w)|^2 * info).

    X_w = last-frame unprojection through inv(T_cw_last), optionally with
    the reference's synthetic depth noise.  Returns dict(T, inlier, chi2).
    """
    z = depth_last
    if noise_key is not None and noise_scale > 0:
        z = _depth_noise(noise_key, z, noise_scale)
    X_w = cam.unproject_to_world(uv_last, z, K, se3.inv(T_cw_last))
    vf = valid.astype(jnp.float32)

    def cost(T):
        r = uv_obs - cam.project(se3.apply(T, X_w), K)
        chi2 = p.info * jnp.sum(r * r, axis=-1)
        if p.robust:
            d = jnp.sqrt(p.rp_thres)
            rho = jnp.where(chi2 <= p.rp_thres, chi2,
                            2 * d * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - p.rp_thres)
        else:
            rho = chi2
        return jnp.sum(rho * vf)

    def step(carry, _):
        T, lam, c = carry
        Y = se3.apply(T, X_w)
        r = uv_obs - cam.project(Y, K)
        chi2 = p.info * jnp.sum(r * r, axis=-1)
        w = (_huber_weight(chi2, p.rp_thres) if p.robust
             else jnp.ones_like(chi2)) * p.info * vf
        J = -jnp.einsum("nij,njk->nik", _proj_jacobian(Y, K),
                        _pose_point_jacobian(Y))   # dr/dxi (N,2,6)
        H = jnp.einsum("n,nij,nik->jk", w, J, J)
        g = -jnp.einsum("n,nij,ni->j", w, J, r)
        d = jnp.sqrt(jnp.clip(jnp.diag(H), 1e-12, None))
        Hs = H / d[:, None] / d[None, :] + lam * jnp.eye(6)
        dxi = jnp.linalg.solve(Hs, g / d) / d
        T_new = se3.retract(T, dxi)
        c_new = cost(T_new)
        ok = c_new < c
        T = jnp.where(ok, T_new, T)
        lam = jnp.clip(jnp.where(ok, lam * p.lambda_down, lam * p.lambda_up),
                       1e-9, 1e6)
        c = jnp.where(ok, c_new, c)
        return (T, lam, c), None

    (T, _, _), _ = jax.lax.scan(
        step, (T_init, jnp.asarray(p.lambda_init), cost(T_init)), None,
        length=p.iters,
    )
    r = uv_obs - cam.project(se3.apply(T, X_w), K)
    chi2 = p.info * jnp.sum(r * r, axis=-1)
    inlier = valid & (chi2 <= p.rp_thres)
    enough = jnp.sum(valid.astype(jnp.int32)) >= p.min_corres
    T = jnp.where(enough, T, T_init)
    return {"T": T, "inlier": inlier, "chi2": chi2,
            "n_inlier": jnp.sum(inlier.astype(jnp.int32))}


@functools.partial(jax.jit, static_argnames=("p",))
def solve_camera(T_init, uv_obs, uv_last, depth_last, T_cw_last, valid, K,
                 p: ReprojLMParams):
    return solve_pose(T_init, uv_obs, uv_last, depth_last, T_cw_last, valid,
                      K, p)


@functools.partial(jax.jit, static_argnames=("p",))
def solve_objects(G_init, uv_obs, uv_last, depth_last, T_cw_last, valid, K,
                  p: ReprojLMParams):
    """Vmapped object-motion variant (PoseOptimizationObjMot semantics:
    vertex = G, residual through the current projection; the reference runs
    it without a robust kernel)."""
    fn = jax.vmap(
        lambda Gi, vi: solve_pose(Gi, uv_obs, uv_last, depth_last, T_cw_last,
                                  vi, K, p)
    )
    return fn(G_init, valid)
