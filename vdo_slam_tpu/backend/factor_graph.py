"""Batched factor-graph core for the windowed and full-batch optimizers.

TPU-native replacement for the vendored g2o stack (dependencies/g2o:
SparseOptimizer + BlockSolverX + LinearSolverCSparse + Levenberg).  The
graph of Optimizer::PartialBatchOptimization / FullBatchOptimization
(Optimizer.cc:42-1230 / 1232-2175) becomes padded edge arrays; one LM
iteration is a handful of fused gathers/einsums/segment-sums; the normal
equations are solved matrix-free with block-Jacobi-preconditioned CG.

Edge types (reference counterparts):
  prior   — EdgeSE3Prior                  r = log(M^-1 T)
  odo     — EdgeSE3 (camera chain)        r = log(M^-1 T_a^-1 T_b)
  smooth  — EdgeSE3 between motions       r = log(T_a^-1 T_b)     (M = I)
  obs     — EdgeSE3PointXYZ               r = T^-1 X - meas_cam
  ternary — LandmarkMotionTernaryEdge     r = X_prev - H^-1 X_cur
            (types_dyn_slam3d.cpp:53-61)
  alti    — EdgeSE3Altitude               r = t_y(H)              (optional)

Vertices: camera poses T (camera->world, like VertexSE3 estimates in the
reference), object motions H (world frame), 3D points X.  Retraction is
right-multiplicative T <- T exp(d) matching VertexSE3::oplus.

Robust kernel: Huber on information-weighted chi2 with the reference's
deltas (deltaHuber* = 1e-4, Optimizer.cc:1352) applied as IRLS weights.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.struct
import jax
import jax.numpy as jnp

from ..geometry import se3


@flax.struct.dataclass
class Graph:
    """Padded edge arrays.  *_w are information weights 1/sigma^2; invalid
    edges carry weight 0 and index 0."""

    # pose-point observations
    obs_pose: jax.Array    # (E,) int32
    obs_point: jax.Array   # (E,) int32
    obs_meas: jax.Array    # (E, 3) point in camera coords
    obs_w: jax.Array       # (E,)
    # odometry chain (pose a -> pose b)
    odo_a: jax.Array       # (Eo,)
    odo_b: jax.Array
    odo_meas_inv: jax.Array  # (Eo, 4, 4) M^-1
    odo_w: jax.Array
    # prior edges on poses
    pri_idx: jax.Array     # (Ep,)
    pri_meas_inv: jax.Array  # (Ep, 4, 4)
    pri_w: jax.Array
    # smoothness between motion vertices
    smo_a: jax.Array       # (Es,)
    smo_b: jax.Array
    smo_w: jax.Array
    # ternary motion edges
    ter_prev: jax.Array    # (Et,)
    ter_cur: jax.Array
    ter_mot: jax.Array
    ter_w: jax.Array
    # altitude priors on motions
    alt_mot: jax.Array     # (Ea,)
    alt_w: jax.Array


@flax.struct.dataclass
class Variables:
    poses: jax.Array     # (F, 4, 4) camera->world
    motions: jax.Array   # (M, 4, 4) world-frame object motions
    points: jax.Array    # (P, 3)


@dataclasses.dataclass(frozen=True)
class LMParams:
    iters: int = 30
    cg_iters: int = 100
    cg_tol: float = 1e-6          # INERT in _pcg (see note there): both
                                  # live-tol designs measured slower +
                                  # compile-hostile on TPU; tune cg_iters
    cg_unroll: int = 4            # PCG scan unroll (see _pcg): 4 = the
                                  # compile/runtime sweet spot when compiles
                                  # land on the critical path; a full unroll
                                  # (= cg_iters) runs faster still and is
                                  # FREE when the executable compiles on the
                                  # background warmup thread (full BA)
    lm_unroll: int = 4            # LM-step scan unroll (lm_solve_schur):
                                  # same tradeoff; the window-BA executable
                                  # is warmed in the background so a full
                                  # unroll only costs warmup wall time
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.5
    huber_delta: float = 1e-4     # reference deltaHuber* (Optimizer.cc:1352)
    # Huber-delta FLOOR for the SE(3) chain edges (odo, smooth).  The
    # reference applies deltaHuberCamMot=1e-4 to these too (Optimizer.cc:
    # 1352) but computes chi2 in DOUBLE, where an odometry edge whose
    # measurement is the tracked motion has chi2 ~1e-15 at init — a
    # full-weight inlier.  In fp32 the same edge sits at chi2 ~4e-8 of pure
    # rounding noise, just above delta^2=1e-8, and would be spuriously
    # robustified: its effective information collapses ~1000x and the
    # camera chain loses its stiffness (measured: refined cam RPE trails
    # initial without this).  Chain edges use max(huber_delta, this floor):
    # 1e-3 keeps the quadratic zone above the fp32 noise floor while still
    # robustifying genuinely inconsistent chain edges.
    pose_huber_delta: float = 1e-3
    robust: bool = True
    gain_eps: float = 0.0         # optional early-stop on relative decrease
    axis_name: str | None = None  # set under shard_map: edges sharded over
                                  # this mesh axis, psum the reductions (the
                                  # ICI-sharded BA of SURVEY.md §5.8)


# --------------------------------------------------------------------------
# residuals
# --------------------------------------------------------------------------

def _se3_rel_residual(Minv, Ta, Tb):
    return se3.log(Minv @ se3.inv(Ta) @ Tb)


def residuals(g: Graph, v: Variables):
    """All edge residuals at the current estimate."""
    Tp = v.poses[g.obs_pose]                    # (E,4,4)
    Xp = v.points[g.obs_point]                  # (E,3)
    r_obs = se3.apply(se3.inv(Tp), Xp) - g.obs_meas

    r_odo = _se3_rel_residual(g.odo_meas_inv, v.poses[g.odo_a], v.poses[g.odo_b])
    r_pri = se3.log(g.pri_meas_inv @ v.poses[g.pri_idx])
    r_smo = _se3_rel_residual(
        jnp.broadcast_to(jnp.eye(4), (g.smo_a.shape[0], 4, 4)),
        v.motions[g.smo_a], v.motions[g.smo_b],
    )
    H = v.motions[g.ter_mot]
    r_ter = v.points[g.ter_prev] - se3.apply(se3.inv(H), v.points[g.ter_cur])
    r_alt = v.motions[g.alt_mot][..., 1, 3:4]   # (Ea,1) t_y
    return r_obs, r_odo, r_pri, r_smo, r_ter, r_alt


def _huber_w(r, w, delta, robust):
    """IRLS weight multiplier per edge from information-weighted chi2."""
    chi2 = w * jnp.sum(r * r, axis=-1)
    if not robust:
        return jnp.ones_like(chi2)
    d2 = delta * delta
    return jnp.where(chi2 <= d2, 1.0, delta / jnp.sqrt(jnp.maximum(chi2, 1e-24)))


def _maybe_psum(x, p):
    if p.axis_name is None:
        return x
    return jax.lax.psum(x, axis_name=p.axis_name)


EDGE_TYPES = ("obs", "odo", "pri", "smo", "ter", "alt")


def _edge_delta(name: str, p: LMParams) -> float:
    """Huber delta per edge type: SE(3) chain edges get the fp32-adjusted
    pose-delta floor (see LMParams.pose_huber_delta)."""
    if name in ("odo", "smo"):
        return max(p.huber_delta, p.pose_huber_delta)
    return p.huber_delta


def edge_type_stats(g: Graph, v: Variables, p: LMParams):
    """Per-edge-type chi2 totals and inlier counts — the solver-health
    instrumentation the reference prints around each batch solve (chi2
    histograms per edge type, Optimizer.cc:640-970 for the window and
    1938-2091 for the full graph; inlier ratios at Optimizer.cc:2326 etc.).

    Returns {type: {"n": active edges, "chi2": sum of information-weighted
    chi2, "n_inlier": edges with chi2 <= huber_delta^2}} as a flat pytree of
    scalars (jit-friendly; padding edges carry w=0 and are excluded).
    """
    rs = residuals(g, v)
    ws = (g.obs_w, g.odo_w, g.pri_w, g.smo_w, g.ter_w, g.alt_w)
    out = {}
    for name, r, w in zip(EDGE_TYPES, rs, ws):
        d = _edge_delta(name, p)
        chi2 = w * jnp.sum(r * r, axis=-1)
        active = w > 0
        out[name] = {
            "n": _maybe_psum(jnp.sum(active.astype(jnp.int32)), p),
            "chi2": _maybe_psum(jnp.sum(jnp.where(active, chi2, 0.0)), p),
            "n_inlier": _maybe_psum(
                jnp.sum((active & (chi2 <= d * d)).astype(jnp.int32)), p),
        }
    return out


def format_edge_stats(stats0, stats1) -> str:
    """Human-readable before/after chi2 table for solver logs."""
    lines = []
    for name in EDGE_TYPES:
        s0, s1 = stats0[name], stats1[name]
        n = int(s0["n"])
        if n == 0:
            continue
        lines.append(
            f"  {name:>4s}: n={n:<7d} chi2 {float(s0['chi2']):.4e} -> "
            f"{float(s1['chi2']):.4e}  inliers {int(s0['n_inlier'])} -> "
            f"{int(s1['n_inlier'])}"
        )
    return "\n".join(lines)


def robust_cost(g: Graph, v: Variables, p: LMParams):
    """Total Huber-robustified cost (the LM acceptance criterion)."""
    rs = residuals(g, v)
    ws = (g.obs_w, g.odo_w, g.pri_w, g.smo_w, g.ter_w, g.alt_w)
    total = 0.0
    for name, r, w in zip(EDGE_TYPES, rs, ws):
        chi2 = w * jnp.sum(r * r, axis=-1)
        d = _edge_delta(name, p)
        if p.robust:
            rho = jnp.where(
                chi2 <= d * d, chi2,
                2.0 * d * jnp.sqrt(jnp.maximum(chi2, 1e-24)) - d * d,
            )
        else:
            rho = chi2
        total = total + jnp.sum(rho)
    return _maybe_psum(total, p)


# --------------------------------------------------------------------------
# analytic edge Jacobian blocks (right-multiplicative retraction)
# --------------------------------------------------------------------------

def _obs_blocks(g: Graph, v: Variables):
    """J wrt pose tangent (3,6) and point (3,3 = R^T) for obs edges."""
    Tp = v.poses[g.obs_pose]
    R = Tp[..., :3, :3]
    Y = se3.apply(se3.inv(Tp), v.points[g.obs_point])  # camera-frame point
    Jw = se3.hat(Y)                                    # dr/domega = [Y]_x
    Jv = -jnp.broadcast_to(jnp.eye(3), Jw.shape)       # dr/dupsilon = -I
    J_pose = jnp.concatenate([Jw, Jv], axis=-1)        # (E,3,6)
    J_pt = jnp.swapaxes(R, -1, -2)                     # (E,3,3)
    return J_pose, J_pt


def _ter_blocks(g: Graph, v: Variables):
    H = v.motions[g.ter_mot]
    RH = H[..., :3, :3]
    Z = se3.apply(se3.inv(H), v.points[g.ter_cur])
    J_mot = jnp.concatenate(
        [-se3.hat(Z), jnp.broadcast_to(jnp.eye(3), (Z.shape[0], 3, 3))], axis=-1
    )                                                  # (Et,3,6)
    J_prev = jnp.broadcast_to(jnp.eye(3), (Z.shape[0], 3, 3))
    J_cur = -jnp.swapaxes(RH, -1, -2)
    return J_prev, J_cur, J_mot


def _rel_blocks(Minv, Ta, Tb):
    """Exact J of log(M^-1 (Ta e^da)^-1 (Tb e^db)) wrt (da, db) via jacfwd."""
    def r_fn(da, db, Mi, A, B):
        return se3.log(Mi @ se3.inv(A @ se3.exp(da)) @ (B @ se3.exp(db)))

    z = jnp.zeros((Ta.shape[0], 6))
    Ja = jax.vmap(jax.jacfwd(r_fn, argnums=0))(z, z, Minv, Ta, Tb)
    Jb = jax.vmap(jax.jacfwd(r_fn, argnums=1))(z, z, Minv, Ta, Tb)
    return Ja, Jb


def _pri_blocks(Minv, T):
    def r_fn(d, Mi, A):
        return se3.log(Mi @ (A @ se3.exp(d)))

    z = jnp.zeros((T.shape[0], 6))
    return jax.vmap(jax.jacfwd(r_fn, argnums=0))(z, Minv, T)


def _alt_blocks(g: Graph, v: Variables):
    """d t_y(H e^d)/dd via jacfwd (exact; altitude edges are rare)."""
    def r_fn(d, H):
        return (H @ se3.exp(d))[1, 3:4]

    z = jnp.zeros((g.alt_mot.shape[0], 6))
    return jax.vmap(jax.jacfwd(r_fn, argnums=0))(z, v.motions[g.alt_mot])


# --------------------------------------------------------------------------
# matrix-free normal equations
# --------------------------------------------------------------------------

@flax.struct.dataclass
class Tangent:
    poses: jax.Array    # (F, 6)
    motions: jax.Array  # (M, 6)
    points: jax.Array   # (P, 3)

    def dot(self, other):
        return (jnp.vdot(self.poses, other.poses)
                + jnp.vdot(self.motions, other.motions)
                + jnp.vdot(self.points, other.points))

    def __add__(self, o):
        return Tangent(self.poses + o.poses, self.motions + o.motions,
                       self.points + o.points)

    def __sub__(self, o):
        return Tangent(self.poses - o.poses, self.motions - o.motions,
                       self.points - o.points)

    def scale(self, a):
        return Tangent(self.poses * a, self.motions * a, self.points * a)

    @staticmethod
    def zeros_like(v: Variables):
        return Tangent(
            jnp.zeros((v.poses.shape[0], 6)),
            jnp.zeros((v.motions.shape[0], 6)),
            jnp.zeros((v.points.shape[0], 3)),
        )


def _linearize(g: Graph, v: Variables, p: LMParams):
    """Residuals, IRLS-weighted edge weights, and Jacobian blocks."""
    r_obs, r_odo, r_pri, r_smo, r_ter, r_alt = residuals(g, v)
    d = p.huber_delta
    dp = _edge_delta("odo", p)
    w_obs = g.obs_w * _huber_w(r_obs, g.obs_w, d, p.robust)
    w_odo = g.odo_w * _huber_w(r_odo, g.odo_w, dp, p.robust)
    w_pri = g.pri_w  # prior is not robustified (information 1e5/1e7)
    w_smo = g.smo_w * _huber_w(r_smo, g.smo_w, dp, p.robust)
    w_ter = g.ter_w * _huber_w(r_ter, g.ter_w, d, p.robust)
    w_alt = g.alt_w

    Jo_pose, Jo_pt = _obs_blocks(g, v)
    Jt_prev, Jt_cur, Jt_mot = _ter_blocks(g, v)
    Jd_a, Jd_b = _rel_blocks(g.odo_meas_inv, v.poses[g.odo_a], v.poses[g.odo_b])
    eye_m = jnp.broadcast_to(jnp.eye(4), (g.smo_a.shape[0], 4, 4))
    Js_a, Js_b = _rel_blocks(eye_m, v.motions[g.smo_a], v.motions[g.smo_b])
    Jp = _pri_blocks(g.pri_meas_inv, v.poses[g.pri_idx])
    Ja = _alt_blocks(g, v)

    blocks = dict(
        Jo_pose=Jo_pose, Jo_pt=Jo_pt, Jt_prev=Jt_prev, Jt_cur=Jt_cur,
        Jt_mot=Jt_mot, Jd_a=Jd_a, Jd_b=Jd_b, Js_a=Js_a, Js_b=Js_b, Jp=Jp,
        Ja=Ja,
    )
    resid = dict(obs=r_obs, odo=r_odo, pri=r_pri, smo=r_smo, ter=r_ter,
                 alt=r_alt)
    weights = dict(obs=w_obs, odo=w_odo, pri=w_pri, smo=w_smo, ter=w_ter,
                   alt=w_alt)
    return resid, weights, blocks


def _seg(x, idx, n, sorted_idx=False):
    return jax.ops.segment_sum(x, idx, num_segments=n,
                               indices_are_sorted=sorted_idx)


def _matvec(g: Graph, blocks, weights, t: Tangent, p: LMParams) -> Tangent:
    """H t = J^T W J t, edge-wise."""
    F = t.poses.shape[0]
    M = t.motions.shape[0]
    P = t.points.shape[0]
    out_p = jnp.zeros((F, 6))
    out_m = jnp.zeros((M, 6))
    out_x = jnp.zeros((P, 3))

    # obs edges
    u = (jnp.einsum("eij,ej->ei", blocks["Jo_pose"], t.poses[g.obs_pose])
         + jnp.einsum("eij,ej->ei", blocks["Jo_pt"], t.points[g.obs_point]))
    u = u * weights["obs"][:, None]
    out_p += _seg(jnp.einsum("eij,ei->ej", blocks["Jo_pose"], u), g.obs_pose, F)
    out_x += _seg(jnp.einsum("eij,ei->ej", blocks["Jo_pt"], u), g.obs_point, P,
                  sorted_idx=True)

    # ternary edges
    u = (jnp.einsum("eij,ej->ei", blocks["Jt_prev"], t.points[g.ter_prev])
         + jnp.einsum("eij,ej->ei", blocks["Jt_cur"], t.points[g.ter_cur])
         + jnp.einsum("eij,ej->ei", blocks["Jt_mot"], t.motions[g.ter_mot]))
    u = u * weights["ter"][:, None]
    out_x += _seg(jnp.einsum("eij,ei->ej", blocks["Jt_prev"], u), g.ter_prev,
                  P, sorted_idx=True)
    out_x += _seg(jnp.einsum("eij,ei->ej", blocks["Jt_cur"], u), g.ter_cur, P,
                  sorted_idx=True)
    out_m += _seg(jnp.einsum("eij,ei->ej", blocks["Jt_mot"], u), g.ter_mot, M)

    # odometry
    u = (jnp.einsum("eij,ej->ei", blocks["Jd_a"], t.poses[g.odo_a])
         + jnp.einsum("eij,ej->ei", blocks["Jd_b"], t.poses[g.odo_b]))
    u = u * weights["odo"][:, None]
    out_p += _seg(jnp.einsum("eij,ei->ej", blocks["Jd_a"], u), g.odo_a, F)
    out_p += _seg(jnp.einsum("eij,ei->ej", blocks["Jd_b"], u), g.odo_b, F)

    # smoothness
    u = (jnp.einsum("eij,ej->ei", blocks["Js_a"], t.motions[g.smo_a])
         + jnp.einsum("eij,ej->ei", blocks["Js_b"], t.motions[g.smo_b]))
    u = u * weights["smo"][:, None]
    out_m += _seg(jnp.einsum("eij,ei->ej", blocks["Js_a"], u), g.smo_a, M)
    out_m += _seg(jnp.einsum("eij,ei->ej", blocks["Js_b"], u), g.smo_b, M)

    # prior
    u = jnp.einsum("eij,ej->ei", blocks["Jp"], t.poses[g.pri_idx])
    u = u * weights["pri"][:, None]
    out_p += _seg(jnp.einsum("eij,ei->ej", blocks["Jp"], u), g.pri_idx, F)

    # altitude
    u = jnp.einsum("eij,ej->ei", blocks["Ja"], t.motions[g.alt_mot])
    u = u * weights["alt"][:, None]
    out_m += _seg(jnp.einsum("eij,ei->ej", blocks["Ja"], u), g.alt_mot, M)

    return _maybe_psum(Tangent(out_p, out_m, out_x), p)


def _gradient(g: Graph, blocks, weights, resid, F, M, P, p: LMParams) -> Tangent:
    """g = J^T W r."""
    gp = jnp.zeros((F, 6))
    gm = jnp.zeros((M, 6))
    gx = jnp.zeros((P, 3))
    u = resid["obs"] * weights["obs"][:, None]
    gp += _seg(jnp.einsum("eij,ei->ej", blocks["Jo_pose"], u), g.obs_pose, F)
    gx += _seg(jnp.einsum("eij,ei->ej", blocks["Jo_pt"], u), g.obs_point, P,
               sorted_idx=True)
    u = resid["ter"] * weights["ter"][:, None]
    gx += _seg(jnp.einsum("eij,ei->ej", blocks["Jt_prev"], u), g.ter_prev, P,
               sorted_idx=True)
    gx += _seg(jnp.einsum("eij,ei->ej", blocks["Jt_cur"], u), g.ter_cur, P,
               sorted_idx=True)
    gm += _seg(jnp.einsum("eij,ei->ej", blocks["Jt_mot"], u), g.ter_mot, M)
    u = resid["odo"] * weights["odo"][:, None]
    gp += _seg(jnp.einsum("eij,ei->ej", blocks["Jd_a"], u), g.odo_a, F)
    gp += _seg(jnp.einsum("eij,ei->ej", blocks["Jd_b"], u), g.odo_b, F)
    u = resid["smo"] * weights["smo"][:, None]
    gm += _seg(jnp.einsum("eij,ei->ej", blocks["Js_a"], u), g.smo_a, M)
    gm += _seg(jnp.einsum("eij,ei->ej", blocks["Js_b"], u), g.smo_b, M)
    u = resid["pri"] * weights["pri"][:, None]
    gp += _seg(jnp.einsum("eij,ei->ej", blocks["Jp"], u), g.pri_idx, F)
    u = resid["alt"] * weights["alt"][:, None]
    gm += _seg(jnp.einsum("eij,ei->ej", blocks["Ja"], u), g.alt_mot, M)
    return _maybe_psum(Tangent(gp, gm, gx), p)


def _block_diag(g: Graph, blocks, weights, F, M, P, p: LMParams):
    """Undamped block-Jacobi blocks of J^T W J."""
    def outer(J, w):
        return jnp.einsum("eij,eik,e->ejk", J, J, w)

    Dp = jnp.zeros((F, 6, 6))
    Dm = jnp.zeros((M, 6, 6))
    Dx = jnp.zeros((P, 3, 3))
    Dp += _seg(outer(blocks["Jo_pose"], weights["obs"]), g.obs_pose, F)
    Dx += _seg(outer(blocks["Jo_pt"], weights["obs"]), g.obs_point, P,
               sorted_idx=True)
    Dx += _seg(outer(blocks["Jt_prev"], weights["ter"]), g.ter_prev, P,
               sorted_idx=True)
    Dx += _seg(outer(blocks["Jt_cur"], weights["ter"]), g.ter_cur, P,
               sorted_idx=True)
    Dm += _seg(outer(blocks["Jt_mot"], weights["ter"]), g.ter_mot, M)
    Dp += _seg(outer(blocks["Jd_a"], weights["odo"]), g.odo_a, F)
    Dp += _seg(outer(blocks["Jd_b"], weights["odo"]), g.odo_b, F)
    Dm += _seg(outer(blocks["Js_a"], weights["smo"]), g.smo_a, M)
    Dm += _seg(outer(blocks["Js_b"], weights["smo"]), g.smo_b, M)
    Dp += _seg(outer(blocks["Jp"], weights["pri"]), g.pri_idx, F)
    Dm += _seg(outer(blocks["Ja"], weights["alt"]), g.alt_mot, M)
    if p.axis_name is not None:
        Dp, Dm, Dx = jax.lax.psum((Dp, Dm, Dx), axis_name=p.axis_name)
    return Dp, Dm, Dx


def _damped_diag(D, lam, floor=1e-8):
    """Marquardt damping terms per variable: lam * diag(H) (+ floor)."""
    Dp, Dm, Dx = D
    dp = lam * jnp.diagonal(Dp, axis1=-2, axis2=-1) + floor
    dm = lam * jnp.diagonal(Dm, axis1=-2, axis2=-1) + floor
    dx = lam * jnp.diagonal(Dx, axis1=-2, axis2=-1) + floor
    return Tangent(dp, dm, dx)


def _invert_precond(D):
    """Invert the damped block-Jacobi blocks ONCE (outside the CG loop) so
    each CG iteration applies the preconditioner as a batched einsum instead
    of re-factorizing P small LU systems (the blocks are SPD + damped)."""
    Dp, Dm, Dx = D
    return (jnp.linalg.inv(Dp), jnp.linalg.inv(Dm), jnp.linalg.inv(Dx))


def _apply_precond(Dinv, t: Tangent) -> Tangent:
    Dp, Dm, Dx = Dinv
    return Tangent(
        jnp.einsum("nij,nj->ni", Dp, t.poses),
        jnp.einsum("nij,nj->ni", Dm, t.motions),
        jnp.einsum("nij,nj->ni", Dx, t.points),
    )


def _pcg(matvec, precond, b: Tangent, iters: int, tol: float,
         unroll: int = 4) -> Tangent:
    # NOTE: partially UNROLLED scan — XLA:TPU runs the unrolled
    # gather/scatter chain far faster than a length-1 scan body (layout
    # assignment specializes across iterations; measured 25ms vs 111ms per
    # CG iteration on the 114k-point full graph).  Full unrolling is faster
    # still but compiles for ~80s, and this backend's persistent compile
    # cache never hits across processes — unroll=4 is the measured sweet
    # spot of compile + runtime.
    #
    # `tol` is deliberately INERT here: CG always runs the fixed iteration
    # budget.  Both live-tol variants were built and measured on the 114k-
    # point full graph (round 2): a per-iteration mask costs +28% runtime
    # and a ~100s cold compile; terminating a while_loop at unroll-chunk
    # granularity costs +55% runtime and a ~480s cold compile.  Iteration
    # budget is the tuning knob on this hardware (LMParams.cg_iters).
    x = Tangent(jnp.zeros_like(b.poses), jnp.zeros_like(b.motions),
                jnp.zeros_like(b.points))
    r = b
    z = precond(r)
    d = z
    rz = r.dot(z)

    def body(carry, _):
        x, r, d, rz = carry
        Ad = matvec(d)
        dAd = d.dot(Ad)
        ok = dAd > 1e-30
        alpha = jnp.where(ok, rz / jnp.maximum(dAd, 1e-30), 0.0)
        x = x + d.scale(alpha)
        r = r - Ad.scale(alpha)
        z = precond(r)
        rz_new = r.dot(z)
        beta = jnp.where(ok & (rz > 1e-30), rz_new / jnp.maximum(rz, 1e-30),
                         0.0)
        d = z + d.scale(beta)
        return (x, r, d, rz_new), None

    n_loop = max(iters // unroll, 1) if iters >= unroll else 1
    eff_unroll = min(unroll, iters)
    (x, r, d, rz), _ = jax.lax.scan(body, (x, r, d, rz), None,
                                    length=n_loop * eff_unroll,
                                    unroll=eff_unroll)
    for _ in range(iters - n_loop * eff_unroll):
        (x, r, d, rz), _ = body((x, r, d, rz), None)
    return x


def _retract_vars(v: Variables, t: Tangent) -> Variables:
    return Variables(
        poses=v.poses @ se3.exp(t.poses),
        motions=v.motions @ se3.exp(t.motions),
        points=v.points + t.points,
    )


@functools.partial(jax.jit, static_argnames=("p",))
def lm_solve(g: Graph, v0: Variables, p: LMParams, lam0=None):
    """Damped Gauss-Newton (LM) with PCG inner solves.

    Mirrors g2o OptimizationAlgorithmLevenberg + SparseOptimizerTerminate-
    Action's gain-threshold early stop (Optimizer.cc:140-142).
    Returns (Variables, info dict incl. the final damping `lam` so callers
    can chunk long optimizations across multiple device calls).
    """
    F = v0.poses.shape[0]
    M = v0.motions.shape[0]
    P = v0.points.shape[0]

    def step(carry, _):
        v, lam, cost = carry
        resid, weights, blocks = _linearize(g, v, p)
        grad = _gradient(g, blocks, weights, resid, F, M, P, p)
        D = _block_diag(g, blocks, weights, F, M, P, p)
        damp = _damped_diag(D, lam)
        Dp, Dm, Dx = D
        D_prec = _invert_precond((
            Dp + jax.vmap(jnp.diag)(damp.poses),
            Dm + jax.vmap(jnp.diag)(damp.motions),
            Dx + jax.vmap(jnp.diag)(damp.points),
        ))

        def mv(t):
            ht = _matvec(g, blocks, weights, t, p)
            return Tangent(
                ht.poses + damp.poses * t.poses,
                ht.motions + damp.motions * t.motions,
                ht.points + damp.points * t.points,
            )

        delta = _pcg(mv, lambda t: _apply_precond(D_prec, t),
                     grad.scale(-1.0), p.cg_iters, p.cg_tol,
                     unroll=p.cg_unroll)
        v_new = _retract_vars(v, delta)
        new_cost = robust_cost(g, v_new, p)
        accept = new_cost < cost
        v = jax.tree.map(lambda a, b: jnp.where(accept, a, b), v_new, v)
        lam = jnp.where(accept, lam * p.lambda_down, lam * p.lambda_up)
        lam = jnp.clip(lam, 1e-10, 1e8)
        cost = jnp.where(accept, new_cost, cost)
        return (v, lam, cost), cost

    cost0 = robust_cost(g, v0, p)
    lam_init = jnp.asarray(p.lambda_init) if lam0 is None else lam0
    (v, lam, cost), history = jax.lax.scan(
        step, (v0, lam_init, cost0), None, length=p.iters
    )
    return v, {"cost0": cost0, "cost": cost, "history": history, "lam": lam,
               "stats0": edge_type_stats(g, v0, p),
               "stats": edge_type_stats(g, v, p)}


def lm_solve_chunked(g: Graph, v0: Variables, p: LMParams,
                     chunk: int = 3, callback=None):
    """Run p.iters LM iterations as ceil(iters/chunk) separate device
    executions (remote-attached workers can enforce per-program time limits;
    a 100k-point full-batch graph exceeds them in one program).  Damping
    carries across chunks; results match lm_solve up to the per-chunk cost
    re-evaluation."""
    import math

    v = v0
    # concrete lam0 from the start: lam0=None vs lam0=<array> trace to two
    # DIFFERENT executables — passing an array for chunk 0 halves compiles
    lam = jnp.asarray(p.lambda_init, jnp.float32)
    info = {}
    total = 0
    cost0 = None
    stats0 = None
    for i in range(math.ceil(p.iters / chunk)):
        # honor p.iters exactly: the tail chunk runs the remainder (a
        # non-multiple budget compiles a second, shorter program for it)
        n_it = min(chunk, p.iters - total)
        v, info = lm_solve(g, v, dataclasses.replace(p, iters=n_it),
                           lam0=lam)
        lam = info["lam"]
        total += n_it
        if cost0 is None:
            cost0 = float(info["cost0"])
            stats0 = info["stats0"]
        if callback is not None:
            callback(i, info)
        # cross-chunk gain threshold (g2o terminate-action semantics)
        if p.gain_eps > 0:
            gain = (float(info["cost0"]) - float(info["cost"])) / max(
                float(info["cost0"]), 1e-20
            )
            if gain < p.gain_eps:
                break
    info = dict(info)
    info["cost0"] = cost0
    info["stats0"] = stats0
    info["iters_run"] = total
    return v, info


# --------------------------------------------------------------------------
# dense-Schur direct LM for point-block-diagonal graphs (windowed BA)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("p",))
def lm_solve_schur(g: Graph, v0: Variables, p: LMParams):
    """LM with an EXACT reduced solve for graphs whose points appear only in
    pose-point obs edges (no ternary coupling) — the windowed static BA.

    Point blocks are eliminated analytically (3x3 inverses), the reduced
    pose system (6F x 6F, F <= window) is assembled densely and solved by
    one equilibrated Cholesky per LM iteration — the TPU analogue of
    g2o BlockSolver + sparse Cholesky (Optimizer.cc:172-183), trading the
    CSparse fill-reducing permutation for one small MXU-friendly dense
    factorization.
    """
    F = v0.poses.shape[0]
    P = v0.points.shape[0]
    n = 6 * F

    def step(carry, _):
        v, lam, cost = carry
        resid, weights, blocks = _linearize(g, v, p)
        Jo_pose, Jo_pt = blocks["Jo_pose"], blocks["Jo_pt"]
        w = weights["obs"]
        r = resid["obs"]

        # point blocks + rhs
        Hpp = _seg(jnp.einsum("eij,eik,e->ejk", Jo_pt, Jo_pt, w),
                   g.obs_point, P)
        dpp = lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8
        Hpp = Hpp + jax.vmap(jnp.diag)(dpp)
        bp = -_seg(jnp.einsum("eij,ei,e->ej", Jo_pt, r, w), g.obs_point, P)
        Hpp_inv = jnp.linalg.inv(Hpp)

        # dense cross blocks U[(pose, point)] = Jp^T w Jx  (6,3)
        flat_idx = g.obs_pose * P + g.obs_point
        U = _seg(jnp.einsum("eij,eik,e->ejk", Jo_pose, Jo_pt, w),
                 flat_idx, F * P).reshape(F, P, 6, 3)

        # reduced pose system
        Hcc = jnp.zeros((F, 6, F, 6))
        diag_pose = _seg(jnp.einsum("eij,eik,e->ejk", Jo_pose, Jo_pose, w),
                         g.obs_pose, F)
        Hcc = Hcc + jnp.einsum(
            "fij,fg->figj", diag_pose, jnp.eye(F)
        )
        bc = -_seg(jnp.einsum("eij,ei->ej", Jo_pose, r * w[:, None]),
                   g.obs_pose, F)

        # odometry + prior blocks (small counts; scatter into dense Hcc)
        Jd_a, Jd_b = blocks["Jd_a"], blocks["Jd_b"]
        wo = weights["odo"]
        ro = resid["odo"]
        a_idx, b_idx = g.odo_a, g.odo_b

        def acc(Hcc, bc, Ji, Jj, ii, jj, we, re):
            Hij = jnp.einsum("eij,eik,e->ejk", Ji, Jj, we)
            Hcc = Hcc.at[ii, :, jj, :].add(Hij)
            bi = -jnp.einsum("eij,ei,e->ej", Ji, re, we)
            bc2 = jax.ops.segment_sum(bi, ii, num_segments=F)
            return Hcc, bc + bc2

        # note: .at[ii,:,jj,:].add with index arrays performs scatter-add
        Hcc, bc = acc(Hcc, bc, Jd_a, Jd_a, a_idx, a_idx, wo, ro)
        Hcc, bc = acc(Hcc, bc, Jd_b, Jd_b, b_idx, b_idx, wo, ro)
        Hcc, _ = acc(Hcc, jnp.zeros_like(bc), Jd_a, Jd_b, a_idx, b_idx, wo,
                     jnp.zeros_like(ro))
        Hcc, _ = acc(Hcc, jnp.zeros_like(bc), Jd_b, Jd_a, b_idx, a_idx, wo,
                     jnp.zeros_like(ro))
        Jp = blocks["Jp"]
        Hcc, bc = acc(Hcc, bc, Jp, Jp, g.pri_idx, g.pri_idx, weights["pri"],
                      resid["pri"])

        # Marquardt damping on poses
        Hd = Hcc.reshape(n, n)
        damp = lam * jnp.diag(Hd) + 1e-8
        Hd = Hd + jnp.diag(damp)

        # Schur: S = Hcc - U Hpp^-1 U^T ; rhs = bc - U Hpp^-1 bp
        UHi = jnp.einsum("fpij,pjk->fpik", U, Hpp_inv)       # (F,P,6,3)
        # output layout MUST be (F,6,G,6) to match Hcc's (F,6,F,6)->(n,n)
        # reshape; "filg" would transpose the last two axes and subtract
        # U Hpp^-1 U^T with permuted columns for any F>1 window.
        S = Hd - jnp.einsum("fpik,gplk->figl", UHi, U).reshape(n, n)
        rhs = bc.reshape(n) - jnp.einsum("fpik,pk->fi", UHi, bp).reshape(n)

        # equilibrated solve
        d = jnp.sqrt(jnp.clip(jnp.diag(S), 1e-12, None))
        Ss = S / d[:, None] / d[None, :]
        dc = jnp.linalg.solve(Ss + 1e-7 * jnp.eye(n), rhs / d) / d
        dc_t = dc.reshape(F, 6)
        # back-substitute points
        dp = jnp.einsum("pij,pj->pi", Hpp_inv,
                        bp - jnp.einsum("fpij,fi->pj", U, dc_t))

        delta = Tangent(dc_t, jnp.zeros((v.motions.shape[0], 6)), dp)
        v_new = _retract_vars(v, delta)
        new_cost = robust_cost(g, v_new, p)
        accept = new_cost < cost
        v = jax.tree.map(lambda a, b: jnp.where(accept, a, b), v_new, v)
        lam = jnp.where(accept, lam * p.lambda_down, lam * p.lambda_up)
        lam = jnp.clip(lam, 1e-10, 1e8)
        cost = jnp.where(accept, new_cost, cost)
        return (v, lam, cost), cost

    cost0 = robust_cost(g, v0, p)
    # UNROLLED scan: the step body is gather/scatter/segment-sum heavy, and
    # XLA:TPU cannot layout-specialize across scan iterations (the round-1
    # _pcg finding, CLAUDE.md) — unroll=4 measured 3.8x faster on the
    # window graph (12-iter solve 704 -> 187 ms warm, round 3)
    (v, _, cost), history = jax.lax.scan(
        step, (v0, jnp.asarray(p.lambda_init), cost0), None, length=p.iters,
        unroll=min(p.iters, p.lm_unroll),
    )
    return v, {"cost0": cost0, "cost": cost, "history": history,
               "stats0": edge_type_stats(g, v0, p),
               "stats": edge_type_stats(g, v, p)}


# --------------------------------------------------------------------------
# mesh-sharded solve: edges sharded over chips, reductions ride ICI psum
# --------------------------------------------------------------------------

def _pad_edges_for_mesh(g: Graph, n_dev: int) -> Graph:
    """Pad every edge array to a multiple of n_dev (zero weights ⇒ the pad
    edges contribute nothing; 4x4 measurement pads are identity so the SE(3)
    log stays finite)."""
    def pad_to(x, n):
        padded = jnp.zeros((n,) + x.shape[1:], x.dtype)
        if x.dtype == jnp.float32 and x.ndim == 3:  # 4x4 measurement pads
            padded = jnp.broadcast_to(jnp.eye(4, dtype=x.dtype),
                                      (n,) + x.shape[1:]).copy()
        return jax.lax.dynamic_update_slice(
            padded, x, (0,) * x.ndim
        )

    return jax.tree.map(
        lambda x: pad_to(x, -(-x.shape[0] // n_dev) * n_dev), g
    )


def _sharded_lm_fn(p: LMParams, mesh, axis: str):
    """shard_map-wrapped lm_solve: edges sharded over `axis`, variables
    replicated, JᵀWJ/gradient/preconditioner reductions psum'd."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    p_sh = dataclasses.replace(p, axis_name=axis)
    edge_spec = Graph(
        obs_pose=P(axis), obs_point=P(axis), obs_meas=P(axis), obs_w=P(axis),
        odo_a=P(axis), odo_b=P(axis), odo_meas_inv=P(axis), odo_w=P(axis),
        pri_idx=P(axis), pri_meas_inv=P(axis), pri_w=P(axis),
        smo_a=P(axis), smo_b=P(axis), smo_w=P(axis),
        ter_prev=P(axis), ter_cur=P(axis), ter_mot=P(axis), ter_w=P(axis),
        alt_mot=P(axis), alt_w=P(axis),
    )
    var_spec = Variables(poses=P(), motions=P(), points=P())
    stat_spec = {n: {"n": P(), "chi2": P(), "n_inlier": P()}
                 for n in EDGE_TYPES}
    out_spec = (var_spec, {"cost0": P(), "cost": P(), "history": P(),
                           "lam": P(), "stats0": stat_spec,
                           "stats": stat_spec})

    def solve(g, v, lam):
        return lm_solve(g, v, p_sh, lam0=lam)

    kw = dict(mesh=mesh, in_specs=(edge_spec, var_spec, P()),
              out_specs=out_spec)
    try:
        # jax >= 0.8: replication checking is `check_vma`
        return shard_map(solve, check_vma=False, **kw)
    except TypeError:
        return shard_map(solve, check_rep=False, **kw)


def lm_solve_sharded(g: Graph, v0: Variables, p: LMParams, mesh,
                     axis: str = "ba", lam0=None):
    """Run lm_solve with edge arrays sharded over a mesh axis.

    Variables are replicated; every JᵀWJ product / gradient / preconditioner
    block is computed from the local edge shard and psum'd (the ICI-sharded
    BA reduction of SURVEY.md §5.8).  Results are identical to the
    single-device solve up to summation order.
    """
    g = _pad_edges_for_mesh(g, mesh.shape[axis])
    lam = jnp.asarray(p.lambda_init if lam0 is None else lam0, jnp.float32)
    return _sharded_lm_fn(p, mesh, axis)(g, v0, lam)


def lm_solve_sharded_chunked(g: Graph, v0: Variables, p: LMParams, mesh,
                             axis: str = "ba", chunk: int = 3,
                             callback=None):
    """lm_solve_chunked over the mesh-sharded solve: p.iters LM iterations
    as ceil(iters/chunk) device executions with damping carried across
    chunks (the remote worker kills single programs over ~60-90 s; the
    sharded full-batch graph needs the same chunking as the single-device
    path).  Edges are padded/sharded ONCE, not per chunk."""
    import math

    g = _pad_edges_for_mesh(g, mesh.shape[axis])
    fns: dict[int, object] = {}
    v = v0
    lam = jnp.asarray(p.lambda_init, jnp.float32)
    info = {}
    total = 0
    cost0 = None
    stats0 = None
    for i in range(math.ceil(p.iters / chunk)):
        # honor p.iters exactly (tail chunk runs the remainder)
        n_it = min(chunk, p.iters - total)
        if n_it not in fns:
            fns[n_it] = _sharded_lm_fn(
                dataclasses.replace(p, iters=n_it), mesh, axis)
        v, info = fns[n_it](g, v, lam)
        lam = info["lam"]
        total += n_it
        if cost0 is None:
            cost0 = float(info["cost0"])
            stats0 = info["stats0"]
        if callback is not None:
            callback(i, info)
        if p.gain_eps > 0:
            gain = (float(info["cost0"]) - float(info["cost"])) / max(
                float(info["cost0"]), 1e-20
            )
            if gain < p.gain_eps:
                break
    info = dict(info)
    info["cost0"] = cost0
    info["stats0"] = stats0
    info["iters_run"] = total
    return v, info
