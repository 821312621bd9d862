"""Pallas TPU kernel for the FAST-9/16 corner score.

The jnp implementation in ops/fast.py materializes 16 full-image shifted
views per threshold (HBM-bandwidth bound).  This kernel tiles the image into
row bands, DMAs each band (with halo rows) from HBM into VMEM once, and
evaluates the whole segment test + score on the VPU — one HBM read and one
HBM write per pixel, and both detection thresholds (ini/min,
ORBextractor.cc:789-822) in a single fused pass.

Row bands overlap by the 3px circle radius, which BlockSpec index maps can't
express, so the input stays in ANY/HBM and each program issues its own halo'd
async copy (the double-buffer-style manual-DMA pattern).

The caller zero-pads rows and lanes; borders are zeroed afterwards exactly
like the jnp path, so results match fast.fast_score on the interior.

`fast_score_pair_pallas` is vmappable: a custom_vmap rule routes batched
calls to a (batch, band) grid variant of the same kernel, so the multi-stream
SPMD path (parallel/multistream.py) keeps the fast detector instead of
falling back to the 16-shifted-views jnp implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import _ARC, _CIRCLE

_HALO = 4  # >= circle radius 3, kept even for sublane alignment


def _fast_kernel(img_hbm, out_ini_ref, out_min_ref, scratch, sem, *,
                 tile_h, th_ini, th_min, batched):
    rows = tile_h + 2 * _HALO
    if batched:
        b = pl.program_id(0)
        i = pl.program_id(1)
        src = img_hbm.at[b, pl.ds(i * tile_h, rows), :]
    else:
        i = pl.program_id(0)
        src = img_hbm.at[pl.ds(i * tile_h, rows), :]
    copy = pltpu.make_async_copy(src, scratch, sem)
    copy.start()
    copy.wait()

    block = scratch[:]
    c = block[_HALO:_HALO + tile_h, :]

    diffs = []
    for dx, dy in _CIRCLE:
        sh = block[_HALO + dy:_HALO + dy + tile_h, :]
        if dx:
            # value at x comes from x + dx (non-negative shift required)
            w = sh.shape[1]
            sh = pltpu.roll(sh, (-dx) % w, 1)
        diffs.append(sh - c)

    def arc_score(th):
        bright = [d > th for d in diffs]
        dark = [d < -th for d in diffs]
        best = jnp.zeros_like(c)
        for s in range(16):
            okb = bright[s]
            mnb = diffs[s]
            okd = dark[s]
            mnd = -diffs[s]
            for j in range(1, _ARC):
                k = (s + j) % 16
                okb = jnp.logical_and(okb, bright[k])
                mnb = jnp.minimum(mnb, diffs[k])
                okd = jnp.logical_and(okd, dark[k])
                mnd = jnp.minimum(mnd, -diffs[k])
            best = jnp.maximum(best, jnp.where(okb, mnb, 0.0))
            best = jnp.maximum(best, jnp.where(okd, mnd, 0.0))
        return best

    if batched:
        out_ini_ref[0] = arc_score(th_ini)
        out_min_ref[0] = arc_score(th_min)
    else:
        out_ini_ref[:] = arc_score(th_ini)
        out_min_ref[:] = arc_score(th_min)


def _border_zero(s, H, W):
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    border = (ys < 3) | (ys >= H - 3) | (xs < 3) | (xs >= W - 3)
    return jnp.where(border, 0.0, s[..., :H, :W])


def _score_pair_single(gray, th_ini, th_min, tile_h, interpret):
    H, W = gray.shape
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // 128) * 128
    padded = jnp.zeros((Hp + 2 * _HALO, Wp), gray.dtype)
    padded = jax.lax.dynamic_update_slice(padded, gray, (_HALO, 0))

    kernel = functools.partial(
        _fast_kernel, tile_h=tile_h, th_ini=th_ini, th_min=th_min,
        batched=False,
    )
    out_shape = jax.ShapeDtypeStruct((Hp, Wp), gray.dtype)
    s_ini, s_min = pl.pallas_call(
        kernel,
        grid=(Hp // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return _border_zero(s_ini, H, W), _border_zero(s_min, H, W)


def _score_pair_batched(gray, th_ini, th_min, tile_h, interpret):
    S, H, W = gray.shape
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // 128) * 128
    padded = jnp.zeros((S, Hp + 2 * _HALO, Wp), gray.dtype)
    padded = jax.lax.dynamic_update_slice(padded, gray, (0, _HALO, 0))

    kernel = functools.partial(
        _fast_kernel, tile_h=tile_h, th_ini=th_ini, th_min=th_min,
        batched=True,
    )
    out_shape = jax.ShapeDtypeStruct((S, Hp, Wp), gray.dtype)
    s_ini, s_min = pl.pallas_call(
        kernel,
        grid=(S, Hp // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, tile_h, Wp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, Wp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return _border_zero(s_ini, H, W), _border_zero(s_min, H, W)


@functools.partial(jax.jit, static_argnames=("th_ini", "th_min", "tile_h",
                                             "interpret"))
def fast_score_pair_pallas(gray: jax.Array, th_ini: float, th_min: float,
                           tile_h: int = 32, interpret: bool = False):
    """FAST scores at two thresholds in one fused pass.

    gray: (H, W) float32.  Returns (score_ini, score_min), each (H, W) with
    3px borders zeroed (matching ops.fast.fast_score).  vmap over a leading
    batch axis lowers to a single (batch, band)-grid kernel launch.
    """

    @jax.custom_batching.custom_vmap
    def scorer(g):
        return _score_pair_single(g, th_ini, th_min, tile_h, interpret)

    @scorer.def_vmap
    def _scorer_vmap(axis_size, in_batched, g):  # noqa: ARG001
        (g_batched,) = in_batched
        if not g_batched:
            out = scorer(g)
            return out, (False, False)
        out = _score_pair_batched(g, th_ini, th_min, tile_h, interpret)
        return out, (True, True)

    return scorer(gray)
