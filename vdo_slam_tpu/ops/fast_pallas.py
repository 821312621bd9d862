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
                 tile_h, th_ini, th_min):
    i = pl.program_id(0)
    rows = tile_h + 2 * _HALO
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, rows), :], scratch, sem
    )
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

    out_ini_ref[:] = arc_score(th_ini)
    out_min_ref[:] = arc_score(th_min)


@functools.partial(jax.jit, static_argnames=("th_ini", "th_min", "tile_h",
                                             "interpret"))
def fast_score_pair_pallas(gray: jax.Array, th_ini: float, th_min: float,
                           tile_h: int = 32, interpret: bool = False):
    """FAST scores at two thresholds in one fused pass.

    gray: (H, W) float32.  Returns (score_ini, score_min), each (H, W) with
    3px borders zeroed (matching ops.fast.fast_score).
    """
    H, W = gray.shape
    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // 128) * 128
    padded = jnp.zeros((Hp + 2 * _HALO, Wp), gray.dtype)
    padded = jax.lax.dynamic_update_slice(padded, gray, (_HALO, 0))

    kernel = functools.partial(
        _fast_kernel, tile_h=tile_h, th_ini=th_ini, th_min=th_min
    )
    out_shape = jax.ShapeDtypeStruct((Hp, Wp), gray.dtype)
    s_ini, s_min = pl.pallas_call(
        kernel,
        grid=(Hp // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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

    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    border = (ys < 3) | (ys >= H - 3) | (xs < 3) | (xs >= W - 3)
    crop_i = jnp.where(border, 0.0, s_ini[:H, :W])
    crop_m = jnp.where(border, 0.0, s_min[:H, :W])
    return crop_i, crop_m
