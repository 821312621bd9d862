"""Wire-format packing for host->device frame uploads.

The tunnel to a remote-attached TPU is bandwidth-bound (~40 MB/s measured)
with a per-array round-trip cost, so the raw per-frame tensors
(rgb f32 + depth f32 + flow f32x2 + seg i32 = 9.3 MB in 5 arrays at KITTI
size) dominate the tracking loop.  This module packs a frame into ONE
int16 array of shape (4, H, W) — 8 bytes/pixel -> 3.7 MB, a single
transfer — and unpacks it on device with bit ops that XLA fuses into the
consumers:

  ch0: gray u8 | seg u8 << 8     (gray quantized to 1/255; labels < 256,
                                  matching the classifier's _LABEL_SPACE)
  ch1: depth u16 bitcast         (the SAME quantization the reference's
                                  uint16 depth PNGs carry, vdo_slam.cc:107)
  ch2: flow_u fp16 bitcast       (relative precision: ~0.01 px at 20 px,
  ch3: flow_v fp16 bitcast        sub-0.001 px for small flows — measured
                                  to keep object-motion RPE at parity with
                                  the unpacked float path, where the old
                                  1/64 px fixed point cost ~2x object
                                  rotation error; full float range, no
                                  clamping)

Quantization notes: the reference consumes uint16 depth PNGs, so the depth
channel loses nothing a real sequence ever had; channel-isolation tests
showed the 1/256 m depth and 1/255 gray quantization have no measurable
metric effect, while flow precision directly bounds object-motion accuracy
(hence fp16, not fixed point).
"""

from __future__ import annotations

import numpy as np

def depth_wire_scale(depth_map_factor: float) -> float:
    """Raw-sample -> u16 wire scale.  Chosen so the metric quantization is
    ALWAYS 1/256 m regardless of the dataset's depth_map_factor (a raw u16
    KITTI depth PNG with factor 256 round-trips bit-exactly: scale = 1)."""
    return 256.0 / float(depth_map_factor)


def _row_delta_u16(a: np.ndarray) -> np.ndarray:
    """Lossless row-wise bit-pattern delta of a (h, w) uint16 plane.

    Optical flow is spatially smooth, so neighboring fp16 samples share
    sign/exponent and most mantissa bits: their bit-pattern differences
    (mod 2^16 — exactly invertible by a cumulative sum) concentrate near
    zero, and the tunnel's zlib ships ~2.1x fewer bytes for the SAME
    samples (measured on the bench scene: 251 -> 117 KB/frame post-
    compression at flow_down=2).  Precision is untouched — this is an
    entropy coding, not a quantization."""
    d = a.copy()
    d[:, 1:] = (a[:, 1:].astype(np.int32)
                - a[:, :-1].astype(np.int32)).astype(np.uint16)
    return d


def _row_undelta_u16(d):
    """Device-side inverse of _row_delta_u16: cumulative sum mod 2^16 along
    rows.  uint32 accumulator: w <= 1242 terms of < 2^16 stays < 2^27."""
    import jax.numpy as jnp

    c = jnp.cumsum(d.astype(jnp.uint32), axis=1)
    return (c & jnp.uint32(0xFFFF)).astype(jnp.uint16)


def _norm_flow_down(flow_half: bool, flow_down: int | None) -> int:
    """Normalize the (flow_half legacy bool, flow_down factor) pair to a
    downsample factor in {1, 2, 4}."""
    d = int(flow_down) if flow_down is not None else (2 if flow_half else 1)
    if d not in (1, 2, 4):
        raise ValueError(f"flow_down must be 1, 2 or 4, got {d}")
    return d


def _norm_depth_down(depth_down: int | None, flow_d: int) -> int:
    """Validate the depth wire downsample factor.  Only 1 (full res) and 2
    are supported, and 2 requires the flat flow_down>1 wire layout (the
    (4,H,W) exact-parity layout has no room for a short depth plane)."""
    d = int(depth_down) if depth_down else 1
    if d not in (1, 2):
        raise ValueError(f"depth_down must be 1 or 2, got {d}")
    if d > 1 and flow_d == 1:
        raise ValueError("depth_down=2 requires flow_down>1 (flat wire)")
    return d


def wire_kwargs(tr) -> dict:
    """The wire-format keyword set shared by pack_frame and unpack_frame,
    derived from a TrackingConfig — the single place call sites pick up
    every wire knob (flow down/delta, depth down/resid, entropy caps).
    unpack_frame callers add hw=(H, W)."""
    return dict(depth_scale=depth_wire_scale(tr.depth_map_factor),
                flow_down=tr.flow_down, flow_delta=tr.flow_delta,
                depth_down=tr.depth_down, depth_resid=tr.depth_resid,
                entropy=tr.entropy, seg_cap=tr.wire_seg_cap,
                depth_exc_cap=tr.wire_depth_exc_cap)


def _pack_u8_pairs(a: np.ndarray) -> np.ndarray:
    """(n,) uint8-range values -> (ceil(n/2),) int16, two per lane."""
    a = a.astype(np.uint16)
    if a.size % 2:
        a = np.concatenate([a, a[-1:]])
    return (a[0::2] | (a[1::2] << 8)).astype(np.int16)


def _delta_i8_exc(v: np.ndarray, cap: int, what: str):
    """Raveled-order lossless delta coding of an integer sequence: int8
    deltas where they fit, plus <= cap sparse (index, true-delta) exception
    pairs for the rest (the int8 slot is zeroed there; the device adds the
    sparse delta back before the cumulative sum).  Raises if the sequence
    needs more than `cap` exceptions — the cap is a static-shape config
    knob (TrackingConfig.wire_*_cap), not a silent quality cliff."""
    d = np.diff(np.concatenate([np.zeros(1, np.int64), v.astype(np.int64)]))
    big = np.abs(d) > 127
    n = int(np.sum(big))
    if n > cap:
        raise ValueError(
            f"entropy wire: frame needs {n} {what} exceptions > cap {cap}; "
            f"raise the wire_{what}_cap config knob")
    i8 = np.where(big, 0, d).astype(np.int8)
    idx = np.flatnonzero(big).astype(np.int64)
    exc = d[idx].astype(np.int64)
    if n < cap:                       # pad with no-op (idx 0, delta 0)
        pad = cap - n
        idx = np.concatenate([idx, np.zeros(pad, np.int64)])
        exc = np.concatenate([exc, np.zeros(pad, np.int64)])
    return i8, idx, exc


def _exc_planes(idx: np.ndarray, val: np.ndarray) -> list[np.ndarray]:
    """Sparse (index, i32 value) pairs -> four contiguous u16 planes
    [idx_lo | idx_hi | val_lo | val_hi] viewed int16 (the wire dtype)."""
    v = val.astype(np.int64)
    return [(idx & 0xFFFF).astype(np.uint16).view(np.int16),
            ((idx >> 16) & 0xFFFF).astype(np.uint16).view(np.int16),
            (v & 0xFFFF).astype(np.uint16).view(np.int16),
            ((v >> 16) & 0xFFFF).astype(np.uint16).view(np.int16)]


def _depth_residuals(depth_raw: np.ndarray, seg: np.ndarray,
                     depth_scale: float, dd: int, cap: int):
    """Host-side ranking of the `cap` worst pixels of the half-res depth
    reconstruction, for the sparse-residual wire block (pack_frame
    depth_resid).

    Runs the EXACT device reconstruction (_upsample2x_seg extrap path, same
    arithmetic, numpy backend) on the quantized coarse samples the wire
    will carry, compares against the quantized full-res truth, and returns
    the indices + true u16 values of the `cap` largest absolute errors
    (in meters — the quantity the 3D unprojection consumes).  Even-pixel
    samples are carried exactly, so the ranking lands on the interpolated
    pixels where the planar-in-1/z model fails: curved surfaces, thin
    structure, intra-label depth edges.  Indices are sorted ascending
    (helps both the tunnel compressor and scatter locality).  For
    pre-packed datasets this runs OFFLINE; in the live path it adds one
    numpy pass per frame."""
    H, W = depth_raw.shape
    tgt16 = np.clip(np.rint(depth_raw * depth_scale), 0,
                    65535).astype(np.uint16)
    dc = tgt16[0::dd, 0::dd].astype(np.float32) * np.float32(1.0 /
                                                             depth_scale)
    vmask = dc > 0
    inv = np.where(vmask, 1.0 / np.maximum(dc, 1e-6), 0.0).astype(
        np.float32)
    seg_i = np.clip(seg, 0, 255).astype(np.int32)
    up = _upsample2x_seg(inv[..., None], seg_i, vmask, extrap=True,
                         xp=np)[:H, :W, 0]
    rec = np.where(up > 1e-9, 1.0 / np.maximum(up, 1e-9), 0.0)
    tgt = tgt16.astype(np.float32) * np.float32(1.0 / depth_scale)
    err = np.abs(rec - tgt).ravel()
    cap = min(int(cap), err.size)
    idx = np.sort(np.argpartition(err, -cap)[-cap:]).astype(np.int64)
    return idx, tgt16.ravel()[idx]


def pack_frame(gray: np.ndarray, depth_raw: np.ndarray, flow: np.ndarray,
               seg: np.ndarray, depth_scale: float = 1.0,
               flow_half: bool = False,
               flow_down: int | None = None,
               flow_delta: bool = False,
               depth_down: int = 1,
               depth_resid: int = 0,
               entropy: bool = False,
               seg_cap: int = 8192,
               depth_exc_cap: int = 8192) -> np.ndarray:
    """Host-side pack: (H,W) gray [0,1], (H,W) raw depth samples,
    (H,W,2) float flow, (H,W) int labels -> (4,H,W) int16.

    depth_scale: see depth_wire_scale — raw samples are stored as
    round(depth_raw * depth_scale) in u16.

    flow_half / flow_down: carry flow DOWNSAMPLED by 2 or 4 (every 2nd/4th
    pixel, fp16) and bilinearly upsample on device — the wire drops from 8
    to 5 (down=2) or 4.25 (down=4) bytes/pixel, and since the fp16 flow
    mantissas are the wire's only incompressible channel (the tunnel
    zlib-compresses: gray/seg/depth shrink 10-200x, flow barely), the
    POST-COMPRESSION payload the tunnel actually ships drops ~2x/~4x.
    Flow is consumed at sparse gather positions and for the mask warp; it
    is smooth away from motion boundaries, where interpolation error stays
    well under the fp16 wire noise (the device upsample is seg-aware, see
    _upsample2x_seg).  flow_half=True is the legacy spelling of
    flow_down=2.  Returns a FLAT int16 vector for down>1 (layout:
    [gray|seg (H*W), depth (H*W), flow_u (Hd*Wd), flow_v (Hd*Wd)])
    instead of (4,H,W).

    flow_delta: store the flow planes as LOSSLESS row-wise bit-pattern
    deltas (_row_delta_u16) — the samples the device reconstructs are
    bit-identical, but the tunnel's compressor ships ~2x fewer bytes.

    depth_down: carry depth DOWNSAMPLED by 2 (every 2nd pixel) and
    reconstruct the dense map on device by seg-aware bilinear interpolation
    in INVERSE depth (1/z is affine in pixel coordinates on any 3D plane,
    so interiors of planar surfaces reconstruct exactly; boundaries mix
    only same-label samples, invalid (zero) samples carry no weight).
    Cuts the raw wire another ~0.7 MB/frame at KITTI size — the upload to
    a remote-attached device costs time proportional to RAW bytes (the
    tunnel compresses on the single host core).  Requires flow_down>1.

    depth_resid: with depth_down>1, additionally carry the `depth_resid`
    WORST-reconstructed pixels as sparse bit-exact corrections
    (_depth_residuals): 3 u16 per correction ([idx_lo | idx_hi | value]
    planes appended after the flow), applied as one scatter on device.
    Bounds the reconstruction error by the (cap+1)-th largest residual —
    the half-res interpolation model is exact on planes but not on curved
    / thin structure, which is where the camera solver's features live.
    16384 corrections cost 96 KB against the ~0.7 MB the downsample
    saves.

    entropy: the LOSSLESS entropy wire (requires flow_down>1; excludes
    depth_down/depth_resid).  Upload time to a remote-attached chip tracks
    RAW bytes (the tunnel's compressor runs on the single host core), so
    instead of shipping dense u16 depth + u8 seg it ships:
      * depth as RAVELED int8 deltas (1 B/px; the u16 samples of real
        depth maps move < 0.5 m between adjacent pixels almost everywhere)
        plus <= depth_exc_cap sparse bit-exact exceptions for the jumps
        (measured bench scene: <= 27/frame),
      * seg as <= seg_cap sparse raveled transitions only (measured:
        <= 383/frame) — label maps are piecewise constant,
      * gray as u8 pairs (unchanged content, denser lanes).
    The device inverts both delta streams with one integer cumsum each
    (bit-exact) — reconstruction is IDENTICAL to the dense wire, so this
    is pure upload-time savings: 5 -> ~3.1 B/px at KITTI size.  Caps are
    static shapes; a frame over cap raises (see _delta_i8_exc)."""
    d = _norm_flow_down(flow_half, flow_down)
    dd = _norm_depth_down(depth_down, d)
    if depth_resid and dd <= 1:
        raise ValueError("depth_resid requires depth_down>1")
    if entropy:
        if d == 1:
            raise ValueError("entropy wire requires flow_down>1")
        if dd > 1 or depth_resid:
            raise ValueError("entropy wire excludes depth_down/depth_resid "
                             "(it carries full-res depth losslessly)")
    g8 = np.clip(np.rint(gray * 255.0), 0, 255).astype(np.uint16)
    s8 = np.clip(seg, 0, 255).astype(np.uint16)
    d16 = np.clip(np.rint(depth_raw * depth_scale), 0,
                  65535).astype(np.uint16)
    if entropy:
        dep_i8, dep_idx, dep_exc = _delta_i8_exc(
            d16.ravel(), depth_exc_cap, "depth_exc")
        seg_d = np.diff(np.concatenate(
            [np.zeros(1, np.int64), s8.ravel().astype(np.int64)]))
        tr_idx = np.flatnonzero(seg_d != 0).astype(np.int64)
        if tr_idx.size > seg_cap:
            raise ValueError(
                f"entropy wire: frame has {tr_idx.size} seg transitions > "
                f"cap {seg_cap}; raise the wire_seg_cap config knob")
        tr_val = seg_d[tr_idx]
        if tr_idx.size < seg_cap:
            pad = seg_cap - tr_idx.size
            tr_idx = np.concatenate([tr_idx, np.zeros(pad, np.int64)])
            tr_val = np.concatenate([tr_val, np.zeros(pad, np.int64)])
        fh = np.ascontiguousarray(
            flow[0::d, 0::d].astype(np.float16)).view(np.int16)

        def enc_(plane):
            if not flow_delta:
                return plane
            return _row_delta_u16(plane.view(np.uint16)).view(np.int16)

        parts = [_pack_u8_pairs(g8.ravel()),
                 _pack_u8_pairs(dep_i8.view(np.uint8)),
                 enc_(fh[..., 0]).ravel(), enc_(fh[..., 1]).ravel()]
        parts += _exc_planes(dep_idx, dep_exc)
        parts += _exc_planes(tr_idx, tr_val)
        return np.concatenate(parts)
    ch0 = (g8 | (s8 << 8)).astype(np.int16)
    ch1 = d16.view(np.int16)
    if dd > 1:
        ch1 = np.ascontiguousarray(ch1[0::dd, 0::dd])

    def enc(plane_f16_i16: np.ndarray) -> np.ndarray:  # (h, w) int16
        if not flow_delta:
            return plane_f16_i16
        return _row_delta_u16(plane_f16_i16.view(np.uint16)).view(np.int16)

    if d > 1:
        fh = np.ascontiguousarray(
            flow[0::d, 0::d].astype(np.float16)).view(np.int16)
        parts = [ch0.ravel(), ch1.ravel(),
                 enc(fh[..., 0]).ravel(), enc(fh[..., 1]).ravel()]
        if depth_resid:
            idx, vals = _depth_residuals(depth_raw, seg, depth_scale, dd,
                                         depth_resid)
            if idx.size < depth_resid:      # pad by repeating the first
                pad = depth_resid - idx.size
                idx = np.concatenate([idx, np.full(pad, idx[0] if idx.size
                                                   else 0)])
                vals = np.concatenate(
                    [vals, np.full(pad, vals[0] if vals.size else 0,
                                   np.uint16)])
            parts += [(idx & 0xFFFF).astype(np.uint16).view(np.int16),
                      (idx >> 16).astype(np.uint16).view(np.int16),
                      vals.view(np.int16)]
        return np.concatenate(parts)
    f = np.ascontiguousarray(flow.astype(np.float16)).view(np.int16)
    return np.stack([ch0, ch1, enc(f[..., 0]), enc(f[..., 1])])


def _upsample2x_seg(f, seg, valid=None, extrap=False, xp=None):
    """Seg-aware bilinear 2x upsample of (h, w, C) samples -> (2h, 2w, C)
    with out[2i, 2j] = f[i, j] (matching the host's even-pixel downsample).

    Plain bilinear interpolates ACROSS motion boundaries, contaminating
    object flow with background flow (measured: 10x object-rotation RPE on
    the oracle scene).  The full-res seg rides the same wire, so each output
    pixel mixes only the coarse samples that share its label (renormalized
    weights; plain bilinear as fallback where no neighbor matches).  Rigid
    motion induces an affine-in-pixel flow field, which bilinear
    reconstructs exactly in the interior — the boundary was the only error
    source.  Pure elementwise + pad/reshape; XLA fuses it into consumers.

    valid: optional (h, w) bool mask of usable coarse samples (the depth
    wire's zero = invalid convention).  Invalid samples carry no weight in
    either the seg-matched mix or the fallback; a pixel with NO valid
    contributor at all comes out 0 (stays invalid downstream).

    extrap: first-order boundary handling.  Without it, an output pixel
    whose cell straddles a label boundary renormalizes over the matching
    corners only — a one-SIDED cell degrades to nearest extension (0-order),
    i.e. up to 1 coarse px of field slope; for the inverse-depth wire that
    error is amplified by z^2 and measurably moved camera rotation RPE
    (round-5 A/B, DESIGN §13).  With extrap=True, corners in LABEL-DEGENERATE
    cells (some corner excluded by label/validity) vote with their locally-
    fitted same-label plane extended to the target pixel; cells whose 4
    corners all match keep the plain exact bilinear.  Gradients are
    MINMOD-limited (the smaller-magnitude of the two one-sided same-label
    diffs, zero on sign disagreement): a segment label is NOT one plane
    (the background mixes road and far structure), and unlimited gradients
    extrapolate across intra-label depth discontinuities — measured to be
    WORSE than nearest extension (cam_r 7.7e-4 vs 4.5e-4 on the bench
    scene).  minmod keeps the affine-interior exactness (both diffs equal
    the true slope) while clamping to the smooth side at a jump.  Costs
    ~10 extra shifted-view elementwise ops; still fully fusable.

    xp: array namespace — jax.numpy (default; the device unpack) or numpy
    (the host-side mirror pack_frame runs to rank residual corrections,
    _depth_residuals).  The arithmetic is identical either way; only the
    backend differs."""
    if xp is None:
        import jax.numpy as xp
    jnp = xp

    h, w, _ = f.shape
    # edge-pad to exactly (2h, 2w): for odd H/W the last sample row/col of
    # the coarse grid covers one fewer fine row/col
    seg2 = jnp.pad(seg, ((0, 2 * h - seg.shape[0]),
                         (0, 2 * w - seg.shape[1])), mode="edge")
    sh = seg2[0::2, 0::2]                                  # (h, w) labels

    def pad_r(x):   # neighbor to the right, edge-clamped
        return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)

    def pad_d(x):   # neighbor below, edge-clamped
        return jnp.concatenate([x[1:], x[-1:]], axis=0)

    # the 4 coarse corners of every output cell, as (h, w, ...) grids
    f00, f01 = f, pad_r(f)
    f10, f11 = pad_d(f), pad_r(pad_d(f))
    s00, s01 = sh, pad_r(sh)
    s10, s11 = pad_d(sh), pad_r(pad_d(sh))
    if valid is not None:
        vf = valid.astype(f.dtype)
        v4 = (vf, pad_r(vf), pad_d(vf), pad_r(pad_d(vf)))
    else:
        v4 = (None, None, None, None)

    if extrap:
        # per-coarse-sample same-label gradients (f units / coarse px).
        # Neighbors across the image border are marked unusable (the edge
        # clamp would silently halve the slope); a sample with no usable
        # neighbor on either side in a direction gets gradient 0 there
        # (falls back to the 0-order nearest behavior).
        vb = (valid if valid is not None
              else jnp.ones((h, w), bool))

        def _axis_grad(sh_n, fb, vb_):
            zc = jnp.zeros((h, 1), bool)
            zr = jnp.zeros((1, w), bool)
            if sh_n == "x":
                ok_l = jnp.concatenate(
                    [zc, (sh[:, :-1] == sh[:, 1:]) & vb_[:, :-1]], axis=1)
                ok_r = jnp.concatenate(
                    [(sh[:, 1:] == sh[:, :-1]) & vb_[:, 1:], zc], axis=1)
                f_l = jnp.concatenate([fb[:, :1], fb[:, :-1]], axis=1)
                f_r = pad_r(fb)
            else:
                ok_l = jnp.concatenate(
                    [zr, (sh[:-1] == sh[1:]) & vb_[:-1]], axis=0)
                ok_r = jnp.concatenate(
                    [(sh[1:] == sh[:-1]) & vb_[1:], zr], axis=0)
                f_l = jnp.concatenate([fb[:1], fb[:-1]], axis=0)
                f_r = pad_d(fb)
            okl = ok_l[..., None].astype(fb.dtype)
            okr = ok_r[..., None].astype(fb.dtype)
            dl, dr = fb - f_l, f_r - fb
            # minmod slope limiter: agree in sign -> smaller magnitude,
            # disagree -> 0 (a local extremum / discontinuity, don't
            # extrapolate it)
            minmod = jnp.where(
                dl * dr > 0,
                jnp.sign(dl) * jnp.minimum(jnp.abs(dl), jnp.abs(dr)), 0.0)
            one_sided = okr * dr + (1.0 - okr) * okl * dl
            both = okl * okr
            return both * minmod + (1.0 - both) * one_sided

        gx, gy = _axis_grad("x", f, vb), _axis_grad("y", f, vb)
        g4 = ((gx, gy), (pad_r(gx), pad_r(gy)),
              (pad_d(gx), pad_d(gy)), (pad_r(pad_d(gx)), pad_r(pad_d(gy))))
        # corner offsets within the cell, in coarse-pixel units
        c4 = ((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
    else:
        g4 = ((None, None),) * 4
        c4 = ((0.0, 0.0),) * 4

    # output phases: (dy, dx) in the 2x2 cell -> bilinear corner weights.
    # The four phase grids are interleaved by a stack+transpose+reshape
    # (pure data movement XLA lays out for free) instead of four strided
    # scatters, which TPU lowers as real scatter kernels.
    phases = {(0, 0): (1.0, 0.0, 0.0, 0.0), (0, 1): (.5, .5, 0.0, 0.0),
              (1, 0): (.5, 0.0, .5, 0.0), (1, 1): (.25, .25, .25, .25)}
    C = f.shape[-1]
    vals = []
    for (dy, dx) in ((0, 0), (0, 1), (1, 0), (1, 1)):
        w00, w01, w10, w11 = phases[(dy, dx)]
        lab = seg2[dy::2, dx::2]                           # (h, w)
        acc = 0.0
        acc_x = 0.0
        macc = 0.0
        pacc = 0.0
        pmacc = 0.0
        for wgt, fv, sv, vv, gv, cc in ((w00, f00, s00, v4[0], g4[0], c4[0]),
                                        (w01, f01, s01, v4[1], g4[1], c4[1]),
                                        (w10, f10, s10, v4[2], g4[2], c4[2]),
                                        (w11, f11, s11, v4[3], g4[3], c4[3])):
            if wgt == 0.0:
                continue
            m = (sv == lab).astype(f.dtype)[..., None] * wgt
            pw = wgt
            if vv is not None:
                m = m * vv[..., None]
                pw = wgt * vv[..., None]
            acc = acc + fv * m
            macc = macc + m
            pacc = pacc + fv * pw
            pmacc = pmacc + pw
            if extrap:
                # this corner's plane extended to the target pixel at
                # (dy/2, dx/2) within the cell (coarse-px units)
                ddy, ddx = dy * 0.5 - cc[0], dx * 0.5 - cc[1]
                acc_x = acc_x + (fv + ddy * gv[1] + ddx * gv[0]) * m
        if valid is None:
            plain = pacc                      # exact bilinear (weights sum 1)
        else:
            # validity-weighted bilinear; all-invalid cells come out 0
            plain = jnp.where(pmacc > 0, pacc / jnp.maximum(pmacc, 1e-6),
                              jnp.zeros_like(pacc))
        mix = acc
        if extrap:
            # extrapolated votes ONLY where a corner was excluded (macc < 1
            # up to fp noise): full cells keep the exact plain bilinear,
            # so interiors — including intra-label depth edges — are
            # bit-unchanged vs extrap=False
            mix = jnp.where(macc < 1.0 - 1e-4, acc_x, acc)
        vals.append(jnp.where(macc > 0, mix / jnp.maximum(macc, 1e-6),
                              plain))
    # (2, 2, h, w, C) -> out[2i+dy, 2j+dx] = vals[dy][dx][i, j]
    grid = jnp.stack(vals).reshape(2, 2, h, w, C)
    return grid.transpose(2, 0, 3, 1, 4).reshape(2 * h, 2 * w, C)


def unpack_frame(buf, depth_scale: float = 1.0, flow_half: bool = False,
                 hw: tuple[int, int] | None = None,
                 flow_down: int | None = None,
                 flow_delta: bool = False,
                 depth_down: int = 1,
                 depth_resid: int = 0,
                 entropy: bool = False,
                 seg_cap: int = 8192,
                 depth_exc_cap: int = 8192):
    """Device-side unpack: (4,H,W) int16 — or the flat flow_down>1 layout,
    with hw=(H,W) — -> (gray f32, depth_raw f32, flow f32 (H,W,2), seg i32).
    Pure elementwise (+ the seg-aware flow upsample for flow_down>1, applied
    log2(down) times; bilinear-of-bilinear on the 2x grids stays exact for
    the affine-in-pixel flow a rigid motion induces, so down=4 keeps the
    interior reconstruction exact) — XLA fuses it into the first consumers,
    so the unpack is effectively free."""
    import jax
    import jax.numpy as jnp

    d = _norm_flow_down(flow_half, flow_down)
    dd = _norm_depth_down(depth_down, d)
    if entropy:
        # lossless entropy wire (see pack_frame): u8-pair gray, i8-delta
        # depth + sparse exceptions, sparse seg transitions; two integer
        # cumsums invert the delta streams bit-exactly
        H, W = hw
        Hd, Wd = (H + d - 1) // d, (W + d - 1) // d
        n = H * W
        nh = (n + 1) // 2
        u = jax.lax.bitcast_convert_type(buf, jnp.uint16)

        def unpair(plane):                       # (nh,) u16 -> (n,) u8
            lo = plane & 0xFF
            hi = plane >> 8
            return jnp.stack([lo, hi], axis=-1).reshape(-1)[:n]

        def sext8(b):                            # u8 -> signed i32
            return ((b.astype(jnp.int32) ^ 0x80) - 0x80)

        def exc(block):                          # 4 planes -> (idx, i32 val)
            cap = block.shape[0] // 4
            idx = (block[:cap].astype(jnp.int32)
                   | (block[cap:2 * cap].astype(jnp.int32) << 16))
            val = (block[2 * cap:3 * cap].astype(jnp.int32)
                   | (block[3 * cap:].astype(jnp.int32) << 16))
            return idx, val

        gray = unpair(u[:nh]).astype(jnp.float32) * (1.0 / 255.0)
        deltas = sext8(unpair(u[nh:2 * nh]))
        o = 2 * nh + 2 * Hd * Wd
        dep_idx, dep_val = exc(u[o:o + 4 * depth_exc_cap])
        o2 = o + 4 * depth_exc_cap
        seg_idx, seg_val = exc(u[o2:o2 + 4 * seg_cap])
        deltas = deltas.at[dep_idx].add(dep_val)     # pad = (0, 0) no-ops
        d16 = jnp.cumsum(deltas)
        depth = (d16.astype(jnp.float32) * (1.0 / depth_scale)).reshape(
            H, W)
        seg = jnp.cumsum(
            jnp.zeros((n,), jnp.int32).at[seg_idx].add(seg_val)).reshape(
                H, W)

        def dec(plane_u16):
            if flow_delta:
                plane_u16 = _row_undelta_u16(plane_u16)
            return jax.lax.bitcast_convert_type(
                plane_u16, jnp.float16).astype(jnp.float32)

        fu16 = u[2 * nh:o]
        f = jnp.stack([dec(fu16[:Hd * Wd].reshape(Hd, Wd)),
                       dec(fu16[Hd * Wd:].reshape(Hd, Wd))], axis=-1)
        lvl = d
        while lvl > 1:
            lvl //= 2
            seg_s = seg[0::lvl, 0::lvl]
            hs = (H + lvl - 1) // lvl
            ws = (W + lvl - 1) // lvl
            f = _upsample2x_seg(f, seg_s)[:hs, :ws]
        return gray.reshape(H, W), depth, f, seg
    if d > 1:
        H, W = hw
        Hd, Wd = (H + d - 1) // d, (W + d - 1) // d
        n = H * W
        u = jax.lax.bitcast_convert_type(buf, jnp.uint16)
        c0 = u[:n].reshape(H, W)
        gray = (c0 & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        seg = (c0 >> 8).astype(jnp.int32)
        if dd > 1:
            Hdd, Wdd = (H + dd - 1) // dd, (W + dd - 1) // dd
            nd = Hdd * Wdd
            dc = u[n:n + nd].reshape(Hdd, Wdd).astype(jnp.float32) * (
                1.0 / depth_scale)
            # seg-aware bilinear in INVERSE depth (1/z is affine in pixel
            # on a 3D plane -> planar interiors reconstruct exactly);
            # zero samples are invalid and carry no weight.  extrap=True:
            # one-sided boundary cells extrapolate the same-label
            # inverse-depth plane instead of nearest-extending it — the
            # 0-order boundary error was 1 coarse px of 1/z slope amplified
            # by z^2, which doubled camera-rotation RPE and kept this wire
            # out of tpu_fast (round-5 A/B, DESIGN §13)
            vmask = dc > 0
            inv = jnp.where(vmask, 1.0 / jnp.maximum(dc, 1e-6), 0.0)
            up = _upsample2x_seg(inv[..., None], seg, vmask,
                                 extrap=True)[:H, :W, 0]
            depth = jnp.where(up > 1e-9, 1.0 / jnp.maximum(up, 1e-9), 0.0)
            if depth_resid:
                # sparse bit-exact corrections: overwrite the cap
                # worst-reconstructed pixels with their true u16 samples
                # (one 1D scatter; padding repeats a real correction, so
                # duplicates are idempotent)
                nf = Hd * Wd * 2
                r = u[n + nd + nf:n + nd + nf + 3 * depth_resid]
                lo = r[:depth_resid].astype(jnp.int32)
                hi = r[depth_resid:2 * depth_resid].astype(jnp.int32)
                dv = r[2 * depth_resid:].astype(jnp.float32) * (
                    1.0 / depth_scale)
                depth = depth.ravel().at[lo | (hi << 16)].set(
                    dv).reshape(H, W)
        else:
            nd = n
            depth = u[n:2 * n].reshape(H, W).astype(jnp.float32) * (
                1.0 / depth_scale)

        def dec(plane_u16):  # (Hd, Wd) uint16 -> f32 flow plane
            if flow_delta:
                plane_u16 = _row_undelta_u16(plane_u16)
            return jax.lax.bitcast_convert_type(
                plane_u16, jnp.float16).astype(jnp.float32)

        fu16 = u[n + nd:n + nd + 2 * Hd * Wd]
        f = jnp.stack([dec(fu16[:Hd * Wd].reshape(Hd, Wd)),
                       dec(fu16[Hd * Wd:].reshape(Hd, Wd))], axis=-1)
        # upsample 2x at a time; stage s consumes the seg labels subsampled
        # to its OUTPUT grid so every mix stays label-consistent
        lvl = d
        while lvl > 1:
            lvl //= 2
            seg_s = seg[0::lvl, 0::lvl]
            hs = (H + lvl - 1) // lvl
            ws = (W + lvl - 1) // lvl
            f = _upsample2x_seg(f, seg_s)[:hs, :ws]
        flow = f
        return gray, depth, flow, seg
    u = jax.lax.bitcast_convert_type(buf, jnp.uint16)  # raw bit patterns
    gray = (u[0] & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    seg = (u[0] >> 8).astype(jnp.int32)
    depth = u[1].astype(jnp.float32) * (1.0 / depth_scale)
    fu, fv = u[2], u[3]
    if flow_delta:
        fu, fv = _row_undelta_u16(fu), _row_undelta_u16(fv)
    fl = jax.lax.bitcast_convert_type(jnp.stack([fu, fv]),
                                      jnp.float16).astype(jnp.float32)
    flow = jnp.stack([fl[0], fl[1]], axis=-1)
    return gray, depth, flow, seg
