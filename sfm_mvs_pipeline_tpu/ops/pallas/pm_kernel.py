"""Pallas TPU kernel: PatchMatch candidate scoring in the rectified frame.

The classic PatchMatch propagate/score step is gather-bound: every window
tap samples the neighbor at a per-pixel position, and XLA gathers run at
~110 M elem/s on this chip regardless of coherence (BASELINE.md) — 7 s per
360x202 view. In the RECTIFIED frame (mvs/rectified.py geometry) every
candidate is a per-pixel horizontal disparity, so each tap is a per-LANE
dynamic index into the padded neighbor row — exactly what the TPU's
in-register shuffle (tpu.dynamic_gather, via jnp.take_along_axis on 2D
equal-shaped operands) does at VPU speed (measured >100 G elem/s,
bench_suite/gather_kernel_probe.py).

Constraint: dynamic_gather spans ONE vreg (128 lanes). Wide disparity
ranges are decomposed as src = 128*hi + lo — for each candidate source
vreg delta, gather with lo within the 128-lane block and merge with a
select on hi (validated exact in the same probe).

Scoring semantics match mvs/patchmatch.py's _cost_packed: fronto-parallel
(translation-approximated) ZNCC over a (2r+1)^2 window, bilinear in x
(rectified rows align exactly, so y needs no interpolation), cost
(1 - zncc)/2, out-of-view -> 1. Ref-side window taps are static lane
slices; neighbor taps are 8 gathered columns per window row shared by the
7 bilinear offsets.

Grid: (row_tiles, candidates) — the neighbor/ref row blocks are reused
across the inner candidate sweep. The kernel is compiled for output
widths WL <= 1024 (the unrolled per-vreg-block loop); wider images are
scored in overlapping x-strips by the caller (propagation stays full-width
in XLA, so strips only affect scoring locality, not semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pm_score_kernel(cand_ref, nbr_ref, msk_ref, ref_ref, rm_ref, rv_ref,
                     out_ref, *, r, maxd, maxd_pad, wl, f32_interp):
    """One candidate block: cost (TH, WL) of the disparity map block.

    cand_ref (1, TH, WL) disparity; nbr_ref (2r+1, TH, WG) dy-shifted
    padded neighbor rows; msk_ref (TH, WG) validity of the padded neighbor;
    ref_ref (2r+1, TH, WR) dy-shifted ref rows padded by r on the left;
    rm_ref/rv_ref (TH, WL) ref window mean/var. out_ref (1, TH, WL)."""
    area = float((2 * r + 1) ** 2)
    th = cand_ref.shape[1]
    wg = nbr_ref.shape[2]
    mp128 = maxd_pad // 128
    n_xb = wl // 128

    d_all = cand_ref[0]  # (TH, WL)
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, 128), 1)

    for xb in range(n_xb):
        d = d_all[:, xb * 128 : (xb + 1) * 128]
        di = jnp.floor(d)
        frac = d - di
        dii = di.astype(jnp.int32)
        # global source column for tap offset 0
        src0 = (maxd_pad + 128 * xb) + lane - dii
        # source vreg range for taps src0 + o, o in [-r, r+1]
        d_lo = (maxd_pad - maxd - r) // 128 + xb
        d_hi = (maxd_pad + 127 + r + 1) // 128 + xb
        deltas = [dv for dv in range(d_lo, d_hi + 1)
                  if 0 <= dv < wg // 128]

        # per-tap-offset (lo, hi) indices + per-delta select masks.
        # tap oi sits at source offset (oi - r - 1): the fractional source
        # position is (x + o - di) - frac, so the bilinear partner of tap
        # u is u - 1 (toward SMALLER index), and offsets [-r-1, r] cover
        # all window offsets o in [-r, r]
        lo_o = []
        masks = []
        bias = maxd_pad + 128  # makes the dividend non-negative so the
        # truncating lax.div/rem act as FLOOR division — without it a
        # source index < 0 (d == maxd at the left edge) decomposes to
        # hi=0 with a negative lo instead of hi=-1 (code-review r5)
        nb = bias // 128
        for oi in range(2 * r + 2):
            s = src0 + jnp.int32(oi - r - 1 + bias)
            lo_o.append(jax.lax.rem(s, jnp.int32(128)))
            hi = jax.lax.div(s, jnp.int32(128)) - nb
            masks.append({dv: hi == dv for dv in deltas})

        def wide_gather(row, oi):
            """row (TH, WG) -> row[src0 + oi - r - 1] per elem (TH, 128)."""
            acc = jnp.zeros((th, 128), row.dtype)
            for dv in deltas:
                blk = row[:, dv * 128 : (dv + 1) * 128]
                got = jnp.take_along_axis(blk, lo_o[oi], axis=1)
                acc = jnp.where(masks[oi][dv], got, acc)
            return acc

        sn = jnp.zeros((th, 128), jnp.float32)
        snn = jnp.zeros((th, 128), jnp.float32)
        srn = jnp.zeros((th, 128), jnp.float32)
        for dy in range(2 * r + 1):
            row = nbr_ref[dy]
            taps = [wide_gather(row, oi) for oi in range(2 * r + 2)]
            for o in range(2 * r + 1):
                # window offset o - r at fractional source: interp between
                # tap (o+1) [offset o - r] and tap o [offset o - r - 1]
                s_o = (1.0 - frac) * taps[o + 1] + frac * taps[o]
                # ref tap: static lane slice (ref padded by r on the left)
                rt = ref_ref[dy][:, xb * 128 + o : xb * 128 + o + 128]
                sn = sn + s_o
                snn = snn + s_o * s_o
                srn = srn + rt * s_o

        # center-tap validity (bilinear pair), like the rect engine's gate
        m0 = wide_gather(msk_ref[...], r + 1)  # offset 0
        m1 = wide_gather(msk_ref[...], r)  # offset -1
        inside = (m0 * m1) > 0.5

        rm = rm_ref[:, xb * 128 : (xb + 1) * 128]
        rv = rv_ref[:, xb * 128 : (xb + 1) * 128]
        n_mean = sn / area
        n_var = jnp.maximum(snn / area - n_mean * n_mean, 1e-8)
        cov = srn / area - rm * n_mean
        zncc = cov / jnp.sqrt(rv * n_var)
        cost = (1.0 - jnp.clip(zncc, -1.0, 1.0)) * 0.5
        out_ref[0, :, xb * 128 : (xb + 1) * 128] = jnp.where(
            inside, cost, 1.0
        )


def pm_score_rect(
    cands: jax.Array,  # (C, H, W) candidate disparity maps (>= 0)
    ref_rect: jax.Array,  # (H, W) rectified ref image
    nbr_rect: jax.Array,  # (H, W) rectified neighbor
    in_n: jax.Array,  # (H, W) bool neighbor validity
    r_mean: jax.Array,  # (H, W) ref window mean
    r_var: jax.Array,  # (H, W) ref window variance (>= eps)
    maxd: int,
    window_radius: int = 3,
    interpret: bool = False,
    nbr_left_ctx: int = 0,
    strip_width: int = 1024,
) -> jax.Array:
    """Score C disparity candidate maps -> costs (C, H, W).

    Images wider than 1024 are scored in x-strips (overlapping on the
    source side by the disparity range); candidate maps remain full-width
    so propagation in the caller is unaffected. nbr_left_ctx: the neighbor
    slice includes this many real context columns BEFORE the output origin
    (strip mode); they land inside the disparity pad region."""
    c, h, w = cands.shape
    r = window_radius
    if w > strip_width:
        # score in overlapping x-strips: each strip carries `ov` columns of
        # context on both sides (discarded after scoring) so window taps and
        # left-of-strip disparity sources are exact; propagation in the
        # caller stays full-width, strips only localize the scoring.
        ov = 128  # >= r; keeps strip widths lane-aligned
        step = max(strip_width - 2 * ov, 128)
        strips = []
        for x0 in range(0, w, step):
            x1 = min(x0 + step, w)
            a = max(x0 - ov, 0)
            bnd = min(x1 + ov, w)
            lo = max(a - maxd, 0)
            sc = pm_score_rect(
                cands[:, :, a:bnd],
                ref_rect[:, a:bnd],
                nbr_rect[:, lo:bnd],
                in_n[:, lo:bnd],
                r_mean[:, a:bnd], r_var[:, a:bnd],
                maxd=maxd,
                window_radius=r, interpret=interpret,
                nbr_left_ctx=a - lo,
                strip_width=max(strip_width, bnd - a),
            )
            strips.append(sc[:, :, x0 - a : x0 - a + (x1 - x0)])
        return jnp.concatenate(strips, axis=2)

    th = 32
    wl = _round_up(w, 128)
    hp = _round_up(h, th)
    maxd_pad = _round_up(max(maxd, 1), 128)
    wg = maxd_pad + wl + 128
    wr = _round_up(wl + 2 * r, 128)

    f32 = jnp.float32
    nbr_val = jnp.where(in_n, nbr_rect, 0.0).astype(f32)
    msk = in_n.astype(f32)

    def pad_hw(x, width, left):
        x = jnp.pad(x, ((0, hp - h), (left, width - left - x.shape[1])))
        return x

    # padded[maxd_pad + k] must equal the neighbor at OUTPUT column k:
    # nbr_left_ctx real context columns sit before the output origin
    nbr_left = maxd_pad - nbr_left_ctx
    nbr_pad = pad_hw(nbr_val, wg, nbr_left)  # (hp, WG)
    msk_pad = pad_hw(msk, wg, nbr_left)

    def dy_stack(img_pad):
        rows = []
        for dy in range(-r, r + 1):
            yy = jnp.clip(jnp.arange(hp) + dy, 0, h - 1)
            rows.append(img_pad[yy])
        return jnp.stack(rows)  # (2r+1, hp, width)

    nbr_dy = dy_stack(nbr_pad)
    ref_dy = dy_stack(pad_hw(ref_rect.astype(f32), wr, r))
    rm = pad_hw(r_mean.astype(f32), wl, 0)
    rv = pad_hw(jnp.maximum(r_var, 1e-8).astype(f32), wl, 0)
    cands_p = jnp.pad(
        cands.astype(f32), ((0, 0), (0, hp - h), (0, wl - w))
    )

    n_t = hp // th
    kern = functools.partial(
        _pm_score_kernel, r=r, maxd=maxd, maxd_pad=maxd_pad, wl=wl,
        f32_interp=interpret,
    )
    out = pl.pallas_call(
        kern,
        grid=(n_t, c),
        in_specs=[
            pl.BlockSpec((1, th, wl), lambda t, ci: (ci, t, 0)),
            pl.BlockSpec((2 * r + 1, th, wg), lambda t, ci: (0, t, 0)),
            pl.BlockSpec((th, wg), lambda t, ci: (t, 0)),
            pl.BlockSpec((2 * r + 1, th, wr), lambda t, ci: (0, t, 0)),
            pl.BlockSpec((th, wl), lambda t, ci: (t, 0)),
            pl.BlockSpec((th, wl), lambda t, ci: (t, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wl), lambda t, ci: (ci, t, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wl), jnp.float32),
        interpret=interpret,
    )(cands_p, nbr_dy, msk_pad, ref_dy, rm, rv)
    return out[:, :h, :w]
