"""Fused route + NCO-shift + rational-resample Pallas TPU kernel — the
256-demod north-star hot path.

The XLA frontend (receiver/frontend.py + ops/resample.py) materializes, per
demod, the gathered full-rate channel stream AND its overlapped Toeplitz
windows in HBM: at 256 demods x 128k channel samples that is ~GB of HBM
traffic per block and it dominates the chain (BENCH.md round-2/3 ablation;
ref hot paths #1/#2: src/sdr/SDRPostThread.cpp:303-396 routing +
src/demod/DemodulatorPreThread.cpp:153-220 NCO/resample).

This kernel keeps all per-demod full-rate data in VMEM. Per output tile of
O samples (grid step i):

    HBM->VMEM  Z [M, Wd]        one window of ALL channels (read ~W/S times
                                 total ~= 1.2x the channel data, not N x)
    MXU        X = onehot @ Z    route: channel select as a tiny matmul
    VPU        Xm = X * E        fold the NCO: E[r,i] = e^{+i w_r i}
                                 (modulating the WINDOW keeps the shared
                                 Toeplitz taps REAL -> 2 matmuls, not 4)
    MXU        Y = Xm @ T        resample: banded [Wd, O] tap matrix
    VPU        out = Y * e^{i phi(r,i)}   per-tile base phase rotation
    VMEM->HBM  out [N, O]

Numerically identical to ops/resample.planar_shifted_resample_matmul on the
gathered stream (same Toeplitz matrix, same phase bookkeeping): the
modulation e^{+i w i} commutes from the tap matrix onto the window because
the phase is linear in the shared sample index i.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cubicsdr_tpu.ops.resample import _toeplitz_np

TWO_PI = 6.283185307179586

# Tests flip this to run the kernel under the Pallas interpreter on CPU.
INTERPRET = False

# MXU strategy for the kernel's dots. DEFAULT (one bf16 pass, ~-45 dB) is
# not acceptable on a signal path. "split_bf16" (default) hand-rolls mixed
# precision: exact 2-pass selection + bf16x3 main dots (~-96 dB) at ~2.4x
# less MXU work than Precision.HIGHEST (~f32, 6 passes), which Mosaic also
# accepts here (jax.lax.Precision.HIGH does NOT lower in Mosaic).
DOT_PRECISION = "split_bf16"


def choose_fused_tile(n_out: int, P: int, Q: int, lo: int = 64,
                      hi: int = 1024, target: int = 128):
    """Output tile O for the fused kernel: O % P == 0, n_out % O == 0,
    the input stride S = (O//P)*Q must be 128-aligned (DMA slices move
    in lane multiples of 128), and O itself must be 128-aligned — the
    OUTPUT BlockSpec (N8, Tt*O) blocks the lane axis, and Mosaic demands
    128-multiple lane blocks unless a block spans the whole axis (found
    on hardware at n_out=88000 -> O=320: 'Block spec ... has block
    shape (8, 320)' compile failure). None if infeasible (caller falls
    back to the XLA gather path)."""
    cands = [o for o in range(lo, hi + 1)
             if o % P == 0 and o % 128 == 0 and n_out % o == 0
             and ((o // P) * Q) % 128 == 0]
    return min(cands, key=lambda o: abs(o - target)) if cands else None


def _kernel(z_re_hbm, z_im_hbm, oh_ref, er_ref, ei_ref, t_ref,
            pw0_ref, a1_ref, a64_ref, out_re, out_im, s_re, s_im, sem,
            *, S: int, Wd: int, O: int, Tt: int, prec):
    # One grid step covers Tt output tiles: ONE bigger DMA instead of Tt
    # small ones (serial start/wait latency was ~40% of kernel time at
    # Tt=1), then a static in-kernel loop over the sub-tiles whose window
    # offsets j*S are 128-aligned VMEM slices.
    g = pl.program_id(0)
    dma_w = (Tt - 1) * S + Wd
    cp_re = pltpu.make_async_copy(z_re_hbm.at[:, pl.ds(g * (S * Tt), dma_w)],
                                  s_re, sem.at[0])
    cp_im = pltpu.make_async_copy(z_im_hbm.at[:, pl.ds(g * (S * Tt), dma_w)],
                                  s_im, sem.at[1])
    cp_re.start()
    cp_im.start()
    cp_re.wait()
    cp_im.wait()

    for j in range(Tt):
        _one_tile(g * Tt + j, j, oh_ref, er_ref, ei_ref, t_ref,
                  pw0_ref, a1_ref, a64_ref, out_re, out_im, s_re, s_im,
                  S=S, Wd=Wd, O=O, prec=prec)


def _one_tile(i, j, oh_ref, er_ref, ei_ref, t_ref,
              pw0_ref, a1_ref, a64_ref, out_re, out_im, s_re, s_im,
              *, S: int, Wd: int, O: int, prec):
    sl_in = slice(j * S, j * S + Wd)
    sl_out = slice(j * O, (j + 1) * O)
    if prec == "split_bf16":
        # Hand-rolled mixed precision, ~2.4x less MXU work than HIGHEST
        # (which burns 6 bf16 passes per dot, and pads the selection dot's
        # 16-deep contraction to 128 making it as expensive as the main
        # dot). Selection: the one-hot is EXACT in bf16, so splitting the
        # data into bf16 hi+lo makes two single-pass dots an exact f32 row
        # copy. Main dot: bf16x3 (hi*hi + hi*lo + lo*hi; the dropped lo*lo
        # term is ~2^-16 relative, -96 dB — far below the 60 dB stopband).
        oh = oh_ref[:].astype(jnp.bfloat16)

        def split(v):
            v_hi = v.astype(jnp.bfloat16)
            return v_hi, (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def sel(s):
            v_hi, v_lo = split(s[:, sl_in])
            return (jnp.dot(oh, v_hi, preferred_element_type=jnp.float32)
                    + jnp.dot(oh, v_lo, preferred_element_type=jnp.float32))

        x_re, x_im = sel(s_re), sel(s_im)
        er, ei = er_ref[:], ei_ref[:]                   # [N, Wd]
        xm_re = x_re * er - x_im * ei
        xm_im = x_im * er + x_re * ei
        t_hi, t_lo = t_ref[0], t_ref[1]                 # [Wd, O] bf16 pair

        def main(xm):
            x_hi, x_lo = split(xm)
            return (jnp.dot(x_hi, t_hi, preferred_element_type=jnp.float32)
                    + jnp.dot(x_hi, t_lo,
                              preferred_element_type=jnp.float32)
                    + jnp.dot(x_lo, t_hi,
                              preferred_element_type=jnp.float32))

        y_re, y_im = main(xm_re), main(xm_im)
    else:
        oh = oh_ref[:]                                  # [N, M]
        # Raised precision: the MXU's default is one bf16 pass (~1e-3
        # relative) — fine for ML, not for a 60 dB-stopband signal path.
        x_re = jnp.dot(oh, s_re[:, sl_in],
                       preferred_element_type=jnp.float32, precision=prec)
        x_im = jnp.dot(oh, s_im[:, sl_in],
                       preferred_element_type=jnp.float32, precision=prec)
        er, ei = er_ref[:], ei_ref[:]                   # [N, Wd]
        xm_re = x_re * er - x_im * ei
        xm_im = x_im * er + x_re * ei
        t = t_ref[:]                                    # [Wd, O] real taps
        y_re = jnp.dot(xm_re, t, preferred_element_type=jnp.float32,
                       precision=prec)
        y_im = jnp.dot(xm_im, t, preferred_element_type=jnp.float32,
                       precision=prec)
    # Tile base phase phi(r, i) = pw0 + omega*S*i, computed from split
    # pre-wrapped increments (a1 = mod(wS), a64 = mod(64 wS)) so the f32
    # products stay small regardless of the tile count.
    hi = (i // 64).astype(jnp.float32)
    lo = (i % 64).astype(jnp.float32)
    phi = jnp.mod(pw0_ref[:] + a64_ref[:] * hi + a1_ref[:] * lo, TWO_PI)
    c, s = jnp.cos(phi), jnp.sin(phi)                   # [N, 1]
    out_re[:, sl_out] = y_re * c - y_im * s
    out_im[:, sl_out] = y_im * c + y_re * s


def routed_shifted_resample_pallas(z_re, z_im, chan_idx, omega, phase_w0,
                                   rs, interpret: bool | None = None):
    """z planes [M, hist + Lc] per-CHANNEL raw streams (rs.hist_len history
    prefix), chan_idx/omega/phase_w0 [N] -> (y_re, y_im) [N, n_out] routed,
    shifted and P/Q-resampled. None if no fused tile divides (caller falls
    back to the gather + XLA path)."""
    if interpret is None:
        interpret = INTERPRET
    M, total = z_re.shape
    L = total - rs.hist_len
    n_out = L // rs.Q * rs.P
    O = choose_fused_tile(n_out, rs.P, rs.Q)
    if O is None:
        return None
    T_np, S, W = _toeplitz_np(
        tuple(np.asarray(rs.ker).reshape(-1).tolist()), rs.P, rs.Q, rs.KK, O)
    Wd = -(-W // 128) * 128
    n_rows = n_out // O
    N = chan_idx.shape[0]
    N8 = max(8, -(-N // 8) * 8)
    M8 = max(8, -(-M // 8) * 8)

    # Host prep (all O(N*W) or O(M*L) ONCE — no per-demod full-rate data):
    start = rs.hist_len + rs.Q - 1 - (rs.KK - 1)
    need = (n_rows - 1) * S + Wd
    tail_pad = max(0, start + need - total)
    zs_re = jnp.pad(z_re, ((0, M8 - M), (0, tail_pad)))[:,
                                                        start: start + need]
    zs_im = jnp.pad(z_im, ((0, M8 - M), (0, tail_pad)))[:,
                                                        start: start + need]

    onehot = jnp.pad(
        jax.nn.one_hot(chan_idx, M, dtype=jnp.float32),
        ((0, N8 - N), (0, M8 - M)))
    omega = jnp.pad(jnp.asarray(omega, jnp.float32), (0, N8 - N))
    phase_w0 = jnp.pad(jnp.asarray(phase_w0, jnp.float32), (0, N8 - N))
    i_idx = jnp.arange(Wd, dtype=jnp.float32)
    th = jnp.mod(omega[:, None] * i_idx, TWO_PI)        # [N8, Wd]
    E_re, E_im = jnp.cos(th), jnp.sin(th)
    T_f32 = np.pad(T_np, ((0, Wd - W), (0, 0)))
    if DOT_PRECISION == "split_bf16":
        # Static taps pre-split into an exact bf16 (hi, lo) pair.
        import ml_dtypes
        T_hi = T_f32.astype(ml_dtypes.bfloat16)
        T_lo = (T_f32 - T_hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        T = jnp.asarray(np.stack([T_hi, T_lo]))         # [2, Wd, O] bf16
        t_spec = pl.BlockSpec((2, Wd, O), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        T = jnp.asarray(T_f32)
        t_spec = pl.BlockSpec((Wd, O), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    pw0 = phase_w0[:, None]                             # [N8, 1]
    a1 = jnp.mod(omega * S, TWO_PI)[:, None]
    a64 = jnp.mod(64.0 * jnp.mod(omega * S, TWO_PI), TWO_PI)[:, None]

    # Sub-tiles per grid step: fewer, bigger DMAs (serial DMA start/wait
    # latency dominated the Tt=1 kernel at small tiles).
    Tt = next(t for t in (8, 4, 2, 1) if n_rows % t == 0)
    kern = partial(_kernel, S=S, Wd=Wd, O=O, Tt=Tt, prec=DOT_PRECISION)
    out_shape = [jax.ShapeDtypeStruct((N8, n_out), jnp.float32)] * 2
    yr, yi = pl.pallas_call(
        kern,
        grid=(n_rows // Tt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # zs_re (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),          # zs_im
            pl.BlockSpec((N8, M8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # onehot
            pl.BlockSpec((N8, Wd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # E_re
            pl.BlockSpec((N8, Wd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # E_im
            t_spec,                                     # T (f32 | bf16 pair)
            pl.BlockSpec((N8, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # phase_w0
            pl.BlockSpec((N8, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # mod(omega S)
            pl.BlockSpec((N8, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # mod(64 omega S)
        ],
        out_specs=[
            pl.BlockSpec((N8, Tt * O), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N8, Tt * O), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((M8, (Tt - 1) * S + Wd), jnp.float32),
            pltpu.VMEM((M8, (Tt - 1) * S + Wd), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(zs_re, zs_im, onehot, E_re, E_im, T, pw0, a1, a64)
    return yr[:N], yi[:N]
