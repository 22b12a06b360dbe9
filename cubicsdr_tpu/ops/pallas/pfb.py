"""Fused PFBCH2 polyphase filter-bank analyzer as a Pallas TPU kernel.

One kernel per time tile fuses what the XLA path materializes in HBM between
stages (frames -> polyphase FIR -> M-point DFT -> per-channel phase/parity):
the IQ planes are read ONCE from HBM into VMEM, everything else stays
on-chip, and only the channel outputs go back. The DFT is a [M, M] x [M, T]
MXU matmul against the (c_k-folded) planar DFT matrix.

Mosaic-friendly layout: the host reshapes each plane to [D, rows] with TIME
on the lane axis (rows = one D-sample hop each); the kernel then builds the
M-tap analysis window as a sublane concat of two lane-shifted slices — no
in-kernel reshape, reverse, or transpose (none of which lower to TPU). The
window reversal is folded into the host-precomputed taps/DFT rows.

Matches ChannelizerPFB2 planar numerics exactly (see
tests/test_pallas_pfb.py). Grid: i over tiles of T output steps; program i
DMAs rows [i*T, i*T + T + 2J - 1) — the overlap is the filter history halo,
the same samples the time-sharded version exchanges over ICI.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(z_re_hbm, z_im_hbm, h_ref, wr_ref, wi_ref,
            out_re, out_im, scratch_re, scratch_im, sem,
            *, T: int, D: int, J: int, M: int, n_rows_dma: int,
            whole: bool):
    i = pl.program_id(0)

    # HBM->VMEM DMA slices must be 128-aligned along lanes, so the copy
    # window is padded up to n_rows_dma (the FIR only reads the first
    # T + 2J - 2 + 1 columns); whole-array copy when there is one tile.
    def src(ref):
        return ref if whole else ref.at[:, pl.ds(i * T, n_rows_dma)]

    cp_re = pltpu.make_async_copy(src(z_re_hbm), scratch_re, sem.at[0])
    cp_im = pltpu.make_async_copy(src(z_im_hbm), scratch_im, sem.at[1])
    cp_re.start()
    cp_im.start()
    cp_re.wait()
    cp_im.wait()

    def channelize(A, shift, h_half):
        # A: [D, n_rows]. The M-tap window for step s is rows s (upper half,
        # rho < D) and s+1 (lower half) — handled as two D-row FIRs summed
        # through split DFT matmuls below, so no sublane concat of
        # differently-lane-shifted slices (Mosaic can't relayout that).
        acc = None
        for j in range(J):           # polyphase FIR: J shifted FMAs
            s0 = 2 * (J - 1 - j) + shift
            term = A[:, s0: s0 + T] * h_half[:, j][:, None]
            acc = term if acc is None else acc + term
        return acc                   # [D, T]

    h_up, h_lo = h_ref[:D], h_ref[D:]
    uu_re = channelize(scratch_re[:], 0, h_up)
    ul_re = channelize(scratch_re[:], 1, h_lo)
    uu_im = channelize(scratch_im[:], 0, h_up)
    ul_im = channelize(scratch_im[:], 1, h_lo)

    # M-point DFT as planar matmuls (c_k and reversal folded into W rows),
    # split into upper/lower window halves: y = W[:, :D] uu + W[:, D:] ul.
    wru, wrl = wr_ref[:, :D], wr_ref[:, D:]
    wiu, wil = wi_ref[:, :D], wi_ref[:, D:]

    def dft(wm, a, b):
        # HIGHEST: one-pass-bf16 (the MXU default) injects ~-45 dB noise
        # into every channel — unacceptable on the signal path.
        hp = jax.lax.Precision.HIGHEST
        return (jnp.dot(wm[0], a, preferred_element_type=jnp.float32,
                        precision=hp)
                + jnp.dot(wm[1], b, preferred_element_type=jnp.float32,
                          precision=hp))

    y_re = (dft((wru, wrl), uu_re, ul_re) - dft((wiu, wil), uu_im, ul_im))
    y_im = (dft((wru, wrl), uu_im, ul_im) + dft((wiu, wil), uu_re, ul_re))

    # (-1)^{k*s} parity flip (T is even and tiles start at even s).
    s_par = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % 2
    k_par = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % 2
    sign = jnp.where((s_par * k_par) == 1, -1.0, 1.0).astype(jnp.float32)
    out_re[:] = y_re * sign
    out_im[:] = y_im * sign


def _pick_tile(n_steps: int, tile: int) -> tuple[int, int]:
    """Pick (T, pad_steps): T even, and either T == n_steps (single whole
    block) or T a multiple of 128 dividing the (padded) step count."""
    if n_steps <= tile and n_steps % 2 == 0:
        return n_steps, 0
    top = max(128, tile - tile % 128)
    for T in range(top, 127, -128):
        if n_steps % T == 0:
            return T, 0
    return top, (-n_steps) % top


# Tests flip this to run the kernel under the Pallas interpreter on CPU.
INTERPRET = False


def pfbch2_planar_pallas(z_re, z_im, h_poly, M: int,
                         tile: int = 2048, interpret: bool = False):
    """z planes [hist + L] (hist = (2J-1)*D) -> channel planes [M, L//D].

    h_poly: [M, J] float32 prototype branches. Returns (chans_re, chans_im).

    Sublane padding: Mosaic's f32 tiling needs every sublane slice length
    to be a multiple of 8, but real capture rates give D = M/2 that isn't
    (M=6 at 2.4 MS/s, M=10 at 4.8 MS/s — numChannels = ceil(rate/500k)
    forced even, ref: src/sdr/SoapySDRThread.cpp:676-693). The kernel
    therefore runs on D and M padded up to the 8-row tile: the stream
    planes gain Dp-D zero sublanes, the polyphase taps and DFT columns
    gain matching zero rows/columns (zero taps x zero data contribute
    nothing), and the Mp-M dead output channels are sliced off at the
    end. When D%8 == 0 the padding is empty and the layout is unchanged.
    """
    interpret = interpret or INTERPRET
    D = M // 2
    Dp = -(-D // 8) * 8                  # sublane-padded branch count
    Mp = -(-M // 8) * 8                  # sublane-padded channel count
    J = h_poly.shape[1]
    hist = (2 * J - 1) * D
    L = z_re.shape[-1] - hist
    assert L % D == 0
    n_steps = L // D
    # TPU lane tiling: an output block (Mp, T) needs T % 128 == 0 unless
    # the block covers the whole array (T == n_steps). Prefer a
    # 128-multiple divisor of n_steps; otherwise zero-pad the tail tile
    # and slice it off.
    T, pad = _pick_tile(n_steps, tile)
    grid = ((n_steps + pad) // T,)
    whole = grid[0] == 1
    # DMA window, rounded up to the 128-lane tiling (except whole-array).
    pad_rows = 0 if whole else (-(T + 2 * J - 1)) % 128
    n_rows_dma = T + 2 * J - 1 + pad_rows
    if pad or pad_rows:
        z_re = jnp.pad(z_re, (0, (pad + pad_rows) * D))
        z_im = jnp.pad(z_im, (0, (pad + pad_rows) * D))

    # [D, rows]: one XLA transpose in HBM so the kernel sees time on
    # lanes; zero sublanes fill D..Dp.
    rows = (n_steps + pad) + 2 * J - 1 + pad_rows
    z2_re = z_re.reshape(rows, D).T
    z2_im = z_im.reshape(rows, D).T
    if Dp != D:
        z2_re = jnp.pad(z2_re, ((0, Dp - D), (0, 0)))
        z2_im = jnp.pad(z2_im, ((0, Dp - D), (0, 0)))

    k = np.arange(M)
    c = np.exp(-2j * np.pi * k * (D - 1) / M)
    W = np.exp(2j * np.pi * np.outer(k, k) / M) * c[:, None]
    # Fold the window reversal (rho -> M-1-rho) into the constants: the
    # kernel then reads samples in natural order (no in-kernel `rev`).
    W = W[:, ::-1]
    h_rev = np.asarray(h_poly)[::-1]
    # Padded layouts: taps as [2*Dp, J] halves (upper rows 0..D, lower
    # rows Dp..Dp+D), DFT as [Mp, 2*Dp] with the M-1-rho column split
    # relocated to the padded half boundary.
    h_pad = np.zeros((2 * Dp, J), np.float32)
    h_pad[:D] = h_rev[:D]
    h_pad[Dp:Dp + D] = h_rev[D:]
    w_r = np.zeros((Mp, 2 * Dp), np.float32)
    w_i = np.zeros((Mp, 2 * Dp), np.float32)
    w_r[:M, :D], w_r[:M, Dp:Dp + D] = W.real[:, :D], W.real[:, D:]
    w_i[:M, :D], w_i[:M, Dp:Dp + D] = W.imag[:, :D], W.imag[:, D:]
    wr = jnp.asarray(np.ascontiguousarray(w_r))
    wi = jnp.asarray(np.ascontiguousarray(w_i))

    kern = partial(_kernel, T=T, D=Dp, J=J, M=Mp, n_rows_dma=n_rows_dma,
                   whole=whole)
    out_shape = [jax.ShapeDtypeStruct((Mp, n_steps + pad), jnp.float32)] * 2
    cr, ci = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # z2_re (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # z2_im
            pl.BlockSpec((2 * Dp, J), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # h (reversed, padded)
            pl.BlockSpec((Mp, 2 * Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # Wr
            pl.BlockSpec((Mp, 2 * Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # Wi
        ],
        out_specs=[
            pl.BlockSpec((Mp, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Dp, n_rows_dma), jnp.float32),
            pltpu.VMEM((Dp, n_rows_dma), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(z2_re, z2_im, jnp.asarray(h_pad), wr, wi)
    if pad or Mp != M:
        cr, ci = cr[:M, :n_steps], ci[:M, :n_steps]
    return cr, ci
