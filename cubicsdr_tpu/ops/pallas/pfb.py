"""Fused PFBCH2 polyphase filter-bank analyzer as a Pallas TPU kernel.

One kernel per time tile fuses what the XLA path materializes in HBM between
stages (frames -> polyphase FIR -> M-point DFT -> per-channel phase/parity):
the IQ planes are read ONCE from HBM into VMEM, everything else stays
on-chip, and only the channel outputs go back. The DFT is a [M, M] x [M, T]
MXU matmul against the (c_k-folded) planar DFT matrix.

Matches ChannelizerPFB2 / PlanarFMFarm._channelize numerics exactly (see
tests/test_pallas_pfb.py). Grid: i over tiles of T output steps; program i
DMAs z[i*T*D : i*T*D + (T + 2J - 1) * D] (the overlap is the filter
history halo — same samples the time-sharded version exchanges over ICI).
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
            *, T: int, D: int, J: int, M: int):
    i = pl.program_id(0)
    win = (T + 2 * J - 1) * D

    # DMA this tile's overlapped window (both planes) into VMEM.
    cp_re = pltpu.make_async_copy(
        z_re_hbm.at[pl.ds(i * T * D, win)], scratch_re, sem.at[0])
    cp_im = pltpu.make_async_copy(
        z_im_hbm.at[pl.ds(i * T * D, win)], scratch_im, sem.at[1])
    cp_re.start()
    cp_im.start()
    cp_re.wait()
    cp_im.wait()

    n_rows = T + 2 * J - 1          # D-sample rows in the window

    def channelize(plane):
        A = plane.reshape(n_rows, D)
        # Window s = rows s, s+1 concatenated then reversed: G [n_win, M].
        w = jnp.concatenate([A[:-1], A[1:]], axis=-1)[:, ::-1]
        G = w.T                      # [M, n_win], n_win = T + 2(J-1)
        # Polyphase FIR: J shifted FMAs along time.
        acc = None
        for j in range(J):
            s0 = 2 * (J - 1 - j)
            term = G[:, s0: s0 + T] * h_ref[:, j][:, None]
            acc = term if acc is None else acc + term
        return acc                   # [M, T]

    u_re = channelize(scratch_re[:])
    u_im = channelize(scratch_im[:])

    # M-point DFT as planar matmuls (c_k already folded into W rows).
    wr = wr_ref[:]
    wi = wi_ref[:]
    y_re = (jnp.dot(wr, u_re, preferred_element_type=jnp.float32)
            - jnp.dot(wi, u_im, preferred_element_type=jnp.float32))
    y_im = (jnp.dot(wr, u_im, preferred_element_type=jnp.float32)
            + jnp.dot(wi, u_re, preferred_element_type=jnp.float32))

    # (-1)^{k*s} parity flip (T is even and tiles start at even s).
    s_par = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % 2
    k_par = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % 2
    sign = jnp.where((s_par * k_par) == 1, -1.0, 1.0).astype(jnp.float32)
    out_re[:] = y_re * sign
    out_im[:] = y_im * sign


def pfbch2_planar_pallas(z_re, z_im, h_poly, M: int,
                         tile: int = 2048, interpret: bool = False):
    """z planes [hist + L] (hist = (2J-1)*D) -> channel planes [M, L//D].

    h_poly: [M, J] float32 prototype branches. Returns (chans_re, chans_im).
    """
    D = M // 2
    J = h_poly.shape[1]
    hist = (2 * J - 1) * D
    L = z_re.shape[-1] - hist
    assert L % D == 0
    n_steps = L // D
    T = min(tile, n_steps)
    while n_steps % T:
        T //= 2
    assert T % 2 == 0 and n_steps % T == 0
    grid = (n_steps // T,)

    k = np.arange(M)
    c = np.exp(-2j * np.pi * k * (D - 1) / M)
    W = np.exp(2j * np.pi * np.outer(k, k) / M) * c[:, None]
    wr = jnp.asarray(W.real.astype(np.float32))
    wi = jnp.asarray(W.imag.astype(np.float32))

    win = (T + 2 * J - 1) * D
    kern = partial(_kernel, T=T, D=D, J=J, M=M)
    out_shape = [jax.ShapeDtypeStruct((M, n_steps), jnp.float32)] * 2
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # z_re (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # z_im
            pl.BlockSpec((M, J), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # h_poly
            pl.BlockSpec((M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # Wr
            pl.BlockSpec((M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # Wi
        ],
        out_specs=[
            pl.BlockSpec((M, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((win,), jnp.float32),
            pltpu.VMEM((win,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(z_re, z_im, jnp.asarray(h_poly), wr, wi)
