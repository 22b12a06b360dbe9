"""PlanarFMFarm — the single-chip TPU hot path (benchmark flagship).

The same chain as ReceiverPipeline's FM plan (PFBCH2 channelize -> route ->
NCO -> resample -> FM discriminator -> audio resample -> mix) expressed in
planar complex (ops/planar.py): all-real elementwise math, convs, and an
MXU matmul for the channelizer DFT. Numerically identical to the complex64
path (tests/test_planar.py) and the representation the TPU actually runs.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from cubicsdr_tpu.ops import design
from cubicsdr_tpu.ops.channelizer import _polyphase, channel_centers
from cubicsdr_tpu.ops.planar import (
    PC, pc_concat, pc_conv, pc_idft_m, pc_mul, pc_mul_conj, pc_take,
    pc_zeros, phasor, pc_arctan2, conv_real, phasor_ramp_outer, fast_atan2)
from cubicsdr_tpu.ops.resample import (
    RationalResampler, design_ratio, planar_rational_resample,
    planar_resample_matmul)

TWO_PI = 2.0 * np.pi

# Back-compat alias (the helpers now live in ops/resample.py).
_planar_rational_resample = planar_rational_resample


class PlanarFMFarm:
    def __init__(self, sample_rate: float, num_channels: int, n_demods: int,
                 bandwidth: float = 200_000.0, audio_rate: int = 48_000,
                 block_len: int | None = None, fast_math: bool = True,
                 use_pallas: bool = False):
        # fast_math: outer-product NCO phasor (2*sqrt(L) transcendentals
        # instead of 2L; differential phase error ~1e-7/sample) and
        # polynomial atan2 (max err 2.4e-7 rad). Both are >40 dB below the
        # chain's 60 dB design floor; the exact forms remain available.
        # use_pallas: fused filter-bank kernel (ops/pallas/pfb.py) instead
        # of the XLA reshape/FMA/matmul pipeline for the channelizer.
        self.fast_math = fast_math
        self.use_pallas = use_pallas
        self.sample_rate = float(sample_rate)
        self.M = int(num_channels)
        self.D = self.M // 2
        self.n_demods = int(n_demods)
        self.chan_rate = 2.0 * sample_rate / self.M
        P1, Q1 = design_ratio(bandwidth / self.chan_rate, 500)
        self.fe_rs = RationalResampler(P1, Q1)
        P2, Q2 = design_ratio(audio_rate / bandwidth, 500)
        self.au_rs = RationalResampler(P2, Q2, dtype=jnp.float32)
        self.bandwidth = float(bandwidth)
        self.audio_rate = audio_rate

        m = self.D * 2
        m = int(np.lcm(m, self.D * Q1))
        t = Q2 // np.gcd(P1, Q2)
        m = int(np.lcm(m, self.D * Q1 * t))
        self.block_multiple = m
        # Default block: ~1M samples, and (when that stays near 1M) also a
        # multiple of D*128 so chan_len is 128-step tileable for the fused
        # Pallas channelizer (TPU lane tiling wants T % 128 == 0).
        mp = int(np.lcm(m, self.D * 128))
        if block_len is None:
            base = mp if mp <= (1 << 21) else m
            block_len = max(base, ((1 << 20) // base) * base)
        self.block_len = block_len
        assert self.block_len % m == 0
        self.chan_len = self.block_len // self.D
        self.demod_len = self.chan_len // Q1 * P1
        self.audio_len = self.demod_len // Q2 * P2
        self.centers = jnp.asarray(
            channel_centers(self.M, sample_rate), jnp.float32)

        # Channelizer constants in planar form — designed in pure numpy.
        # (No complex jnp arrays may be created: the tunneled TPU backend
        # rejects complex64 even for constants, poisoning the process.)
        h = np.asarray(design.pfb_prototype(self.M, 8, 60.0))
        self.h_poly = jnp.asarray(_polyphase(h, self.M))  # [M, J]
        self.J = self.h_poly.shape[1]
        kk = np.arange(self.M)
        c = np.exp(-2j * np.pi * kk * (self.D - 1) / self.M)
        self.c_pc = PC(jnp.asarray(c.real.astype(np.float32))[:, None],
                       jnp.asarray(c.imag.astype(np.float32))[:, None])
        self.hist_len = (2 * self.J - 1) * self.D
        # chan_len even => the global step parity pattern repeats identically
        # every block, so the (-1)^{k*s} flip needs no carried parity state.
        assert self.chan_len % 2 == 0
        s_par = (np.arange(self.chan_len) % 2).astype(np.float32)
        k_par = (np.arange(self.M) % 2).astype(np.float32)
        self._flip = jnp.asarray(1.0 - 2.0 * np.outer(k_par, s_par))

    def init_state(self):
        nd = self.n_demods
        return {
            "h_chan": pc_zeros(self.hist_len),
            "phase": jnp.zeros(nd, jnp.float32),
            "h_fe": pc_zeros((nd, self.fe_rs.hist_len)),
            "prev_fd": PC(jnp.ones(nd, jnp.float32),
                          jnp.zeros(nd, jnp.float32)),
            "h_au": jnp.zeros((nd, self.au_rs.hist_len), jnp.float32),
        }

    def step(self, state, iq: PC, freqs: jax.Array):
        """iq: PC of shape [block_len]; freqs: [n_demods] Hz offsets.
        Returns (state, audio[n_demods, audio_len], mix[audio_len],
        level[n_demods])."""
        # ---- channelize (PFBCH2, planar) ----
        z = pc_concat([state["h_chan"], iq])
        new_h_chan = z.slice_last(slice(z.shape[-1] - self.hist_len, None))
        if self.use_pallas:
            # Fused filter-bank kernel: one HBM read of z, everything else
            # stays in VMEM (ops/pallas/pfb.py).
            from cubicsdr_tpu.ops.pallas.pfb import pfbch2_planar_pallas
            cr, ci_ = pfbch2_planar_pallas(z.re, z.im,
                                           np.asarray(self.h_poly), self.M)
            chans = PC(cr, ci_)
        else:
            # Reversed stride-D windows of length M ending at each step:
            # G[s, rho] = z[s*D + D-1 - rho] for s in [0, n_total).
            # Gather-free framing: windows of length M = 2D at stride D are
            # two adjacent D-rows of the reshaped stream (a [n_total, M]
            # index gather at 1M-sample blocks stalls the TPU compiler).
            n_total = (z.shape[-1] - self.M) // self.D + 1

            def frames(plane):
                A = plane[: (n_total + 1) * self.D].reshape(-1, self.D)
                w = jnp.concatenate([A[:-1], A[1:]], axis=-1)
                return jnp.swapaxes(w[..., ::-1], -1, -2)   # [M, n_total]

            G = PC(frames(z.re), frames(z.im))
            if self.fast_math:
                # Depthwise dilated conv as an unrolled shifted-FMA loop:
                # J=8 broadcast multiply-adds over [M, T] beat the
                # grouped-conv lowering (16 groups of 1 channel sit idle).
                n_steps = G.re.shape[-1] - 2 * (self.J - 1)
                hp = np.asarray(self.h_poly)

                def fir(plane):
                    acc = None
                    for j in range(self.J):
                        s0 = 2 * (self.J - 1 - j)
                        term = plane[..., s0: s0 + n_steps] \
                            * jnp.asarray(hp[:, j])[:, None]
                        acc = term if acc is None else acc + term
                    return acc

                u = PC(fir(G.re), fir(G.im))
            else:
                u = pc_conv(G, self.h_poly, dilation=2, groups=self.M)
            y = pc_idft_m(u, axis_m=-2)                    # [M, chan_len]
            chans = pc_mul(y, self.c_pc)
            chans = PC(chans.re * self._flip, chans.im * self._flip)

        # ---- route + NCO ----
        dist = jnp.abs(freqs[:, None] - self.centers[None, :])
        ci = jnp.argmin(dist, axis=-1)
        xs = pc_take(chans, ci, axis=-2)                   # [N, Lc]
        omega = TWO_PI * (self.centers[ci] - freqs) / self.chan_rate
        if self.fast_math:
            rot = phasor_ramp_outer(state["phase"], omega, self.chan_len)
        else:
            k = jnp.arange(self.chan_len, dtype=jnp.float32)
            theta = jnp.mod(state["phase"][:, None]
                            + omega[:, None] * k[None, :], TWO_PI)
            rot = phasor(theta)
        xs = pc_mul(xs, rot)
        new_phase = jnp.mod(state["phase"] + omega * self.chan_len, TWO_PI)

        # ---- resample to bandwidth ----
        resample = (planar_resample_matmul if self.fast_math
                    else _planar_rational_resample)
        xh = pc_concat([state["h_fe"], xs])
        yb = resample(xh, self.fe_rs)                      # [N, demod_len]
        new_h_fe = xh.slice_last(
            slice(xh.shape[-1] - self.fe_rs.hist_len, None))

        # ---- FM discriminator ----
        zb = pc_concat([PC(state["prev_fd"].re[:, None],
                           state["prev_fd"].im[:, None]), yb])
        d = pc_mul_conj(zb.slice_last(slice(1, None)),
                        zb.slice_last(slice(0, -1)))
        atan2 = fast_atan2 if self.fast_math else jnp.arctan2
        audio = atan2(d.im, d.re) * np.float32(1.0 / np.pi)   # kf = 0.5
        new_prev = yb.slice_last(slice(-1, None))
        new_prev = PC(new_prev.re[:, 0], new_prev.im[:, 0])

        # ---- audio resample ----
        ah = jnp.concatenate([state["h_au"], audio], axis=-1)
        audio48 = resample(ah, self.au_rs)
        new_h_au = ah[..., ah.shape[-1] - self.au_rs.hist_len:]

        # ---- mix + level ----
        mix = jnp.sum(audio48, axis=0)
        level = 20.0 * jnp.log10(
            jnp.maximum(jnp.mean(jnp.abs(audio48), axis=-1), 1e-20))

        new_state = {"h_chan": new_h_chan, "phase": new_phase,
                     "h_fe": new_h_fe, "prev_fd": new_prev,
                     "h_au": new_h_au}
        return new_state, audio48, mix, level
