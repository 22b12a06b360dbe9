"""PlanarReceiver — mixed-modem farm on the planar TPU hot path.

Generalizes PlanarFMFarm to heterogeneous demod groups (BASELINE config #4:
"16-channel polyphase channelizer + mixed FM/AM demod farm on one chip"):
one shared PFBCH2 channelizer feeds per-group batched planar demodulators.

Planar demod kinds (ref chains in src/modules/modem/analog/):
  fm / nbfm : phase-difference discriminator (ModemFM.cpp:36)
  am        : envelope + FIR DC block + block AGC (ModemAM.cpp:40-48)
  usb / lsb : one-sided complex-tap FIR -> Re (ModemUSB.cpp:52-60)
  dsb       : block squaring carrier recovery product detect (ModemDSB.cpp)
  iq        : passthrough at the audio rate

Each group has its own bandwidth/resamplers; all groups must land on the
same audio block length (guaranteed when every group's rational chain is
exact, checked at construction).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cubicsdr_tpu.ops import design
from cubicsdr_tpu.ops.channelizer import _polyphase, channel_centers
from cubicsdr_tpu.ops.planar import (
    PC, pc_abs, pc_concat, pc_conv, pc_idft_m, pc_mul, pc_mul_conj, pc_take,
    pc_zeros, phasor_ramp_outer, fast_atan2, conv_real)
from cubicsdr_tpu.ops.resample import RationalResampler, design_ratio
from cubicsdr_tpu.receiver.planar_fm import planar_resample_matmul

TWO_PI = 2.0 * np.pi


@dataclass(frozen=True)
class PlanarGroup:
    kind: str                 # fm | nbfm | am | usb | lsb | dsb
    bandwidth: int
    count: int


class _PlanarDemod:
    """Per-group planar demodulator: state_init() + demod(state, PC y) ->
    (state, audio[N, L]) at the group bandwidth rate."""

    def __init__(self, kind: str, bandwidth: float, count: int,
                 fast_math: bool = True):
        self.kind = kind
        self.count = count
        self.bandwidth = bandwidth
        atan2 = fast_atan2 if fast_math else jnp.arctan2
        if kind in ("fm", "nbfm"):
            self._atan2 = atan2
        elif kind == "am":
            n = 51
            lp = design.kaiser_lowpass(n, 0.004, 30.0)
            lp = lp / lp.sum()
            h = -lp
            h[(n - 1) // 2] += 1.0
            self.h_dc = jnp.asarray(h)
        elif kind in ("usb", "lsb"):
            taps_len = min(257, design.kaiser_filter_len(
                max(200.0 / bandwidth, 0.002), 60.0) | 1)
            h = design.ssb_bandpass(taps_len, bandwidth, bandwidth,
                                    upper=(kind == "usb"))
            h = np.asarray(h)
            self.h_re = jnp.asarray(h.real.astype(np.float32))
            self.h_im = jnp.asarray(h.imag.astype(np.float32))
            self.k = len(h)
        elif kind == "dsb":
            pass
        else:
            raise ValueError(kind)

    def state_init(self):
        n = self.count
        if self.kind in ("fm", "nbfm"):
            return PC(jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32))
        if self.kind == "am":
            return (pc_zeros((n, self.h_dc.shape[0] - 1)).re,
                    jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
                    jnp.ones(n, jnp.float32))
        if self.kind in ("usb", "lsb"):
            return pc_zeros((n, self.k - 1))
        if self.kind == "dsb":
            return jnp.zeros((n, 2), jnp.float32)
        return ()

    def demod(self, st, y: PC):
        if self.kind in ("fm", "nbfm"):
            zb = pc_concat([PC(st.re[:, None], st.im[:, None]), y])
            d = pc_mul_conj(zb.slice_last(slice(1, None)),
                            zb.slice_last(slice(0, -1)))
            audio = self._atan2(d.im, d.re) * np.float32(1.0 / np.pi)
            last = y.slice_last(slice(-1, None))
            return PC(last.re[:, 0], last.im[:, 0]), audio
        if self.kind == "am":
            h_hist, ceil_prev, ma, maa = st
            env = pc_abs(y)
            z = jnp.concatenate([h_hist, env], axis=-1)
            a = conv_real(z[:, None, :], self.h_dc[None, :])[:, 0, :]
            # block AGC (ModemAnalog autoGain semantics)
            ma = ma + (ceil_prev - ma) * 0.025
            maa = maa + (ma - maa) * 0.025
            ceil = jnp.max(a, axis=-1)
            a = a * (0.5 / jnp.maximum(maa, 1e-9))[:, None]
            new = (z[:, z.shape[-1] - (self.h_dc.shape[0] - 1):],
                   ceil, ma, maa)
            return new, a
        if self.kind in ("usb", "lsb"):
            z = pc_concat([st, y])
            # Re{x * h_complex}: re*hr - im*hi
            ar = conv_real(z.re[:, None, :], self.h_re[None, :])[:, 0, :]
            ai = conv_real(z.im[:, None, :], self.h_im[None, :])[:, 0, :]
            audio = ar - ai
            new = z.slice_last(slice(z.shape[-1] - (self.k - 1), None))
            return new, audio
        if self.kind == "dsb":
            m2r = jnp.mean(y.re * y.re - y.im * y.im, axis=-1)
            m2i = jnp.mean(2 * y.re * y.im, axis=-1)
            vec = jnp.stack([m2r, m2i], axis=-1)
            c2 = st + (vec - st) * 0.2
            phi2 = fast_atan2(c2[..., 1], c2[..., 0])
            rot = PC(jnp.cos(-0.5 * phi2)[:, None],
                     jnp.sin(-0.5 * phi2)[:, None])
            return c2, pc_mul(y, rot).re
        raise ValueError(self.kind)


class PlanarReceiver:
    def __init__(self, sample_rate: float, num_channels: int,
                 groups: list[PlanarGroup], audio_rate: int = 48_000,
                 block_len: int | None = None, fast_math: bool = True,
                 use_pallas: bool = False):
        self.fast_math = fast_math
        self.use_pallas = use_pallas
        self.sample_rate = float(sample_rate)
        self.M = int(num_channels)
        self.D = self.M // 2
        self.groups = list(groups)
        self.audio_rate = audio_rate
        self.chan_rate = 2.0 * sample_rate / self.M

        h = np.asarray(design.pfb_prototype(self.M, 8, 60.0))
        self.h_poly = jnp.asarray(_polyphase(h, self.M))
        self.J = self.h_poly.shape[1]
        kk = np.arange(self.M)
        c = np.exp(-2j * np.pi * kk * (self.D - 1) / self.M)
        self.c_pc = PC(jnp.asarray(c.real.astype(np.float32))[:, None],
                       jnp.asarray(c.imag.astype(np.float32))[:, None])
        self.hist_len = (2 * self.J - 1) * self.D
        self.centers = jnp.asarray(
            channel_centers(self.M, sample_rate), jnp.float32)

        # Per-group resamplers + block-multiple solve.
        self.demods = []
        self.fe_rs = []
        self.au_rs = []
        m = self.D * 2
        for g in self.groups:
            P1, Q1 = design_ratio(g.bandwidth / self.chan_rate, 500)
            P2, Q2 = design_ratio(audio_rate / g.bandwidth, 500)
            self.fe_rs.append(RationalResampler(P1, Q1))
            self.au_rs.append(RationalResampler(P2, Q2, dtype=jnp.float32))
            self.demods.append(_PlanarDemod(g.kind, g.bandwidth, g.count,
                                            fast_math))
            t = Q2 // np.gcd(P1, Q2)
            m = int(np.lcm(m, self.D * Q1 * t))
        self.block_multiple = m
        # Default block ~1M samples, 128-step aligned for the fused Pallas
        # channelizer when that keeps the block near 1M (see planar_fm.py).
        mp = int(np.lcm(m, self.D * 128))
        if block_len is None:
            base = mp if mp <= (1 << 21) else m
            block_len = max(base, ((1 << 20) // base) * base)
        self.block_len = block_len
        assert self.block_len % m == 0
        self.chan_len = self.block_len // self.D
        assert self.chan_len % 2 == 0
        audio_lens = set()
        for rs1, rs2 in zip(self.fe_rs, self.au_rs):
            d_len = self.chan_len // rs1.Q * rs1.P
            audio_lens.add(d_len // rs2.Q * rs2.P)
        assert len(audio_lens) == 1, (
            f"groups disagree on audio length: {audio_lens}")
        self.audio_len = audio_lens.pop()
        s_par = (np.arange(self.chan_len) % 2).astype(np.float32)
        k_par = (kk % 2).astype(np.float32)
        self._flip = jnp.asarray(1.0 - 2.0 * np.outer(k_par, s_par))
        self.n_demods = sum(g.count for g in self.groups)

    def init_state(self):
        return {
            "h_chan": pc_zeros(self.hist_len),
            "groups": tuple(
                {"phase": jnp.zeros(g.count, jnp.float32),
                 "h_fe": pc_zeros((g.count, rs1.hist_len)),
                 "demod": dm.state_init(),
                 "h_au": jnp.zeros((g.count, rs2.hist_len), jnp.float32)}
                for g, rs1, rs2, dm in zip(self.groups, self.fe_rs,
                                           self.au_rs, self.demods)),
        }

    def _channelize(self, h_chan: PC, iq: PC):
        z = pc_concat([h_chan, iq])
        if self.use_pallas:
            from cubicsdr_tpu.ops.pallas.pfb import pfbch2_planar_pallas
            cr, ci = pfbch2_planar_pallas(z.re, z.im,
                                          np.asarray(self.h_poly), self.M)
            new_h = z.slice_last(slice(z.shape[-1] - self.hist_len, None))
            return new_h, PC(cr, ci)
        n_total = (z.shape[-1] - self.M) // self.D + 1

        def frames(plane):
            A = plane[: (n_total + 1) * self.D].reshape(-1, self.D)
            w = jnp.concatenate([A[:-1], A[1:]], axis=-1)
            return jnp.swapaxes(w[..., ::-1], -1, -2)

        G = PC(frames(z.re), frames(z.im))
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
        y = pc_idft_m(u, axis_m=-2)
        ch = pc_mul(y, self.c_pc)
        ch = PC(ch.re * self._flip, ch.im * self._flip)
        new_h = z.slice_last(slice(z.shape[-1] - self.hist_len, None))
        return new_h, ch

    def step(self, state, iq: PC, freqs_per_group):
        """freqs_per_group: list of [count] arrays (Hz offsets from center).
        Returns (state, audio list [count, C?, audio_len], mix, levels list).
        """
        new_h_chan, chans = self._channelize(state["h_chan"], iq)
        new_groups = []
        audios = []
        levels = []
        for gi, (g, rs1, rs2, dm) in enumerate(
                zip(self.groups, self.fe_rs, self.au_rs, self.demods)):
            gst = state["groups"][gi]
            freqs = jnp.asarray(freqs_per_group[gi], jnp.float32)
            dist = jnp.abs(freqs[:, None] - self.centers[None, :])
            ci = jnp.argmin(dist, axis=-1)
            xs = pc_take(chans, ci, axis=-2)
            omega = TWO_PI * (self.centers[ci] - freqs) / self.chan_rate
            rot = phasor_ramp_outer(gst["phase"], omega, self.chan_len)
            xs = pc_mul(xs, rot)
            new_phase = jnp.mod(gst["phase"] + omega * self.chan_len,
                                TWO_PI)
            xh = pc_concat([gst["h_fe"], xs])
            yb = planar_resample_matmul(xh, rs1)
            new_h_fe = xh.slice_last(
                slice(xh.shape[-1] - rs1.hist_len, None))
            dst, audio = dm.demod(gst["demod"], yb)
            ah = jnp.concatenate([gst["h_au"], audio], axis=-1)
            a48 = planar_resample_matmul(ah, rs2)
            new_h_au = ah[..., ah.shape[-1] - rs2.hist_len:]
            audios.append(a48)
            levels.append(20.0 * jnp.log10(jnp.maximum(
                jnp.mean(jnp.abs(a48), axis=-1), 1e-20)))
            new_groups.append({"phase": new_phase, "h_fe": new_h_fe,
                               "demod": dst, "h_au": new_h_au})
        mix = sum(jnp.sum(a, axis=0) for a in audios)
        return ({"h_chan": new_h_chan, "groups": tuple(new_groups)},
                audios, mix, levels)
