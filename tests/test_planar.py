"""Planar (re/im planes) hot path == complex64 reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from cubicsdr_tpu.ops import planar as pl
from cubicsdr_tpu.receiver.planar_fm import PlanarFMFarm
from cubicsdr_tpu.ops.channelizer import ChannelizerPFB2, channel_centers
from cubicsdr_tpu.ops.freqdem import FreqDem
from cubicsdr_tpu.ops.nco import NCOMixer
from cubicsdr_tpu.ops.resample import RationalResampler, design_ratio


def test_planar_idft_matches_numpy():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((8, 16)) + 1j * rng.standard_normal((8, 16)))
    xp = pl.from_complex(x.T)        # [16, 8]: M axis at -2
    y = pl.pc_idft_m(xp)
    expect = 16 * np.fft.ifft(x, axis=-1).T
    np.testing.assert_allclose(pl.to_complex(y), expect, atol=1e-4)


def test_four_step_fft_matches_numpy():
    rng = np.random.default_rng(1)
    for (n1, n2) in [(16, 16), (32, 64)]:
        n = n1 * n2
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        y = pl.pc_fft_four_step(pl.from_complex(x), n1, n2)
        np.testing.assert_allclose(pl.to_complex(y), np.fft.fft(x),
                                   atol=2e-2)


def test_planar_farm_matches_complex_chain():
    fs, M, nd = 1_000_000, 8, 4
    farm = PlanarFMFarm(fs, M, nd, block_len=None)
    # small block for test speed; exact math for bit-level comparison
    farm2 = PlanarFMFarm(fs, M, nd, block_len=farm.block_multiple * 4,
                         fast_math=False)
    farm = farm2
    freqs = np.array([150e3, -300e3, 0.0, 420e3], np.float32)
    n_blocks = 3
    t = np.arange(n_blocks * farm.block_len) / fs
    msg = np.sin(2 * np.pi * 1000.0 * t)
    iq = (0.7 * np.exp(1j * (2 * np.pi * 150e3 * t
                             + 2 * np.pi * 75e3 * np.cumsum(msg) / fs))
          + 0.4 * np.exp(2j * np.pi * -300e3 * t)).astype(np.complex64)

    step = jax.jit(farm.step)
    state = farm.init_state()
    outs = []
    for b in range(n_blocks):
        blk = iq[b * farm.block_len:(b + 1) * farm.block_len]
        state, audio, mix, level = step(state, pl.from_complex(blk),
                                        jnp.asarray(freqs))
        outs.append(np.asarray(audio))
    audio = np.concatenate(outs, axis=-1)

    # Complex reference chain per demod.
    ch = ChannelizerPFB2(M)
    centers = channel_centers(M, fs)
    chan_rate = 2 * fs / M
    P1, Q1 = design_ratio(200e3 / chan_rate, 500)
    P2, Q2 = design_ratio(48e3 / 200e3, 500)
    for di in range(2):
        ci = int(np.argmin(np.abs(freqs[di] - centers)))
        nco = NCOMixer()
        rs1 = RationalResampler(P1, Q1)
        fd = FreqDem(0.5)
        rs2 = RationalResampler(P2, Q2, dtype=jnp.float32)
        st = (ch.init_state(), nco.init_state(), rs1.init_state(),
              fd.init_state(), rs2.init_state())
        omega = 2 * np.pi * (centers[ci] - freqs[di]) / chan_rate
        outs_ref = []
        for b in range(n_blocks):
            blk = jnp.asarray(iq[b * farm.block_len:(b + 1) * farm.block_len])
            s0, chans = ch.apply(st[0], blk)
            s1, y = nco.apply(st[1], (chans[ci], omega))
            s2, y = rs1.apply(st[2], y)
            s3, a = fd.apply(st[3], y)
            s4, a48 = rs2.apply(st[4], a)
            st = (s0, s1, s2, s3, s4)
            outs_ref.append(np.asarray(a48))
        ref = np.concatenate(outs_ref)
        np.testing.assert_allclose(audio[di], ref, atol=2e-3)


def test_fast_math_snr_unchanged():
    """fast_math (outer phasor + poly atan2) must not cost measurable SNR."""
    fs, M, nd = 1_000_000, 8, 2
    f0, fa = 150e3, 1000.0
    results = {}
    for fast in (False, True):
        farm = PlanarFMFarm(fs, M, nd, block_len=None, fast_math=fast)
        farm = PlanarFMFarm(fs, M, nd, block_len=farm.block_multiple * 60,
                            fast_math=fast)
        n = 6 * farm.block_len
        t = np.arange(n) / fs
        msg = np.sin(2 * np.pi * fa * t)
        iq = np.exp(1j * (2 * np.pi * f0 * t
                          + 2 * np.pi * 75e3 * np.cumsum(msg) / fs)
                    ).astype(np.complex64)
        freqs = np.zeros(nd, np.float32)
        freqs[0] = f0
        step = jax.jit(farm.step)
        st = farm.init_state()
        outs = []
        for b in range(6):
            st, audio, mix, lvl = step(
                st, pl.from_complex(iq[b * farm.block_len:
                                       (b + 1) * farm.block_len]),
                jnp.asarray(freqs))
            outs.append(np.asarray(audio[0]))
        a = np.concatenate(outs)[2400:]
        w = np.hanning(len(a))
        spec = np.abs(np.fft.rfft((a - a.mean()) * w)) ** 2
        fr = np.fft.rfftfreq(len(a), 1 / 48000)
        sig = (fr > fa - 40) & (fr < fa + 40)
        noise = ~sig & (fr > 50) & (fr < 15000)
        results[fast] = 10 * np.log10(spec[sig].sum() / spec[noise].sum())
    assert results[True] > results[False] - 0.2, results
