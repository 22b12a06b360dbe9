"""Mixed-modem planar receiver (BASELINE config #4 shape): FM + AM + SSB
groups share one channelizer; each recovers its message."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cubicsdr_tpu.ops import planar as pl
from cubicsdr_tpu.receiver.planar_rx import PlanarReceiver, PlanarGroup


def tone_snr(a, f0, fs, fmax=15000):
    a = a - a.mean()
    w = np.hanning(len(a))
    spec = np.abs(np.fft.rfft(a * w)) ** 2
    fr = np.fft.rfftfreq(len(a), 1 / fs)
    sig = (fr > f0 - 40) & (fr < f0 + 40)
    noise = ~sig & (fr > 50) & (fr < fmax)
    return 10 * np.log10(spec[sig].sum() / max(spec[noise].sum(), 1e-30))


def test_mixed_fm_am_farm():
    # Reference channel sizing: spacing >= 500 kHz (numChannels =
    # ceil(rate/500k)) so a 200 kHz FM signal fits its channel even
    # off-center (ref: src/sdr/SoapySDRThread.cpp:676-693).
    fs, M = 2_000_000, 4
    rxp = PlanarReceiver(fs, M, [
        PlanarGroup("fm", 200000, 2),
        PlanarGroup("am", 6000, 1),
    ], block_len=None)
    rxp = PlanarReceiver(fs, M, rxp.groups,
                         block_len=rxp.block_multiple
                         * max(1, 60000 // rxp.block_multiple))
    f_fm0, f_fm1, f_am = 300e3, -500e3, 150e3
    n_blocks = max(int(0.7 * fs / rxp.block_len), 6)
    n = n_blocks * rxp.block_len
    t = np.arange(n) / fs
    fm0 = np.exp(1j * (2 * np.pi * f_fm0 * t + 2 * np.pi * 75e3
                       * np.cumsum(np.sin(2 * np.pi * 1000 * t)) / fs))
    fm1 = np.exp(1j * (2 * np.pi * f_fm1 * t + 2 * np.pi * 75e3
                       * np.cumsum(np.sin(2 * np.pi * 2000 * t)) / fs))
    am = (1 + 0.8 * np.sin(2 * np.pi * 700 * t)) * np.exp(
        2j * np.pi * f_am * t)
    iq = (0.7 * fm0 + 0.7 * fm1 + 0.5 * am).astype(np.complex64)

    freqs = [np.asarray([f_fm0, f_fm1], np.float32),
             np.asarray([f_am], np.float32)]
    step = jax.jit(rxp.step)
    st = rxp.init_state()
    outs = {0: [], 1: []}
    for b in range(n_blocks):
        blk = iq[b * rxp.block_len:(b + 1) * rxp.block_len]
        st, audios, mix, levels = step(st, pl.from_complex(blk), freqs)
        outs[0].append(np.asarray(audios[0]))
        outs[1].append(np.asarray(audios[1]))
    fm_audio = np.concatenate(outs[0], axis=-1)
    am_audio = np.concatenate(outs[1], axis=-1)
    assert tone_snr(fm_audio[0, 9600:], 1000, 48000) > 25
    assert tone_snr(fm_audio[1, 9600:], 2000, 48000) > 25
    assert tone_snr(am_audio[0, 19200:], 700, 48000) > 20


def test_planar_ssb_group():
    fs, M = 1_000_000, 8
    rxp = PlanarReceiver(fs, M, [PlanarGroup("usb", 5400, 1)],
                         block_len=None)
    rxp = PlanarReceiver(fs, M, rxp.groups,
                         block_len=rxp.block_multiple
                         * max(1, 50000 // rxp.block_multiple))
    f_sta = 200e3
    n_blocks = 8
    n = n_blocks * rxp.block_len
    t = np.arange(n) / fs
    # USB voice stand-in: tone at +900 Hz above carrier.
    iq = np.exp(2j * np.pi * (f_sta + 900.0) * t).astype(np.complex64)
    freqs = [np.asarray([f_sta], np.float32)]
    step = jax.jit(rxp.step)
    st = rxp.init_state()
    outs = []
    for b in range(n_blocks):
        blk = iq[b * rxp.block_len:(b + 1) * rxp.block_len]
        st, audios, mix, levels = step(st, pl.from_complex(blk), freqs)
        outs.append(np.asarray(audios[0][0]))
    a = np.concatenate(outs)[9600:]
    assert tone_snr(a, 900.0, 48000, fmax=20000) > 25
