"""Modem bank behavioral tests: each modem recovers its message from a
synthesized signal at its default rate (the framework's replacement for the
reference's delegate-to-liquid correctness, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cubicsdr_tpu.modems import make_modem, modem_names


def tone_snr(audio, f0, fs, guard=30.0, fmax=None):
    a = audio - audio.mean()
    w = np.hanning(len(a))
    spec = np.abs(np.fft.rfft(a * w)) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / fs)
    sig = (freqs > f0 - guard) & (freqs < f0 + guard)
    fmax = fmax or fs / 2 - 100
    noise = ~sig & (freqs > 50) & (freqs < fmax)
    return 10 * np.log10(spec[sig].sum() / max(spec[noise].sum(), 1e-30))


def run_kit(kit, x, n_blocks=8):
    s = kit.init_state()
    outs = []
    for blk in np.asarray(x).reshape(n_blocks, -1):
        s, y = kit.apply(s, jnp.asarray(blk))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def test_registry_has_all_analog_modems():
    names = set(modem_names("analog"))
    assert {"FM", "NBFM", "FMS", "AM", "DSB", "USB", "LSB", "CW",
            "I/Q"} <= names


def test_fm_tone():
    m = make_modem("FM")
    fs = m.default_sample_rate
    n = 25 * 8192
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 1e3 * t)
    x = np.exp(1j * 2 * np.pi * 75e3 * np.cumsum(msg) / fs)
    audio = run_kit(m.build_kit(fs), x.astype(np.complex64))[0]
    assert tone_snr(audio[4800:], 1e3, 48000) > 50


def test_nbfm_tone():
    m = make_modem("NBFM")
    fs = m.check_sample_rate(m.default_sample_rate, 48000)
    n = m.block_multiple(fs) * 4096
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 800.0 * t)
    x = np.exp(1j * 2 * np.pi * 2.5e3 * np.cumsum(msg) / fs)
    audio = run_kit(m.build_kit(fs), x.astype(np.complex64), 4)[0]
    assert tone_snr(audio[4800:], 800.0, 48000) > 40


def test_am_tone():
    m = make_modem("AM")
    fs = 6000
    n = m.block_multiple(fs) * 2048 * 4
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 600.0 * t)
    x = ((1.0 + 0.8 * msg) * np.exp(1j * 0.3)).astype(np.complex64)
    audio = run_kit(m.build_kit(fs), x, 4)[0]
    a = audio[9600:]
    assert tone_snr(a, 600.0, 48000) > 40
    # autoGain drives the ceiling toward 0.5.
    assert 0.2 < np.abs(a).max() < 0.8


@pytest.mark.parametrize("name,sign", [("USB", +1), ("LSB", -1)])
def test_ssb_rejects_opposite_sideband(name, sign):
    m = make_modem(name)
    fs = m.check_sample_rate(5400, 48000)
    n = m.block_multiple(fs) * 2048
    t = np.arange(n) / fs
    # In-band tone on the wanted side, another on the unwanted side.
    want = np.exp(sign * 2j * np.pi * 900.0 * t)
    unwanted = np.exp(-sign * 2j * np.pi * 1700.0 * t)
    audio_w = run_kit(m.build_kit(fs), want.astype(np.complex64), 4)[0]
    audio_u = run_kit(m.build_kit(fs), unwanted.astype(np.complex64), 4)[0]
    snr_w = tone_snr(audio_w[9600:], 900.0, 48000)
    assert snr_w > 30
    # Unwanted sideband content must be suppressed.
    pw_w = np.mean(audio_w[9600:] ** 2)
    pw_u = np.mean(audio_u[9600:] ** 2)
    assert 10 * np.log10(pw_u / pw_w) < -30


def test_cw_beep():
    m = make_modem("CW")
    fs = m.check_sample_rate(m.default_sample_rate, 48000)
    n = m.block_multiple(fs) * 512
    x = np.ones(n, np.complex64)           # carrier at DC
    audio = run_kit(m.build_kit(fs), x, 4)[0]
    assert tone_snr(audio[4800:], 650.0, 48000) > 30


def test_iq_passthrough():
    m = make_modem("I/Q")
    fs = m.check_sample_rate(123456, 48000)
    assert fs == 48000
    x = (np.arange(256) + 1j * np.arange(256, 512)).astype(np.complex64)
    kit = m.build_kit(fs)
    _, audio = kit.apply(kit.init_state(), jnp.asarray(x))
    audio = np.asarray(audio)
    np.testing.assert_allclose(audio[0], x.imag)   # left = imag
    np.testing.assert_allclose(audio[1], x.real)   # right = real


def test_dsb_product_detect():
    m = make_modem("DSB")
    fs = m.check_sample_rate(5400, 48000)
    n = m.block_multiple(fs) * 2048
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 700.0 * t)
    # Suppressed carrier with a small static phase offset.
    x = (msg * np.exp(1j * 0.4)).astype(np.complex64)
    audio = run_kit(m.build_kit(fs), x, 4)[0]
    assert tone_snr(audio[9600:], 700.0, 48000) > 30


def test_fm_stereo_separation():
    m = make_modem("FMS")
    fs = m.check_sample_rate(200000, 48000)
    n = m.block_multiple(fs) * 8192
    t = np.arange(n) / fs
    L = np.sin(2 * np.pi * 1000.0 * t)
    R = np.zeros_like(L)
    mono = 0.45 * (L + R)
    sub = 0.45 * (L - R) * np.sin(2 * np.pi * 38000.0 * t)
    pilot = 0.1 * np.sin(2 * np.pi * 19000.0 * t)
    msg = mono + pilot + sub
    x = np.exp(1j * 2 * np.pi * 75e3 * np.cumsum(msg) / fs)
    audio = run_kit(m.build_kit(fs), x.astype(np.complex64), 8)
    assert audio.shape[0] == 2
    aL, aR = audio[0, 19200:], audio[1, 19200:]
    pL, pR = np.mean(aL ** 2), np.mean(aR ** 2)
    sep = 10 * np.log10(pL / pR)
    # Tone was sent on LEFT only: want >= 15 dB separation.
    assert sep > 15, f"stereo separation {sep:.1f} dB (L={pL:.2e} R={pR:.2e})"
    assert tone_snr(aL, 1000.0, 48000, fmax=15000) > 25
