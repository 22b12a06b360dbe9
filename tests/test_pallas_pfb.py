"""Pallas fused PFBCH2 == reference jnp channelizer (interpret mode on CPU;
the compiled path runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from cubicsdr_tpu.ops.channelizer import ChannelizerPFB2
from cubicsdr_tpu.ops.pallas.pfb import pfbch2_planar_pallas


def test_pallas_pfb_matches_channelizer():
    M = 16
    ch = ChannelizerPFB2(M)
    rng = np.random.default_rng(0)
    L = M * 512
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)
         ).astype(np.complex64)
    # Reference: stateful complex channelizer from zero history.
    st, y_ref = ch.apply(ch.init_state(), jnp.asarray(x))
    y_ref = np.asarray(y_ref)

    hist = np.zeros(ch.hist_len, np.complex64)
    z = np.concatenate([hist, x])
    h_poly = np.asarray(ch.h_poly)
    yr, yi = pfbch2_planar_pallas(
        jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy()),
        h_poly, M, tile=256, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    np.testing.assert_allclose(got, y_ref, atol=2e-4)


def test_pallas_pfb_tile_independence():
    """Different tile sizes give identical results (halo windows correct)."""
    M = 8
    ch = ChannelizerPFB2(M)
    rng = np.random.default_rng(1)
    L = M * 256
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)
         ).astype(np.complex64)
    z = np.concatenate([np.zeros(ch.hist_len, np.complex64), x])
    h_poly = np.asarray(ch.h_poly)
    outs = []
    for tile in (64, 128, 512):
        yr, yi = pfbch2_planar_pallas(
            jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy()),
            h_poly, M, tile=tile, interpret=True)
        outs.append(np.asarray(yr) + 1j * np.asarray(yi))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)


def test_pallas_pfb_pad_path():
    """n_steps with no 128-multiple divisor exercises the zero-pad + slice
    fallback (the shape class that broke on real TPU lane tiling)."""
    M = 16
    ch = ChannelizerPFB2(M)
    rng = np.random.default_rng(2)
    n_steps = 1000          # = 2^3 * 125: no 128-multiple divisor
    L = n_steps * (M // 2)
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)
         ).astype(np.complex64)
    st, y_ref = ch.apply(ch.init_state(), jnp.asarray(x))
    z = np.concatenate([np.zeros(ch.hist_len, np.complex64), x])
    h_poly = np.asarray(ch.h_poly)
    from cubicsdr_tpu.ops.pallas.pfb import _pick_tile
    T, pad = _pick_tile(n_steps, tile=128)
    assert T == 128 and pad == 24
    yr, yi = pfbch2_planar_pallas(
        jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy()),
        h_poly, M, tile=128, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert got.shape == (M, n_steps)
    np.testing.assert_allclose(got, np.asarray(y_ref), atol=2e-4)


def test_pallas_pfb_sublane_padded_channel_counts():
    """D = M/2 that isn't a multiple of 8 — the channel counts REAL
    capture rates produce (M=6 at 2.4 MS/s, M=10 at 4.8 MS/s; numChannels
    = ceil(rate/500k) forced even, ref: src/sdr/SoapySDRThread.cpp:
    676-693) — runs through the kernel's sublane-padded layout and
    matches the XLA channelizer (round-4 hardware failure: 'Slice shape
    along dimension 0 must be aligned to tiling')."""
    rng = np.random.default_rng(3)
    for M in (2, 6, 10):
        ch = ChannelizerPFB2(M)
        n_steps = 512
        L = n_steps * (M // 2)
        x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)
             ).astype(np.complex64)
        st, y_ref = ch.apply(ch.init_state(), jnp.asarray(x))
        z = np.concatenate([np.zeros(ch.hist_len, np.complex64), x])
        yr, yi = pfbch2_planar_pallas(
            jnp.asarray(z.real.copy()), jnp.asarray(z.imag.copy()),
            np.asarray(ch.h_poly), M, tile=256, interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert got.shape == (M, n_steps)
        np.testing.assert_allclose(got, np.asarray(y_ref), atol=2e-4,
                                   err_msg=f"M={M}")


def test_small_channel_count_keeps_pallas():
    """The padded kernel stays enabled at the channel counts real capture
    rates produce — the flagship hot path must run in the flagship
    scenario (ref: src/sdr/SDRPostThread.cpp:406)."""
    from cubicsdr_tpu.ops.channelizer import ChannelizerPFB2
    from cubicsdr_tpu.ops.planar import PC, PLANAR
    import cubicsdr_tpu.ops.pallas.pfb as pfb
    for M in (6, 10, 16):
        ch = ChannelizerPFB2(M, dtype=PLANAR, use_pallas=True)
        assert ch.use_pallas, M
    # And the planar streaming path produces the right shapes through the
    # interpreter.
    ch = ChannelizerPFB2(6, dtype=PLANAR, use_pallas=True)
    pfb.INTERPRET, old = True, pfb.INTERPRET
    try:
        L = 32 * ch.D
        st, y = ch.apply(ch.init_state(),
                         PC(jnp.ones(L, jnp.float32),
                            jnp.zeros(L, jnp.float32)))
        assert y.re.shape == (6, L // ch.D)
    finally:
        pfb.INTERPRET = old
