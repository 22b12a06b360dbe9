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
