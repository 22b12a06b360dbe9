"""Fused route+NCO+resample Pallas kernel (ops/pallas/route.py): kernel ==
the gather + folded-XLA path, and the whole ReceiverPipeline(use_pallas) ==
the XLA pipeline, streaming, under the Pallas interpreter on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cubicsdr_tpu.ops.pallas.pfb as pfb_mod
import cubicsdr_tpu.ops.pallas.route as route_mod
from cubicsdr_tpu.ops.planar import PC, PLANAR
from cubicsdr_tpu.receiver import ReceiverPipeline, DemodGroupSpec


@pytest.fixture
def interp():
    pfb_mod.INTERPRET = True
    route_mod.INTERPRET = True
    yield
    pfb_mod.INTERPRET = False
    route_mod.INTERPRET = False


def test_kernel_matches_folded_xla_path(rng):
    from cubicsdr_tpu.ops.resample import (
        RationalResampler, planar_shifted_resample_matmul)
    from cubicsdr_tpu.ops.pallas.route import routed_shifted_resample_pallas
    M, N = 16, 24
    rs = RationalResampler(1, 5, batch_shape=(N,), dtype=PLANAR)
    Lc = 5 * 128 * 8 * 5
    z = rng.standard_normal((2, M, rs.hist_len + Lc)).astype(np.float32)
    chan_idx = rng.integers(0, M, N).astype(np.int32)
    omega = rng.uniform(-0.5, 0.5, N).astype(np.float32)
    phase0 = rng.uniform(0, 6.28, N).astype(np.float32)
    phase_w0 = np.mod(phase0 + omega * (rs.Q - rs.KK),
                      2 * np.pi).astype(np.float32)
    zg = z[:, chan_idx, :]
    ref = planar_shifted_resample_matmul(
        PC(jnp.asarray(zg[0]), jnp.asarray(zg[1])), rs,
        jnp.asarray(omega), jnp.asarray(phase_w0))
    yr, yi = routed_shifted_resample_pallas(
        jnp.asarray(z[0]), jnp.asarray(z[1]), jnp.asarray(chan_idx),
        jnp.asarray(omega), jnp.asarray(phase_w0), rs, interpret=True)
    np.testing.assert_allclose(np.asarray(ref.re), np.asarray(yr), atol=5e-5)
    np.testing.assert_allclose(np.asarray(ref.im), np.asarray(yi), atol=5e-5)


def test_pipeline_fused_route_matches_xla(interp, rng):
    """Full unified pipeline, use_pallas=True (fused channelizer AND fused
    route): streaming outputs must equal the XLA pipeline on the same
    blocks. This is the program bench.py runs on the chip."""
    fs = 8_000_000
    n_demods = 8
    specs = [DemodGroupSpec("FM", 200000, n_demods)]
    # 128-aligned block so both the PFBCH2 kernel and the fused-route tile
    # constraints hold (same rule bench.py uses).
    rx0 = ReceiverPipeline(fs, specs, dtype=PLANAR)
    m = int(np.lcm(rx0.group_block_multiple(0), rx0._decim * 128))
    L = 2 * m
    rx_p = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=True,
                            block_len=L)
    rx_x = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=False,
                            block_len=L)
    assert rx_p.fused_route == [True]
    assert rx_x.fused_route == [False]

    controls = rx_p.control_template()
    # Stations stay clear of the +-fs/2 wrap edge: a station straddling
    # the Nyquist boundary fades in and out of its channel and the FM
    # discriminator then amplifies 1e-6 frontend differences into O(1e-2)
    # audio chaos (inherent atan2 conditioning, not a numerics bug).
    freqs = np.asarray([((i % 14) - 7) * 500e3 + 20e3
                        for i in range(n_demods)], np.float32)
    controls[0]["frequency"] = freqs
    # Real FM stations on every demod frequency (demodulating pure noise
    # would amplify benign float differences through atan2 at near-zero
    # amplitudes); plus a little noise for realism.
    t = np.arange(3 * L) / fs
    iq_all = 0.02 * (rng.standard_normal(3 * L)
                     + 1j * rng.standard_normal(3 * L))
    for k, f0 in enumerate(freqs):
        msg = np.sin(2 * np.pi * (700.0 + 90.0 * k) * t)
        iq_all = iq_all + 0.5 * np.exp(
            1j * (2 * np.pi * f0 * t
                  + 2 * np.pi * 75e3 * np.cumsum(msg) / fs))
    iq_all = iq_all.astype(np.complex64)
    st_p, st_x = rx_p.init_state(), rx_x.init_state()
    for b in range(3):
        blk = iq_all[b * L:(b + 1) * L]
        iq = PC(jnp.asarray(blk.real), jnp.asarray(blk.imag))
        st_p, out_p = rx_p.apply(st_p, (iq, controls))
        st_x, out_x = rx_x.apply(st_x, (iq, controls))
        g_p, g_x = out_p["groups"][0], out_x["groups"][0]
        # The frontend tap is a LINEAR op: compare tightly.
        np.testing.assert_allclose(np.asarray(g_p["iq"].re),
                                   np.asarray(g_x["iq"].re),
                                   atol=3e-4, rtol=1e-3)
        # Audio comparisons are rms/quantile-based: at deep multi-station
        # fades the discriminator's atan2 is ill-conditioned, so a handful
        # of samples may amplify benign float differences.
        for a, b in ((out_p["mix"], out_x["mix"]),
                     (g_p["audio"], g_x["audio"])):
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert np.sqrt(np.mean(d * d)) < 2e-3, np.sqrt(np.mean(d * d))
            assert np.quantile(d, 0.995) < 5e-3
        np.testing.assert_allclose(np.asarray(g_p["level"]),
                                   np.asarray(g_x["level"]), atol=0.05)


def test_fused_route_retune_mid_stream(interp, rng):
    """Retunes are traced inputs: moving a demod (including across a
    channel boundary) between blocks must keep the fused pipeline equal to
    the XLA pipeline from the retune block on (fresh states — the fused
    path keeps per-CHANNEL history, the XLA path per-demod history; they
    agree when the history is consistent with the new channel)."""
    fs = 8_000_000
    specs = [DemodGroupSpec("FM", 200000, 4)]
    rx0 = ReceiverPipeline(fs, specs, dtype=PLANAR)
    m = int(np.lcm(rx0.group_block_multiple(0), rx0._decim * 128))
    L = m
    rx_p = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=True,
                            block_len=L)
    assert rx_p.fused_route == [True]
    controls = rx_p.control_template()
    controls[0]["frequency"] = np.asarray([-1500e3, -500e3, 20e3, 1500e3],
                                          np.float32)
    st = rx_p.init_state()
    blk = rng.standard_normal((2, L)).astype(np.float32)
    iq = PC(jnp.asarray(blk[0]), jnp.asarray(blk[1]))
    st, out1 = rx_p.apply(st, (iq, controls))
    # Retune demod 2 across a channel boundary — same compiled plan.
    controls[0]["frequency"] = np.asarray([-1500e3, -500e3, 1020e3, 1500e3],
                                          np.float32)
    st, out2 = rx_p.apply(st, (iq, controls))
    assert np.isfinite(np.asarray(out2["mix"])).all()
    a1 = np.asarray(out1["groups"][0]["audio"][2])
    a2 = np.asarray(out2["groups"][0]["audio"][2])
    assert not np.allclose(a1, a2)       # it actually moved


def test_sharded_fused_route_matches_unsharded(interp):
    """ShardedReceiver(use_pallas=True) rides the SAME fused kernel: one
    per-channel [M, hist] halo exchange replaces the per-demod halos, and
    the sharded farm still equals the unsharded pipeline."""
    from cubicsdr_tpu.ops.planar import from_complex
    from cubicsdr_tpu.parallel import make_receiver_mesh
    from cubicsdr_tpu.parallel.sharded import ShardedReceiver

    fs = 8_000_000
    mesh = make_receiver_mesh(n_time=4, n_chan=2,
                              devices=jax.devices()[:8])
    groups = [DemodGroupSpec("FM", 200000, 4)]
    rx = ShardedReceiver(fs, num_channels=16, groups=groups, mesh=mesh,
                         use_pallas=True)
    assert rx.fused_route == [True]
    pipe = ReceiverPipeline(fs, groups, chan_mode="pfbch2",
                            num_channels=16, dtype=PLANAR,
                            block_len=rx.block_len)
    controls = rx.control_template()
    freqs = np.asarray([-1480e3, -480e3, 520e3, 1520e3], np.float32)
    controls[0]["frequency"] = freqs

    t = np.arange(2 * rx.block_len) / fs
    iq_all = np.zeros(2 * rx.block_len, np.complex64)
    for k, f0 in enumerate(freqs):
        msg = np.sin(2 * np.pi * (700.0 + 90.0 * k) * t)
        iq_all = iq_all + (0.5 * np.exp(
            1j * (2 * np.pi * f0 * t
                  + 2 * np.pi * 75e3 * np.cumsum(msg) / fs))
        ).astype(np.complex64)

    step_s = rx.make_step()
    step_p = jax.jit(pipe.apply)
    st_s = rx.place_state(rx.init_state())
    st_p = pipe.init_state()
    for b in range(2):
        blk = iq_all[b * rx.block_len:(b + 1) * rx.block_len]
        st_s, out_s = step_s(st_s, rx.shard_iq(blk), controls)
        st_p, out_p = step_p(st_p, (from_complex(blk), controls))
        d = np.abs(np.asarray(out_s["mix"]) - np.asarray(out_p["mix"]))
        assert np.sqrt(np.mean(d * d)) < 3e-3
        assert np.quantile(d, 0.995) < 8e-3
        np.testing.assert_allclose(np.asarray(out_s["groups"][0]["level"]),
                                   np.asarray(out_p["groups"][0]["level"]),
                                   atol=0.05)


def test_plan_rebuild_carry_with_fused_frontend(interp, rng):
    """The rebuild state-carry must treat the fused frontend's per-CHANNEL
    tail ([M, hist], channel-indexed) as a verbatim carry while still
    porting per-demod rows — even when M equals a demod count."""
    from cubicsdr_tpu.app.webview import _carry_streaming_state
    from cubicsdr_tpu.receiver import DemodulatorMgr, plan_from_manager

    fs = 8_000_000
    mgr = DemodulatorMgr()
    d0 = mgr.new_demodulator(100e6 + 20e3, "FM", 200000)
    d1 = mgr.new_demodulator(100e6 + 520e3, "FM", 200000)
    specs, keyed_old = plan_from_manager(mgr)
    rx_old = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=True)
    assert rx_old.fused_route == [True]
    st_old = rx_old.init_state()

    # Stream one block so states carry real values.
    L = rx_old.block_len
    blk = rng.standard_normal((2, L)).astype(np.float32)
    from cubicsdr_tpu.receiver import controls_from_manager
    ctl = controls_from_manager(mgr, rx_old, keyed_old, 100e6)
    st_old, _ = rx_old.apply(st_old, (PC(jnp.asarray(blk[0]),
                                         jnp.asarray(blk[1])), ctl))

    # Add a third demod to the SAME group -> new plan, counts 2 -> 3.
    mgr.new_demodulator(100e6 - 480e3, "FM", 200000)
    specs, keyed_new = plan_from_manager(mgr)
    rx_new = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=True,
                              block_len=rx_old.block_len)
    st_new = _carry_streaming_state(rx_old, st_old, keyed_old,
                                    rx_new, keyed_new,
                                    rx_new.init_state())
    phase_o, hist_o, _ = st_old["groups"][0][0]   # frontend state
    phase_n, hist_n, _ = st_new["groups"][0][0]
    # Channel tail [M, hist]: carried VERBATIM (channel-indexed).
    np.testing.assert_array_equal(np.asarray(hist_n.re),
                                  np.asarray(hist_o.re))
    # Per-demod phases: surviving rows ported, the new row cold (0).
    np.testing.assert_array_equal(np.asarray(phase_n)[:2],
                                  np.asarray(phase_o))
    assert float(np.asarray(phase_n)[2]) == 0.0
    # And the rebuilt plan still runs.
    ctl2 = controls_from_manager(mgr, rx_new, keyed_new, 100e6)
    _, out = rx_new.apply(st_new, (PC(jnp.asarray(blk[0]),
                                      jnp.asarray(blk[1])), ctl2))
    assert np.isfinite(np.asarray(out["mix"])).all()


def test_carry_channel_tail_not_permuted_when_rows_equal_channels(rng):
    """Regression (round-3 advisor): with a fused frontend whose group has
    exactly M demods (M = channel count), a demod swap that reorders rows
    must NOT permute the per-CHANNEL [M, hist] tail — it is channel-indexed
    and carries verbatim (pipeline.group_state_row_mask tags it shared)."""
    from cubicsdr_tpu.app.webview import _carry_streaming_state
    from cubicsdr_tpu.receiver import (DemodulatorMgr, plan_from_manager)

    fs = 8_000_000                      # 16 channels @ 500 kHz spacing
    mgr = DemodulatorMgr()
    demods = [mgr.new_demodulator(100e6 + (i - 8) * 500e3 + 20e3,
                                  "FM", 200000) for i in range(16)]
    specs, keyed_old = plan_from_manager(mgr)
    rx_old = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=True)
    assert rx_old.fused_route == [True] and rx_old.M == 16
    assert len(list(keyed_old.values())[0]) == 16   # rows == channels

    # Fabricate distinguishable streaming state (no kernel run needed:
    # the carry logic is pure host bookkeeping).
    leaves, treedef = jax.tree.flatten(rx_old.init_state())
    st_old = jax.tree.unflatten(treedef, [
        jnp.asarray(rng.standard_normal(np.shape(x)).astype(
            np.asarray(x).dtype)) if np.asarray(x).dtype.kind == "f" else x
        for x in leaves])
    hist_o = st_old["groups"][0][0][1]
    phase_o = st_old["groups"][0][0][0]

    # Swap one demod: remove row 0, add a new station -> still 16 rows,
    # survivors shift up one row.
    mgr.delete_demodulator(demods[0])
    mgr.new_demodulator(100e6 + 7 * 500e3 + 120e3, "FM", 200000)
    specs, keyed_new = plan_from_manager(mgr)
    rx_new = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=True,
                              block_len=rx_old.block_len)
    st_new = _carry_streaming_state(rx_old, st_old, keyed_old,
                                    rx_new, keyed_new, rx_new.init_state())
    phase_n, hist_n, _ = st_new["groups"][0][0]
    # Channel tail: VERBATIM, not row-permuted.
    np.testing.assert_array_equal(np.asarray(hist_n.re),
                                  np.asarray(hist_o.re))
    np.testing.assert_array_equal(np.asarray(hist_n.im),
                                  np.asarray(hist_o.im))
    # Per-demod phase rows: survivors ported to their new rows.
    new_rows = list(keyed_new.values())[0]
    old_rows = list(keyed_old.values())[0]
    for nr, d in enumerate(new_rows):
        if d in old_rows:
            np.testing.assert_array_equal(
                np.asarray(phase_n)[nr],
                np.asarray(phase_o)[old_rows.index(d)])
