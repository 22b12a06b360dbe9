"""Runtime modem-settings editing (ref: src/ModemProperties.cpp:1-299
generated properties panel; schema surface src/modules/modem/Modem.h:
141-146): REST reads the typed ModemArg schema and writes onto a LIVE
demod, rebuilding the compiled plan with state carry — untouched demods'
audio never glitches."""

import numpy as np
import jax.numpy as jnp
import pytest

from cubicsdr_tpu.io.sources import SyntheticSource, Station
from cubicsdr_tpu.ops.planar import PC, PLANAR
from cubicsdr_tpu.receiver import (
    DemodulatorMgr, ReceiverPipeline, plan_from_manager,
    controls_from_manager)

FS = 1_000_000


def _viewer(mgr, keyed, rx, controls, center=100e6):
    from cubicsdr_tpu.app.runner import LiveReceiver
    from cubicsdr_tpu.app.webview import WebViewer
    lr = LiveReceiver(rx, controls, iter([]), center_freq=center,
                      waterfall_fft=256, waterfall_lines=8)
    return lr, WebViewer(lr, mgr, keyed, port=0)    # never started: direct


def test_settings_schema_and_validation():
    mgr = DemodulatorMgr()
    mgr.new_demodulator(100e6 + 200e3, "FM", 200000)
    mgr.new_demodulator(100e6 - 300e3, "FSK", 19200)
    specs, keyed = plan_from_manager(mgr)
    rx = ReceiverPipeline(FS, specs, dtype=PLANAR)
    lr, viewer = _viewer(mgr, keyed, rx,
                         controls_from_manager(mgr, rx, keyed, 100e6))

    # Schema surface: FSK exposes bps/sps/bw as typed args with ranges.
    sch = viewer.modem_settings_json(1)
    assert sch["ok"] and sch["type"] == "FSK"
    keys = {a["key"]: a for a in sch["schema"]}
    assert keys["bps"]["type"] == "int" and keys["bps"]["low"] == 1
    assert "sps" in keys and "bw" in keys

    # Validation: unknown key, bad type, out-of-range all rejected.
    assert not viewer.control({"action": "modem_settings", "index": 1,
                               "settings": {"nope": 1}})["ok"]
    assert not viewer.control({"action": "modem_settings", "index": 1,
                               "settings": {"bps": "xyz"}})["ok"]
    assert not viewer.control({"action": "modem_settings", "index": 1,
                               "settings": {"bps": 99}})["ok"]
    assert not viewer.control({"action": "modem_settings", "index": 1,
                               "settings": {}})["ok"]
    # Index bounds on the GET surface.
    assert not viewer.modem_settings_json(7)["ok"]


def test_flip_fsk_bps_and_fms_demph_mid_stream():
    """The VERDICT item-3 acceptance: flip FSK bps and FMS demph on a
    RUNNING receiver; the untouched FM demod's audio continues exactly
    as if no rebuild happened (state carry), and the edited settings are
    live in the new compiled plan."""
    fm = (100e6 + 200e3, "FM", 200000)
    fms = (100e6 - 200e3, "FMS", 200000)
    fsk = (100e6 + 400e3, "FSK", 19200)

    # One block size valid for every plan in this test.
    from cubicsdr_tpu.receiver import DemodGroupSpec
    L = ReceiverPipeline(
        FS, [DemodGroupSpec("FM", 200000, 1),
             DemodGroupSpec("FMS", 200000, 1),
             DemodGroupSpec("FSK", 19200, 1)], dtype=PLANAR).block_len

    src = SyntheticSource(FS, L, [Station(200e3, "fm", audio_freq=800.0),
                                  Station(-200e3, "fm", audio_freq=400.0),
                                  Station(400e3, "tone")])
    blocks = [next(src) for _ in range(6)]

    def fm_audio(out, gi):
        return np.asarray(out["groups"][gi]["audio"][0])

    # --- reference: never-rebuilt FM-only pipeline ---
    mgr_a = DemodulatorMgr()
    mgr_a.new_demodulator(*fm)
    specs, keyed_a = plan_from_manager(mgr_a)
    rx_a = ReceiverPipeline(FS, specs, dtype=PLANAR, block_len=L)
    ctl_a = controls_from_manager(mgr_a, rx_a, keyed_a, 100e6)
    st = rx_a.init_state()
    ref = []
    for b in blocks:
        st, out = rx_a.apply(st, (PC(jnp.asarray(b.real),
                                     jnp.asarray(b.imag)), ctl_a))
        ref.append(fm_audio(out, 0))

    # --- live run: FM + FMS + FSK, settings flipped after block 3 ---
    mgr = DemodulatorMgr()
    d_fm = mgr.new_demodulator(*fm)
    mgr.new_demodulator(*fms)
    mgr.new_demodulator(*fsk)
    specs, keyed = plan_from_manager(mgr)
    rx = ReceiverPipeline(FS, specs, dtype=PLANAR, block_len=L)
    lr, viewer = _viewer(mgr, keyed, rx,
                         controls_from_manager(mgr, rx, keyed, 100e6))

    def group_of(type_name):
        return next(gi for gi, g in enumerate(lr.pipeline.groups)
                    if g.modem_name == type_name)

    got, fsk_before, fsk_after = [], [], []
    for i, b in enumerate(blocks):
        if i == 3:
            r = viewer.control({"action": "modem_settings", "index": 2,
                                "settings": {"bps": 2}})
            assert r["ok"] and r["settings"]["bps"] == 2
            r = viewer.control({"action": "modem_settings", "index": 1,
                                "settings": {"demph": 50}})
            assert r["ok"] and r["settings"]["demph"] == 50
            assert lr.pipeline.block_len == L       # pinned size survives
            # The edited settings are part of the NEW compiled plan.
            g_fsk = lr.pipeline.groups[group_of("FSK")]
            assert dict(g_fsk.settings)["bps"] == 2
            g_fms = lr.pipeline.groups[group_of("FMS")]
            assert dict(g_fms.settings)["demph"] == 50
        iq = PC(jnp.asarray(b.real), jnp.asarray(b.imag))
        lr.state, out = lr.step(lr.state, (iq, lr.controls))
        got.append(fm_audio(out, group_of("FM")))
        syms = np.asarray(out["groups"][group_of("FSK")]["symbols"][0])
        (fsk_after if i >= 3 else fsk_before).append(syms)

    # Untouched FM demod: audio continuous through BOTH rebuilds
    # (tolerance covers XLA fusion-order float noise between programs).
    for i in (3, 4, 5):
        np.testing.assert_allclose(got[i], ref[i], rtol=0, atol=2e-3)
    # Sanity: the carried state mattered — a cold restart at block 3
    # diverges from the reference.
    st_cold = rx_a.init_state()
    _, out_cold = rx_a.apply(
        st_cold, (PC(jnp.asarray(blocks[3].real),
                     jnp.asarray(blocks[3].imag)), ctl_a))
    assert not np.allclose(fm_audio(out_cold, 0), ref[3], atol=2e-3)
    # bps flip is live: 4-ary symbols appear (bps=2 => symbols in 0..3).
    assert max(s.max() for s in fsk_after) > 1
    assert max(s.max() for s in fsk_before) <= 1
    assert np.isfinite(got[-1]).all()
