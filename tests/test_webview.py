"""WebViewer: the headless UI analog (ref: src/AppFrame.*, src/visual/
WaterfallCanvas.cpp mouse/hotkey surface) served over stdlib HTTP.

One live server fixture per module (compile cost), per-endpoint tests —
an early failure in one surface doesn't mask the rest."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from cubicsdr_tpu.io.sources import SyntheticSource, Station
from cubicsdr_tpu.ops.planar import PLANAR
from cubicsdr_tpu.receiver import (
    DemodulatorMgr, ReceiverPipeline, plan_from_manager,
    controls_from_manager)

FS = 1_000_000


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


class _Harness:
    def __init__(self):
        from cubicsdr_tpu.app.runner import LiveReceiver
        from cubicsdr_tpu.app.webview import WebViewer
        from cubicsdr_tpu.io.devices import SDRDeviceInfo

        self.mgr = DemodulatorMgr()
        self.mgr.new_demodulator(100e6 + 200e3, "FM", 200000)
        specs, keyed = plan_from_manager(self.mgr)
        # Production representation: planar (the TPU path) — webview/runner
        # must never construct complex64 device arrays.
        rx = ReceiverPipeline(FS, specs, dtype=PLANAR)
        controls = controls_from_manager(self.mgr, rx, keyed, 100e6)
        harness = self

        class _Src:
            def __iter__(self):
                src = SyntheticSource(
                    FS, harness.lr.pipeline.block_len,
                    [Station(200e3, "fm", audio_freq=800.0)])
                while not harness.done.is_set():
                    yield next(src)

        self.done = threading.Event()
        self.lr = LiveReceiver(rx, controls, _Src(),
                               center_freq=100e6, waterfall_fft=256,
                               waterfall_lines=32)
        self.dev = SDRDeviceInfo("synthetic=0", "Synth", "synthetic",
                                 gains={"LNA": (0.0, 40.0),
                                        "VGA": (0.0, 20.0)})
        self.viewer = WebViewer(self.lr, self.mgr, keyed, port=0,
                                device_info=self.dev).start()
        self.port = self.viewer.port
        self.lr.start_producer()
        self.lr.run_blocks(max_blocks=3)

    def run(self, n=2):
        self.lr.run_blocks(max_blocks=n)

    def stop(self):
        self.done.set()
        self.lr.stop()
        self.viewer.stop()


@pytest.fixture(scope="module")
def hx():
    h = _Harness()
    yield h
    h.stop()


def test_index_page(hx):
    assert b"cubicsdr_tpu" in _get(hx.port, "/")


def test_state(hx):
    st = json.loads(_get(hx.port, "/api/state"))
    assert st["center_freq"] == 100e6
    assert st["sample_rate"] == FS
    assert st["demods"][0]["type"] == "FM"
    assert st["demods"][0]["level"] != 0.0     # on_block hook ran
    assert "default" in st["themes"]


def test_spectrum_and_waterfall(hx):
    sp = json.loads(_get(hx.port, "/api/spectrum"))
    assert len(sp["points"]) == 256
    png = _get(hx.port, "/api/waterfall.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_control_set_and_tune(hx):
    # Control surface: mute + retune are traced inputs (no recompile).
    assert _post(hx.port, "/api/control",
                 {"action": "set", "index": 0, "key": "mute",
                  "value": True})["ok"]
    assert hx.mgr.get_demodulators()[0].muted
    assert _post(hx.port, "/api/control",
                 {"action": "set", "index": 0, "key": "mute",
                  "value": False})["ok"]
    assert _post(hx.port, "/api/control",
                 {"action": "tune", "freq": 100.1e6})["ok"]
    assert hx.lr.center_freq == 100.1e6
    _post(hx.port, "/api/control", {"action": "tune", "freq": 100e6})


def test_tune_snap_and_nudge(hx):
    # Snap-to-step tuning (ref: AppFrame snap) + digit-bar stepping
    # (ref: src/visual/TuningCanvas.cpp).
    assert _post(hx.port, "/api/control",
                 {"action": "tune", "freq": 100.013e6,
                  "snap": 25e3})["ok"]
    assert hx.lr.center_freq == 100.025e6
    assert _post(hx.port, "/api/control",
                 {"action": "nudge", "index": None,
                  "delta_hz": -25e3})["ok"]
    assert hx.lr.center_freq == 100e6
    f0 = hx.mgr.get_demodulators()[0].frequency
    assert _post(hx.port, "/api/control",
                 {"action": "nudge", "index": 0, "delta_hz": 1e3})["ok"]
    assert hx.mgr.get_demodulators()[0].frequency == f0 + 1e3
    _post(hx.port, "/api/control",
          {"action": "nudge", "index": 0, "delta_hz": -1e3})


def test_theme(hx):
    assert _post(hx.port, "/api/control",
                 {"action": "theme", "name": "jet"})["ok"]
    assert hx.lr.waterfall.theme_name == "jet"


def test_demod_view_spectrum(hx):
    assert _post(hx.port, "/api/control",
                 {"action": "view", "index": 0})["ok"]
    hx.run(2)
    dv = json.loads(_get(hx.port, "/api/demod_spectrum"))
    assert dv["index"] == 0 and len(dv["points"]) == hx.lr.demod_view_fft


def test_zoom_view(hx):
    assert _post(hx.port, "/api/control",
                 {"action": "zoom", "offset": 200e3,
                  "bandwidth": 250e3})["ok"]
    hx.run(6)
    sp = json.loads(_get(hx.port, "/api/spectrum"))
    assert sp["zoom"]["bandwidth"] == 250e3
    assert len(sp["zoom"]["points"]) == 256
    assert _post(hx.port, "/api/control",
                 {"action": "zoom", "offset": None})["ok"]


def test_plan_swap_add_remove(hx):
    # Plan change: add a second demod -> new compiled plan swaps in and
    # further blocks run (the async worker-thread rebuild analog).
    assert _post(hx.port, "/api/control",
                 {"action": "add", "freq": 100e6 - 200e3,
                  "type": "AM", "bandwidth": 10000})["ok"]
    assert len(hx.mgr.get_demodulators()) == 2
    hx.run(2)
    st = json.loads(_get(hx.port, "/api/state"))
    assert len(st["demods"]) == 2
    assert _post(hx.port, "/api/control",
                 {"action": "remove", "index": 1})["ok"]
    assert len(hx.mgr.get_demodulators()) == 1
    hx.run(1)


def test_unknown_action_is_an_error_not_500(hx):
    r = _post(hx.port, "/api/control", {"action": "bogus"})
    assert not r["ok"]


def test_scope(hx):
    sc = json.loads(_get(hx.port, "/api/scope?mode=2Y"))
    assert sc["mode"] == "2Y" and len(sc["traces"]) == 2


def test_audio_stream(hx):
    t = threading.Thread(target=hx.run, args=(4,), daemon=True)
    t.start()
    with urllib.request.urlopen(
            f"http://127.0.0.1:{hx.port}/api/audio.wav", timeout=15) as rsp:
        head = rsp.read(44 + 9600)
    t.join(timeout=20)
    assert head[:4] == b"RIFF" and head[8:12] == b"WAVE"
    pcm = np.frombuffer(head[44:], "<i2")
    assert np.abs(pcm).max() > 0       # tone present in the mix


def test_session_roundtrip(hx, tmp_path):
    sp_path = str(tmp_path / "sess.json")
    assert _post(hx.port, "/api/session", {"op": "save", "path": sp_path})["ok"]
    assert _post(hx.port, "/api/session", {"op": "load", "path": sp_path})["ok"]
    assert len(hx.mgr.get_demodulators()) == 1


def test_bookmarks_crud_and_recents(hx, tmp_path):
    # New demods land in recents ("add" earlier in the module pushed one).
    b = json.loads(_get(hx.port, "/api/bookmarks"))
    assert any(e["demod_type"] == "AM" for e in b["recents"])
    # Bookmark the live demod, move it across groups, activate a copy.
    assert _post(hx.port, "/api/bookmarks",
                 {"op": "add", "index": 0, "group": "Air"})["ok"]
    assert _post(hx.port, "/api/bookmarks",
                 {"op": "move", "from": "Air", "i": 0, "to": "Marine"})["ok"]
    b = json.loads(_get(hx.port, "/api/bookmarks"))
    assert [e["demod_type"] for e in b["groups"]["Marine"]] == ["FM"]
    assert b["groups"]["Air"] == []
    n0 = len(hx.mgr.get_demodulators())
    assert _post(hx.port, "/api/bookmarks",
                 {"op": "activate", "group": "Marine", "i": 0})["ok"]
    assert len(hx.mgr.get_demodulators()) == n0 + 1
    hx.run(1)
    _post(hx.port, "/api/control",
          {"action": "remove", "index": n0})   # restore plan
    # Ranges.
    assert _post(hx.port, "/api/bookmarks",
                 {"op": "range_add", "label": "2m", "start": 144e6,
                  "end": 148e6})["ok"]
    assert _post(hx.port, "/api/bookmarks", {"op": "range_activate",
                                             "i": 0})["ok"]
    assert hx.lr.center_freq == 146e6
    _post(hx.port, "/api/control", {"action": "tune", "freq": 100e6})
    # Persistence with the .backup chain.
    path = str(tmp_path / "bm.json")
    assert _post(hx.port, "/api/bookmarks", {"op": "save", "path": path})["ok"]
    assert _post(hx.port, "/api/bookmarks", {"op": "load", "path": path})["ok"]
    b = json.loads(_get(hx.port, "/api/bookmarks"))
    assert "Marine" in b["groups"]


def test_gain_stages(hx):
    g = json.loads(_get(hx.port, "/api/gains"))
    assert {s["name"] for s in g["stages"]} == {"LNA", "VGA"}
    assert g["agc"] is True
    # Slider drag: persists to DeviceConfig, clamps to caps, drops AGC.
    r = _post(hx.port, "/api/gains", {"name": "LNA", "value": 99.0})
    assert r["ok"] and r["value"] == 40.0
    g = json.loads(_get(hx.port, "/api/gains"))
    assert g["agc"] is False
    assert {s["name"]: s["value"] for s in g["stages"]}["LNA"] == 40.0
    assert _post(hx.port, "/api/gains", {"agc": True})["agc"] is True


def test_devices_listing(hx):
    d = json.loads(_get(hx.port, "/api/devices"))
    assert d["current"] == "synthetic=0"
    assert any(dev["device_id"] == "synthetic=0" for dev in d["devices"])


def test_digital_console_live_feed(hx):
    """A digital demod in the live plan streams its sliced symbols into the
    per-demod console, readable over /api/console (ref: DemodulatorInstance
    .cpp:658-689, src/forms/DigitalConsole)."""
    assert _post(hx.port, "/api/control",
                 {"action": "add", "freq": 100e6 + 200e3,
                  "type": "BPSK", "bandwidth": 20000})["ok"]
    hx.run(3)
    c = json.loads(_get(hx.port, "/api/console?index=1&view=text"))
    assert len(c["text"]) > 0
    ch = json.loads(_get(hx.port, "/api/console?index=1&view=hex"))
    assert ch["view"] == "hex"
    _post(hx.port, "/api/control", {"action": "remove", "index": 1})
    hx.run(1)


def test_rig_attach_and_rest(hx):
    """Rig wired into the live loop (ref: src/rig/RigThread.cpp:133-207):
    follow mode retunes the app center from rig motion; REST mode toggles."""
    from cubicsdr_tpu.app.rig import RigController, SimulatedRig
    rig = SimulatedRig(100e6)
    hx.viewer.attach_rig(RigController(rig), poll_every_s=0.0)
    st = json.loads(_get(hx.port, "/api/rig"))
    assert st["attached"] and st["error"] == "OK"
    hx.run(1)                                   # baseline poll
    rig.frequency = 101e6                       # rig moved -> app follows
    hx.run(1)
    assert hx.lr.center_freq == 101e6
    # Control mode: app tune pushes to the rig on the next poll.
    _post(hx.port, "/api/control", {"action": "tune", "freq": 100e6})
    hx.run(1)
    assert rig.frequency == 100e6
    # Mode toggles via REST.
    r = _post(hx.port, "/api/rig", {"center_lock": True})
    assert r["ok"] and r["center_lock"]
    rig.frequency = 107e6
    hx.run(1)
    assert hx.lr.center_freq == 100e6           # locked: app stays
    _post(hx.port, "/api/rig", {"center_lock": False,
                                "frequency": 100e6})
    hx.run(1)


def test_follow_and_delta_lock(hx):
    mgr, lr, port = hx.mgr, hx.lr, hx.port
    d0 = mgr.get_demodulators()[0]
    # Delta lock: demod rides the center on tune (ref: SDRPostThread.cpp:
    # 56-63).
    assert _post(port, "/api/control",
                 {"action": "set", "index": 0, "key": "delta_lock",
                  "value": True})["ok"]
    ofs = d0.frequency - lr.center_freq
    _post(port, "/api/control", {"action": "tune", "freq": 108e6})
    assert d0.frequency == 108e6 + ofs
    _post(port, "/api/control",
          {"action": "set", "index": 0, "key": "delta_lock", "value": False})
    # Follow: an out-of-range follow demod retunes the CENTER to itself
    # (ref :77-80).
    _post(port, "/api/control",
          {"action": "set", "index": 0, "key": "follow", "value": True})
    _post(port, "/api/control",
          {"action": "set", "index": 0, "key": "frequency",
           "value": 120e6})                  # way out of the 1 MS/s band
    assert lr.center_freq == 120e6
    assert not d0.follow                     # one-shot
    # In-range demods (re)activate in the sweep.
    assert d0.active
    _post(port, "/api/control", {"action": "tune", "freq": 100e6})
    _post(port, "/api/control",
          {"action": "set", "index": 0, "key": "frequency",
           "value": 100e6 + 200e3})


def test_zoom_invalid_bandwidth_is_rejected_not_hung(hx):
    # A non-positive zoom bandwidth once infinite-looped _snap_bw inside the
    # HTTP handler thread; it must come back as an error response instead.
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(hx.port, "/api/control",
              {"action": "zoom", "offset": 0.0, "bandwidth": -1.0})
    assert ei.value.code == 400
    # And the receiver must still answer (no wedged handler state).
    assert json.loads(_get(hx.port, "/api/state"))["center_freq"]


def test_plan_rebuild_preserves_streaming_state():
    """Adding a demod mid-stream must NOT reset the surviving demods'
    filter/NCO/AGC/squelch state: their audio continues exactly as if no
    rebuild happened (ref: DemodulatorPreThread.cpp:105-151 — other demods
    never glitch on a plan change)."""
    from cubicsdr_tpu.app.runner import LiveReceiver
    from cubicsdr_tpu.app.webview import WebViewer
    from cubicsdr_tpu.ops.planar import PC, PLANAR
    import jax.numpy as jnp

    fm = (100e6 + 200e3, "FM", 200000)
    am = (100e6 - 300e3, "AM", 10000)

    # Shared block size that satisfies BOTH plans (pinned => forwarded).
    from cubicsdr_tpu.receiver import DemodGroupSpec
    L = ReceiverPipeline(FS, [DemodGroupSpec("FM", 200000, 1),
                              DemodGroupSpec("AM", 10000, 1)],
                         dtype=PLANAR).block_len

    src = SyntheticSource(FS, L, [Station(200e3, "fm", audio_freq=800.0),
                                  Station(-300e3, "am", audio_freq=500.0)])
    blocks = [next(src) for _ in range(6)]

    def fm_audio(out):
        return np.asarray(out["groups"][0]["audio"][0])

    # --- reference: FM-only pipeline, never rebuilt ---
    mgr_a = DemodulatorMgr()
    mgr_a.new_demodulator(*fm)
    specs, keyed = plan_from_manager(mgr_a)
    rx_a = ReceiverPipeline(FS, specs, dtype=PLANAR, block_len=L)
    ctl_a = controls_from_manager(mgr_a, rx_a, keyed, 100e6)
    st = rx_a.init_state()
    ref = []
    for b in blocks:
        st, out = rx_a.apply(st, (PC(jnp.asarray(b.real),
                                     jnp.asarray(b.imag)), ctl_a))
        ref.append(fm_audio(out))

    # --- rebuild run: same FM demod, AM added after block 3 ---
    mgr_b = DemodulatorMgr()
    mgr_b.new_demodulator(*fm)
    specs, keyed = plan_from_manager(mgr_b)
    rx_b = ReceiverPipeline(FS, specs, dtype=PLANAR, block_len=L)
    ctl_b = controls_from_manager(mgr_b, rx_b, keyed, 100e6)
    lr = LiveReceiver(rx_b, ctl_b, iter([]), center_freq=100e6,
                      waterfall_fft=256, waterfall_lines=8)
    viewer = WebViewer(lr, mgr_b, keyed, port=0)     # never started: direct
    got = []
    for i, b in enumerate(blocks):
        if i == 3:
            viewer.control({"action": "add", "freq": am[0],
                            "type": am[1], "bandwidth": am[2]})
            # Pinned block size must survive the rebuild.
            assert lr.pipeline.block_len == L
            assert len(lr.pipeline.groups) == 2
        iq = PC(jnp.asarray(b.real), jnp.asarray(b.imag))
        lr.state, out = lr.step(lr.state, (iq, lr.controls))
        got.append(fm_audio(out))

    # Post-rebuild blocks: continuous audio (tolerance covers XLA
    # fusion-order float noise between the two compiled programs).
    for i in (3, 4, 5):
        np.testing.assert_allclose(got[i], ref[i], rtol=0, atol=5e-4)
    # Sanity: the carried state actually mattered — a cold restart at
    # block 3 diverges from the reference.
    st_cold = rx_a.init_state()
    _, out_cold = rx_a.apply(
        st_cold, (PC(jnp.asarray(blocks[3].real),
                     jnp.asarray(blocks[3].imag)), ctl_a))
    assert not np.allclose(fm_audio(out_cold), ref[3], atol=5e-4)


def test_device_remote_manual_registration_persists(hx):
    # Registrations live on the app-owned enumerator, not a throwaway
    # (ref: CubicSDR.cpp:614-622 remote add/remove persistence).
    assert _post(hx.port, "/api/devices",
                 {"op": "add_remote", "address": "radio.local:55132"})["ok"]
    assert _post(hx.port, "/api/devices",
                 {"op": "set_manuals",
                  "manuals": [{"driver": "rtltcp", "label": "Manual TCP"}]}
                 )["ok"]
    d = json.loads(_get(hx.port, "/api/devices"))
    ids = [e["device_id"] for e in d["devices"]]
    assert "remote=radio.local:55132" in ids
    assert "manual=rtltcp" in ids
    assert d["remotes"] == ["radio.local:55132"]
    assert _post(hx.port, "/api/devices",
                 {"op": "remove_remote", "address": "radio.local:55132"}
                 )["ok"]
    d = json.loads(_get(hx.port, "/api/devices"))
    assert d["remotes"] == []


def test_modem_settings_rest_and_set_type_bandwidth(hx):
    """HTTP surface for the generated-properties panel (ref: src/
    ModemProperties.cpp) + live type/bandwidth edits rebuilding the plan."""
    # FM has an empty (or small) schema; endpoint responds either way.
    sch = json.loads(_get(hx.port, "/api/modem_settings?index=0"))
    assert sch["ok"] and sch["type"] == "FM"

    # Add an FSK demod, flip bps over REST, confirm it's live in the plan.
    assert _post(hx.port, "/api/control",
                 {"action": "add", "freq": 100e6 - 400e3, "type": "FSK",
                  "bandwidth": 19200})["ok"]
    idx = next(i for i, d in enumerate(hx.mgr.get_demodulators())
               if d.demod_type == "FSK")
    r = _post(hx.port, "/api/control",
              {"action": "modem_settings", "index": idx,
               "settings": {"bps": 2}})
    assert r["ok"] and r["settings"]["bps"] == 2
    g = next(g for g in hx.lr.pipeline.groups if g.modem_name == "FSK")
    assert dict(g.settings)["bps"] == 2
    hx.run(2)

    # Live bandwidth edit must reach the compiled plan (group key).
    fm_idx = next(i for i, d in enumerate(hx.mgr.get_demodulators())
                  if d.demod_type == "FM")
    assert _post(hx.port, "/api/control",
                 {"action": "set", "index": fm_idx, "key": "bandwidth",
                  "value": 100000})["ok"]
    assert any(g.modem_name == "FM" and g.bandwidth == 100000
               for g in hx.lr.pipeline.groups)
    hx.run(2)

    # Live type swap (ModeSelector, ref: DemodulatorInstance::
    # setDemodulatorType) — FSK -> AM rebuilds into an analog group.
    assert _post(hx.port, "/api/control",
                 {"action": "set", "index": idx, "key": "type",
                  "value": "AM"})["ok"]
    assert hx.mgr.get_demodulators()[idx].demod_type == "AM"
    assert any(g.modem_name == "AM" for g in hx.lr.pipeline.groups)
    hx.run(2)

    # Restore the fixture's shape for the remaining module tests.
    assert _post(hx.port, "/api/control",
                 {"action": "set", "index": fm_idx, "key": "bandwidth",
                  "value": 200000})["ok"]
    assert _post(hx.port, "/api/control",
                 {"action": "remove", "index": idx})["ok"]
    hx.run(2)


def test_device_stop_start(hx):
    assert _post(hx.port, "/api/devices", {"op": "stop"})["ok"]
    assert not json.loads(_get(hx.port, "/api/devices"))["running"]
    assert _post(hx.port, "/api/devices", {"op": "start"})["ok"]
    assert json.loads(_get(hx.port, "/api/devices"))["running"]


def test_device_stop_start_soapy_source(hx):
    """Round-3 advisor (medium): stop -> start on a SoapySDR source (whose
    stop() latches an event) must actually resume streaming, not leave a
    dead producer reported as running."""
    import time
    from tests.test_soapy import _MockModule
    hx.viewer.soapy_module = _MockModule
    assert _post(hx.port, "/api/devices",
                 {"op": "set_manuals",
                  "manuals": [{"driver": "mock", "label": "Mock SDR",
                               "args": "soapy=0"}]})["ok"]
    r = _post(hx.port, "/api/devices",
              {"op": "select", "device_id": "manual=mock",
               "rate": 2_000_000})
    assert r["ok"], r
    hx.run(2)

    assert _post(hx.port, "/api/devices", {"op": "stop"})["ok"]
    assert not json.loads(_get(hx.port, "/api/devices"))["running"]
    k_stop = hx.viewer.source.device.k          # device sample counter

    assert _post(hx.port, "/api/devices", {"op": "start"})["ok"]
    # The restarted producer must actually READ (the latched-stop bug left
    # a dead thread while reporting running=true).
    deadline = time.time() + 5.0
    while hx.viewer.source.device.k <= k_stop and time.time() < deadline:
        time.sleep(0.01)
    assert hx.viewer.source.device.k > k_stop
    assert json.loads(_get(hx.port, "/api/devices"))["running"]
    hx.run(2)                                   # blocks flow end-to-end

    # Back to synthetic for the remaining module tests.
    r = _post(hx.port, "/api/devices",
              {"op": "select", "device_id": "synthetic=0", "rate": FS})
    assert r["ok"]
    hx.run(2)


def test_device_select_soapy_and_back_mid_session(hx):
    """Runtime device switching (ref: SDRDevices dialog -> CubicSDR::
    setDevice, src/CubicSDR.cpp:797-855): swap synthetic -> mock SoapySDR
    hardware at a DIFFERENT sample rate without restarting the server;
    persisted DeviceConfig (ppm/gains/AGC/settings) reapplies on open."""
    from tests.test_soapy import _MockModule
    hx.viewer.soapy_module = _MockModule

    # Pre-seed the persisted per-device settings (the reference reapplies
    # these on device start, src/CubicSDR.cpp:814-841).
    dc = hx.viewer.config.get_device("manual=mock")
    dc.ppm = 5
    dc.agc_mode = False
    dc.gains["TUNER"] = 21.5
    dc.settings["biastee"] = "true"

    # The enumerator won't list soapy devices (module not installed), so
    # register it as a manual device string the picker can start.
    assert _post(hx.port, "/api/devices",
                 {"op": "set_manuals",
                  "manuals": [{"driver": "mock", "label": "Mock SDR",
                               "args": "soapy=0"}]})["ok"]
    # Select with an explicit different rate: the plan must rebuild at the
    # device-applied rate, mid-session.
    r = _post(hx.port, "/api/devices",
              {"op": "select", "device_id": "manual=mock", "rate": 2_000_000,
               "iq_swap": True})
    assert r["ok"], r
    assert r["rate"] == 2_000_000
    assert hx.lr.pipeline.sample_rate == 2_000_000
    src = hx.viewer.source
    assert src.iq_swap
    assert src.num_elems == hx.lr.pipeline.block_len

    hx.run(3)                 # blocks flow from the mock hardware
    st = json.loads(_get(hx.port, "/api/state"))
    assert st["sample_rate"] == 2_000_000

    # DeviceConfig reapplied on open (visible in the driver call log once
    # the read loop applied the staged settings).
    calls = src.device.calls
    assert ("ppm", 5) in calls
    assert ("agc", False) in calls
    assert ("gain", "TUNER", 21.5) in calls
    assert ("setting", "biastee", "true") in calls

    # Gain slider on the RUNNING device forwards + persists (the device
    # config key follows the selected device).
    hx.viewer.device_info.gains = {"TUNER": (0.0, 49.6)}
    g = _post(hx.port, "/api/gains", {"name": "TUNER", "value": 30.0})
    assert g["ok"]
    assert hx.viewer.config.get_device("manual=mock").gains["TUNER"] == 30.0

    # And back to synthetic at the original rate — still no restart.
    r = _post(hx.port, "/api/devices",
              {"op": "select", "device_id": "synthetic=0", "rate": FS})
    assert r["ok"] and hx.lr.pipeline.sample_rate == FS
    hx.run(2)
    assert json.loads(_get(hx.port, "/api/state"))["sample_rate"] == FS


def test_host_audio_output_and_solo(hx, tmp_path):
    """Host playback wiring (the RtAudio role): the live mix drains to a
    local sink (WAV backend on headless hosts), a single demod can be
    soloed to it, and output devices enumerate over REST."""
    wav_path = str(tmp_path / "live_mix.wav")
    assert _post(hx.port, "/api/control",
                 {"action": "audio_output",
                  "backend": f"wav:{wav_path}"})["ok"]
    hx.run(3)
    ad = json.loads(_get(hx.port, "/api/audio_devices"))
    assert ad["backend"] == "wav" and ad["solo"] is None
    assert isinstance(ad["devices"], list)   # empty on headless hosts

    # Solo one demod to the host sink.
    assert _post(hx.port, "/api/control",
                 {"action": "audio_solo", "index": 0})["ok"]
    hx.run(2)
    assert json.loads(_get(hx.port, "/api/audio_devices"))["solo"] == 0
    assert _post(hx.port, "/api/control",
                 {"action": "audio_solo", "index": None})["ok"]

    # Detach closes the WAV; it must be a playable file with audio in it.
    assert _post(hx.port, "/api/control",
                 {"action": "audio_output", "backend": None})["ok"]
    import wave
    w = wave.open(wav_path)
    assert w.getnchannels() == 2
    assert w.getframerate() == int(hx.lr.pipeline.audio_rate)
    n = w.getnframes()
    pcm = np.frombuffer(w.readframes(n), "<i2")
    assert n > 0 and np.abs(pcm).max() > 0


def test_display_controls_rest(hx):
    """Display-parameter parity (ref: src/AppFrame.cpp:2320-2352 per-canvas
    FFT/averaging/LPS menus + :2207-2215 perf-mode throttle)."""
    st = json.loads(_get(hx.port, "/api/state"))
    assert st["display"]["lps"] == 30.0
    # Waterfall pace + averaging + peak hold + demod-view FFT size.
    assert _post(hx.port, "/api/control",
                 {"action": "display", "lps": 12.0,
                  "fft_average_rate": 0.4, "peak_hold": True,
                  "demod_view_fft": 128})["ok"]
    hx.run(2)
    st = json.loads(_get(hx.port, "/api/state"))["display"]
    assert st["lps"] == 12.0
    assert abs(st["fft_average_rate"] - 0.4) < 1e-9
    assert st["peak_hold"] is True
    assert st["demod_view_fft"] == 128
    # Display still streams after the rebuilds.
    sp = json.loads(_get(hx.port, "/api/spectrum"))
    assert len(sp["points"]) == 256

    # Persistent snap applies to tunes that don't pass one.
    assert _post(hx.port, "/api/control",
                 {"action": "snap", "step": 12500})["ok"]
    assert _post(hx.port, "/api/control",
                 {"action": "tune", "freq": 100.004e6})["ok"]
    assert hx.lr.center_freq == 100.0e6
    _post(hx.port, "/api/control", {"action": "snap", "step": 1})

    # Perf mode LOW throttles the waterfall pace.
    assert _post(hx.port, "/api/control",
                 {"action": "perf_mode", "mode": "low"})["ok"]
    assert json.loads(_get(hx.port, "/api/state"))["display"]["lps"] == 8.0
    assert _post(hx.port, "/api/control",
                 {"action": "perf_mode", "mode": "high"})["ok"]
    _post(hx.port, "/api/control", {"action": "display", "lps": 30.0,
                                    "peak_hold": False,
                                    "fft_average_rate": 0.65})


def test_page_has_waterfall_drag_handlers(hx):
    """The embedded page implements drag-create / drag-move / edge-resize
    on the waterfall (ref: src/visual/WaterfallCanvas.cpp mouse handlers);
    the REST paths they hit (add, set frequency, set bandwidth-with-
    rebuild) are covered by the control tests above."""
    page = _get(hx.port, "/").decode()
    for frag in ("wf.onmousedown", "wf.onmouseup", "'resize'", "'move'",
                 "action: 'add'", "key: 'bandwidth'", "key: 'frequency'"):
        assert frag in page, frag


def test_page_has_hotkey_surface(hx):
    """Global hotkeys (ref: AppFrame::OnGlobalKeyDown): arrows tune,
    brackets step bandwidth, m/r/s/v per-demod verbs — present in the
    page JS (their REST targets are covered by the control tests)."""
    page = _get(hx.port, "/").decode()
    for frag in ("keydown", "ArrowLeft", "key:'bandwidth'",
                 "key:'recording'", "key:'solo'", "editSettings",
                 "pollConsole"):
        assert frag in page, frag


def test_profile_trace_endpoint(hx, tmp_path):
    """Structured tracing (SURVEY §5): the profile action captures a JAX
    trace of live streaming to a TensorBoard-compatible directory."""
    import time
    p = str(tmp_path / "trace")
    r = _post(hx.port, "/api/control",
              {"action": "profile", "path": p, "seconds": 0.5})
    assert r["ok"], r
    # Overlapping start is rejected while the window is open.
    assert not _post(hx.port, "/api/control",
                     {"action": "profile", "path": p})["ok"]
    hx.run(2)                                 # traced blocks
    deadline = time.time() + 10
    import os
    while time.time() < deadline and not any(
            f.endswith(".trace.json.gz") or "xplane" in f
            for _, _, fs in os.walk(p) for f in fs):
        time.sleep(0.2)
    found = [f for _, _, fs in os.walk(p) for f in fs]
    assert found, "no trace files written"


def test_bookmark_reorder(hx):
    """Within-group ordering (the drag-onto-sibling drop of the
    reference's BookmarkView tree, served as the 'reorder' op)."""
    for _ in range(3):
        assert _post(hx.port, "/api/bookmarks",
                     {"op": "add", "index": 0, "group": "Order"})["ok"]
    bm = json.loads(_get(hx.port, "/api/bookmarks"))
    assert len(bm["groups"]["Order"]) == 3
    # Tag entries by editing labels through the model directly.
    es = hx.viewer.bookmarks.get_bookmarks("Order")
    for i, e in enumerate(es):
        e.label = f"e{i}"
    assert _post(hx.port, "/api/bookmarks",
                 {"op": "reorder", "group": "Order", "i": 0, "to": 2})["ok"]
    labels = [e.label for e in hx.viewer.bookmarks.get_bookmarks("Order")]
    assert labels == ["e1", "e2", "e0"]
    assert _post(hx.port, "/api/bookmarks",
                 {"op": "remove_group", "group": "Order"})["ok"]
