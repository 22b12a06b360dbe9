"""WebViewer: the headless UI analog (ref: src/AppFrame.*, src/visual/
WaterfallCanvas.cpp mouse/hotkey surface) served over stdlib HTTP."""

import json
import threading
import urllib.request

import numpy as np

from cubicsdr_tpu.io.sources import SyntheticSource, Station
from cubicsdr_tpu.receiver import (
    DemodulatorMgr, ReceiverPipeline, plan_from_manager,
    controls_from_manager)


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


def test_webview_endpoints_and_control(tmp_path):
    from cubicsdr_tpu.app.runner import LiveReceiver
    from cubicsdr_tpu.app.webview import WebViewer

    fs = 1_000_000
    mgr = DemodulatorMgr()
    mgr.new_demodulator(100e6 + 200e3, "FM", 200000)
    specs, keyed = plan_from_manager(mgr)
    # Production representation: planar (the TPU path) — webview/runner must
    # never construct complex64 device arrays.
    from cubicsdr_tpu.ops.planar import PLANAR
    rx = ReceiverPipeline(fs, specs, dtype=PLANAR)
    controls = controls_from_manager(mgr, rx, keyed, 100e6)

    class _Src:
        def __iter__(self):
            src = SyntheticSource(fs, rx.block_len,
                                  [Station(200e3, "fm", audio_freq=800.0)])
            for _ in range(16):
                yield next(src)

    lr = LiveReceiver(rx, controls, _Src(),
                      center_freq=100e6, waterfall_fft=256,
                      waterfall_lines=32)
    viewer = WebViewer(lr, mgr, keyed, port=0).start()
    port = viewer.port
    try:
        lr.start_producer()
        lr.run_blocks(max_blocks=3)

        page = _get(port, "/")
        assert b"cubicsdr_tpu" in page

        st = json.loads(_get(port, "/api/state"))
        assert st["center_freq"] == 100e6
        assert st["sample_rate"] == fs
        assert len(st["demods"]) == 1
        assert st["demods"][0]["type"] == "FM"
        assert st["demods"][0]["level"] != 0.0     # on_block hook ran
        assert "default" in st["themes"]

        sp = json.loads(_get(port, "/api/spectrum"))
        assert len(sp["points"]) == 256

        png = _get(port, "/api/waterfall.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # Control surface: mute + retune are traced inputs (no recompile).
        assert _post(port, "/api/control",
                     {"action": "set", "index": 0, "key": "mute",
                      "value": True})["ok"]
        assert mgr.get_demodulators()[0].muted
        assert _post(port, "/api/control",
                     {"action": "tune", "freq": 100.1e6})["ok"]
        assert lr.center_freq == 100.1e6

        # Theme switch.
        assert _post(port, "/api/control",
                     {"action": "theme", "name": "jet"})["ok"]
        assert lr.waterfall.theme_name == "jet"

        # Demod-view spectrum: select demod 0, run blocks, points appear.
        assert _post(port, "/api/control",
                     {"action": "view", "index": 0})["ok"]
        lr.run_blocks(max_blocks=2)
        dv = json.loads(_get(port, "/api/demod_spectrum"))
        assert dv["index"] == 0 and len(dv["points"]) == lr.demod_view_fft

        # Plan change: add a second demod -> new compiled plan swaps in and
        # further blocks run (the async worker-thread rebuild analog).
        assert _post(port, "/api/control",
                     {"action": "add", "freq": 100e6 - 200e3,
                      "type": "AM", "bandwidth": 10000})["ok"]
        assert len(mgr.get_demodulators()) == 2
        lr.run_blocks(max_blocks=2)
        st = json.loads(_get(port, "/api/state"))
        assert len(st["demods"]) == 2

        assert _post(port, "/api/control",
                     {"action": "remove", "index": 1})["ok"]
        assert len(mgr.get_demodulators()) == 1

        # Unknown action surfaces an error, not a 500.
        r = _post(port, "/api/control", {"action": "bogus"})
        assert not r["ok"]

        # Scope traces from the live mix (Y / 2Y / XY modes).
        sc = json.loads(_get(port, "/api/scope?mode=2Y"))
        assert sc["mode"] == "2Y" and len(sc["traces"]) == 2

        # Live audio stream: run blocks concurrently, read WAV header +
        # some PCM (the web-world RtAudio output). Unmute first (muted
        # above) so the tone reaches the mix.
        assert _post(port, "/api/control",
                     {"action": "set", "index": 0, "key": "mute",
                      "value": False})["ok"]
        t = threading.Thread(target=lr.run_blocks,
                             kwargs={"max_blocks": 4}, daemon=True)
        t.start()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/audio.wav", timeout=15) as rsp:
            head = rsp.read(44 + 9600)
        t.join(timeout=20)
        assert head[:4] == b"RIFF" and head[8:12] == b"WAVE"
        pcm = np.frombuffer(head[44:], "<i2")
        assert np.abs(pcm).max() > 0       # tone present in the mix

        # Session save/load round-trip through the API.
        sp_path = str(tmp_path / "sess.json")
        assert _post(port, "/api/session",
                     {"op": "save", "path": sp_path})["ok"]
        assert _post(port, "/api/session",
                     {"op": "load", "path": sp_path})["ok"]
        assert len(mgr.get_demodulators()) == 1
    finally:
        lr.stop()
        viewer.stop()
