"""Headless web UI: live waterfall/spectrum viewer + tuning REST API.

The TPU-native replacement for the reference's wxWidgets/OpenGL frontend
(ref: src/AppFrame.{h,cpp}, src/visual/WaterfallCanvas.cpp,
src/panel/WaterfallPanel.cpp): the framework emits display-ready arrays
(normalized spectrum points, palette-mapped waterfall rows), and this module
serves them over plain HTTP from the stdlib server — no GUI toolkit, no GL.

Endpoints
  GET  /                   single-page viewer (embedded HTML/JS canvas)
  GET  /api/state          receiver state: center/rate/demods/metrics
  GET  /api/spectrum       latest spectrum points + floor/ceil (JSON)
  GET  /api/waterfall.png  current waterfall image
  POST /api/control        {"action": ...} commands, mirroring the
                           reference's hotkey/mouse surface
                           (ref: AppFrame::OnGlobalKeyDown,
                           src/AppFrame.cpp:2812-3087):
      tune       {freq}                   retune center frequency
      add        {freq, type, bandwidth}  create a demodulator
      remove     {index}
      set        {index, key, value}      frequency/bandwidth/squelch_level/
                                          squelch_enabled/gain/mute/solo/
                                          active/label
      theme      {name}                   waterfall palette
      view       {index|null}             select the demod-view spectrum
                                          target (GET /api/demod_spectrum)

Control changes rebuild the pipeline's traced control vectors (retunes and
squelch/gain/mute are jit INPUTS, so no recompile); add/remove of demods
changes the compiled plan and is applied between blocks, the moral
equivalent of the reference's async DemodulatorWorkerThread kit swap
(ref: src/demod/DemodulatorWorkerThread.cpp:54-109).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>cubicsdr_tpu</title>
<style>
 body { background:#111; color:#ddd; font:13px monospace; margin:12px; }
 canvas { display:block; background:#000; margin-bottom:6px; }
 #demods div { padding:2px 4px; cursor:pointer; }
 #demods div.sel { background:#234; }
 input { background:#222; color:#ddd; border:1px solid #555; }
 button { background:#333; color:#ddd; border:1px solid #555; }
</style></head><body>
<div id="hdr"></div>
<canvas id="spec" width="1024" height="160"></canvas>
<canvas id="wf" width="1024" height="320"></canvas>
<div>center <input id="freq" size="12"> <button onclick="tune()">tune</button>
 <button onclick="addDemod()">add demod @ click</button>
 theme <select id="theme" onchange="setTheme()"></select></div>
<div id="demods"></div>
<script>
let st = null, clickFreq = null;
const wf = document.getElementById('wf'), spec = document.getElementById('spec');
async function poll() {
  try {
    st = await (await fetch('/api/state')).json();
    document.getElementById('hdr').textContent =
      `center ${st.center_freq} Hz  rate ${st.sample_rate}  ` +
      `blocks ${st.metrics.blocks||0}  ${st.metrics.samples_per_s||0} S/s`;
    const sel = document.getElementById('theme');
    if (!sel.options.length) for (const t of st.themes) {
      const o = document.createElement('option'); o.value = o.text = t;
      sel.add(o); }
    sel.value = st.theme;
    const dd = document.getElementById('demods');
    dd.innerHTML = '';
    st.demods.forEach((d, i) => {
      const e = document.createElement('div');
      e.textContent = `#${i} ${d.type} ${d.frequency} Hz bw=${d.bandwidth}` +
        ` sq=${d.squelch_enabled?d.squelch_level:'off'}` +
        ` ${d.muted?'MUTE':''} level=${(d.level||0).toFixed(1)} dB`;
      e.onclick = () => ctl({action:'set', index:i, key:'mute',
                             value:!d.muted});
      dd.appendChild(e);
    });
    const sp = await (await fetch('/api/spectrum')).json();
    drawSpec(sp.points);
    const img = new Image();
    img.onload = () => wf.getContext('2d')
        .drawImage(img, 0, 0, wf.width, wf.height);
    img.src = '/api/waterfall.png?' + Date.now();
  } catch (e) {}
  setTimeout(poll, 300);
}
function drawSpec(pts) {
  const c = spec.getContext('2d'); c.clearRect(0,0,spec.width,spec.height);
  c.strokeStyle = '#6cf'; c.beginPath();
  pts.forEach((p, i) => {
    const x = i / pts.length * spec.width, y = (1 - p) * spec.height;
    i ? c.lineTo(x, y) : c.moveTo(x, y); });
  c.stroke();
}
async function ctl(body) {
  await fetch('/api/control', {method:'POST', body: JSON.stringify(body)});
}
function tune() {
  ctl({action:'tune', freq: parseFloat(document.getElementById('freq').value)});
}
function setTheme() {
  ctl({action:'theme', name: document.getElementById('theme').value});
}
wf.onclick = spec.onclick = (ev) => {
  const frac = ev.offsetX / ev.target.width;
  clickFreq = st.center_freq + (frac - 0.5) * st.sample_rate;
  document.getElementById('freq').value = clickFreq;
};
function addDemod() {
  if (clickFreq !== null)
    ctl({action:'add', freq: clickFreq, type:'FM', bandwidth:200000});
}
poll();
</script></body></html>"""


class WebViewer:
    """Serves a LiveReceiver (app/runner.py) plus its DemodulatorMgr."""

    def __init__(self, receiver, mgr=None, keyed=None,
                 host: str = "127.0.0.1", port: int = 8080):
        self.receiver = receiver
        self.mgr = mgr
        self.keyed = keyed
        self.host, self.port = host, port
        self._lock = threading.Lock()
        self._levels: dict[int, float] = {}
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        prev = receiver.on_block

        def hook(out):
            lv = []
            for g in out.get("groups", []):
                lv.extend(np.asarray(g["level"]).ravel().tolist())
            with self._lock:
                self._levels = dict(enumerate(lv))
            if prev is not None:
                prev(out)

        receiver.on_block = hook

    # ---- state snapshots -------------------------------------------------
    def _flat_order(self) -> list:
        """Instances in the pipeline's flat group order (keyed iteration) —
        the order of levels/recorder indices; may differ from mgr order."""
        if not self.keyed:
            return list(self.mgr.get_demodulators()) if self.mgr else []
        return [d for ds in self.keyed.values() for d in ds]

    def state_json(self) -> dict:
        r = self.receiver
        demods = []
        if self.mgr is not None:
            with self._lock:
                flat_levels = dict(self._levels)
            levels = {id(d): flat_levels.get(fi, 0.0)
                      for fi, d in enumerate(self._flat_order())}
            for i, d in enumerate(self.mgr.get_demodulators()):
                demods.append({
                    "index": i, "type": d.demod_type,
                    "frequency": d.frequency, "bandwidth": d.bandwidth,
                    "squelch_level": d.squelch_level,
                    "squelch_enabled": d.squelch_enabled,
                    "gain": d.gain, "muted": d.muted, "solo": d.solo,
                    "active": d.active, "label": d.label,
                    "level": levels.get(id(d), 0.0),
                })
        from cubicsdr_tpu.visual.gradient import THEMES
        return {
            "center_freq": r.center_freq,
            "sample_rate": r.pipeline.sample_rate,
            "audio_rate": getattr(r.pipeline, "audio_rate", 48000),
            "theme": r.waterfall.theme_name,
            "themes": sorted(THEMES),
            "demods": demods,
            "metrics": r.metrics.snapshot(),
        }

    def spectrum_json(self) -> dict:
        pts = self.receiver.waterfall.buffer[-1]   # newest display line
        return {"points": np.asarray(pts, np.float64).round(4).tolist()}

    def demod_spectrum_json(self) -> dict:
        pts = self.receiver.demod_spectrum
        return {"index": self.receiver.demod_view,
                "points": [] if pts is None
                else np.asarray(pts, np.float64).round(4).tolist()}

    def waterfall_png(self) -> bytes:
        return self.receiver.waterfall.render_png_bytes()

    # ---- control ---------------------------------------------------------
    def control(self, cmd: dict) -> dict:
        r = self.receiver
        action = cmd.get("action")
        if action == "tune":
            r.center_freq = float(cmd["freq"])
            self._refresh_controls()
        elif action == "theme":
            r.waterfall.set_theme(str(cmd["name"]))
        elif action == "view" and self.mgr is not None:
            # Select the demod-view spectrum target (mgr index or null).
            idx = cmd.get("index")
            if idx is None:
                r.set_demod_view(None)
            else:
                d = self.mgr.get_demodulators()[int(idx)]
                flat = self._flat_order()
                r.set_demod_view(
                    next(fi for fi, x in enumerate(flat) if x is d))
        elif action == "set" and self.mgr is not None:
            d = self.mgr.get_demodulators()[int(cmd["index"])]
            key, value = cmd["key"], cmd["value"]
            if key == "frequency":
                d.frequency = float(value)
            elif key == "bandwidth":
                d.set_bandwidth(float(value))
            elif key == "squelch_level":
                d.squelch_level = float(value)
            elif key == "squelch_enabled":
                d.squelch_enabled = bool(value)
            elif key == "gain":
                d.gain = float(value)
            elif key == "mute":
                d.muted = bool(value)
            elif key == "solo":
                d.solo = bool(value)
            elif key == "active":
                d.active = bool(value)
            elif key == "label":
                d.label = str(value)
            else:
                return {"ok": False, "error": f"unknown key {key}"}
            self._refresh_controls()
        elif action == "add" and self.mgr is not None:
            self.mgr.new_demodulator(float(cmd["freq"]),
                                     str(cmd.get("type", "FM")),
                                     float(cmd.get("bandwidth", 200000)))
            self._rebuild_plan()
        elif action == "remove" and self.mgr is not None:
            inst = self.mgr.get_demodulators()[int(cmd["index"])]
            self.mgr.delete_demodulator(inst)
            self._rebuild_plan()
        else:
            return {"ok": False, "error": f"unknown action {action}"}
        return {"ok": True}

    def _refresh_controls(self):
        """Controls are traced jit inputs — rebuilding them never
        recompiles (the reference's atomic-flag retune protocol,
        ref: src/demod/DemodulatorPreThread.cpp:281-336)."""
        if self.mgr is None or self.keyed is None:
            return
        from cubicsdr_tpu.receiver.pipeline import controls_from_manager
        self.receiver.controls = controls_from_manager(
            self.mgr, self.receiver.pipeline, self.keyed,
            self.receiver.center_freq)

    def _rebuild_plan(self):
        """Demod add/remove changes group shapes => new compiled plan,
        swapped in between blocks while streaming continues on the old one
        (the DemodulatorWorkerThread pattern)."""
        import jax
        from cubicsdr_tpu.receiver.pipeline import (
            ReceiverPipeline, plan_from_manager, controls_from_manager)
        r = self.receiver
        specs, keyed = plan_from_manager(self.mgr)
        pipeline = ReceiverPipeline(r.pipeline.sample_rate, specs)
        controls = controls_from_manager(self.mgr, pipeline, keyed,
                                         r.center_freq)
        step = jax.jit(pipeline.apply)
        state = pipeline.init_state()
        r.set_demod_view(None)       # flat indices change with the plan
        with self._lock:
            self.keyed = keyed
            r.pipeline, r.controls, r.step, r.state = (
                pipeline, controls, step, state)

    # ---- server ----------------------------------------------------------
    def _handler_class(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?")[0]
                try:
                    if path == "/":
                        self._send(200, _PAGE.encode(), "text/html")
                    elif path == "/api/state":
                        self._send(200,
                                   json.dumps(viewer.state_json()).encode())
                    elif path == "/api/spectrum":
                        self._send(
                            200, json.dumps(viewer.spectrum_json()).encode())
                    elif path == "/api/demod_spectrum":
                        self._send(200, json.dumps(
                            viewer.demod_spectrum_json()).encode())
                    elif path == "/api/waterfall.png":
                        self._send(200, viewer.waterfall_png(), "image/png")
                    else:
                        self._send(404, b'{"error":"not found"}')
                except Exception as e:      # noqa: BLE001
                    self._send(500, json.dumps({"error": str(e)}).encode())

            def do_POST(self):
                if self.path.split("?")[0] != "/api/control":
                    self._send(404, b'{"error":"not found"}')
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    cmd = json.loads(self.rfile.read(n) or b"{}")
                    self._send(200, json.dumps(viewer.control(cmd)).encode())
                except Exception as e:      # noqa: BLE001
                    self._send(400, json.dumps({"error": str(e)}).encode())

        return Handler

    def start(self):
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._handler_class())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
