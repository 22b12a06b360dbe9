"""LiveReceiver — the running application core.

The analog of CubicSDR::OnInit's thread/queue wiring (ref: src/CubicSDR.cpp:
342-397) in the TPU architecture: ONE producer thread fills the native
sample ring from a source (file/synthetic/socket), and the consumer loop
pops fixed blocks, runs the compiled receiver step, and fans results out to
audio sinks (per-demod recorders + mix), the spectrum/waterfall processors,
and the metrics registry. Back-pressure = the bounded ring's try-push
shedding, exactly the reference's queue-full policy
(ref: src/sdr/SoapySDRThread.cpp:384-399).
"""

from __future__ import annotations

import collections
import threading
from typing import Callable, Optional

import numpy as np

from cubicsdr_tpu.io.recorder import RecordingSink, SquelchOption
from cubicsdr_tpu.native import SampleRing
from cubicsdr_tpu.utils.metrics import Metrics
from cubicsdr_tpu.visual import FFTDataDistributor, SpectrumProcessor, Waterfall


class LiveReceiver:
    def __init__(self, pipeline, controls, source,
                 center_freq: float = 0.0,
                 ring_seconds: float = 2.0,
                 record_path: Optional[str] = None,
                 record_squelch: SquelchOption = SquelchOption.RECORD_SILENCE,
                 record_time_limit: float = 0.0,
                 waterfall_fft: int = 1024,
                 waterfall_lines: int = 256,
                 waterfall_lps: float = 30.0,
                 on_block: Optional[Callable] = None):
        import jax
        import jax.numpy as jnp
        self._jnp = jnp
        self.pipeline = pipeline
        self.controls = controls
        self.source = source
        self.center_freq = center_freq
        self.step = jax.jit(pipeline.apply)
        self.state = pipeline.init_state()
        self.metrics = Metrics()
        cap = int(pipeline.sample_rate * ring_seconds)
        self.ring = SampleRing(max(cap, 4 * pipeline.block_len))
        self.record_path = record_path
        self._recorders: dict[int, RecordingSink] = {}
        self._rec_opts = (record_squelch, record_time_limit)
        self.on_block = on_block

        self.dist = FFTDataDistributor(
            waterfall_fft * 2, pipeline.sample_rate,
            lines_per_second=waterfall_lps, block_len=pipeline.block_len)
        self.spec = SpectrumProcessor(waterfall_fft)
        self.waterfall = Waterfall(waterfall_fft, waterfall_lines)
        self._st_dist = self.dist.init_state()
        self._st_spec = self.spec.init_state()

        # Live audio tap: rolling mix chunks for HTTP/host audio sinks (the
        # AudioThread output analog, ref: src/audio/AudioThread.cpp:88-243).
        self.audio_tap: collections.deque = collections.deque(maxlen=64)
        self.audio_cond = threading.Condition()
        self._audio_seq = 0

        # Demod-view spectrum (the second SpectrumVisualProcessor instance,
        # ref: src/CubicSDR.cpp:340,374): tracks ONE selected demod's IQ tap.
        self.demod_view: Optional[int] = None    # flat (group-order) index
        self.demod_view_fft = 256
        self.demod_spectrum: Optional[np.ndarray] = None
        self._dv_spec = SpectrumProcessor(self.demod_view_fft)
        self._dv_state = self._dv_spec.init_state()
        self._dv_carry = np.zeros(0, np.complex64)

        self._stop = threading.Event()
        self._producer: Optional[threading.Thread] = None

    # --- producer: source -> ring (the SDRThread readLoop analog) ---
    def _produce(self):
        for blk in self.source:
            if self._stop.is_set():
                break
            blk = np.asarray(blk)
            ok = self.ring.write(np.ascontiguousarray(blk.real, np.float32),
                                 np.ascontiguousarray(blk.imag, np.float32))
            self.metrics.tick("ingest", len(blk),
                              dropped=0 if ok else len(blk))

    def start_producer(self):
        self._producer = threading.Thread(target=self._produce, daemon=True)
        self._producer.start()

    # --- consumer: ring -> compiled step -> sinks ---
    def run_blocks(self, max_blocks: Optional[int] = None,
                   wait: bool = True) -> int:
        jnp = self._jnp
        n = 0
        while not self._stop.is_set():
            if max_blocks is not None and n >= max_blocks:
                break
            # Re-read each block: a control-plane plan swap (webview add/
            # remove demod) may change the compiled block size mid-stream.
            L = self.pipeline.block_len
            got = self.ring.read(L)
            if got is None:
                if not wait or (self._producer is not None
                                and not self._producer.is_alive()):
                    break
                self._stop.wait(0.001)
                continue
            re, im = got
            iq = jnp.asarray(re) + 1j * jnp.asarray(im)
            self.state, out = self.step(self.state, (iq, self.controls))
            self._fanout(iq, out)
            self.metrics.tick("pipeline", L)
            n += 1
        return n

    def set_demod_view(self, idx: Optional[int]):
        """Select which demod's IQ tap feeds the demod-view spectrum
        (flat group-order index; None disables)."""
        if idx != self.demod_view:
            self.demod_view = idx
            self._dv_state = self._dv_spec.init_state()
            self._dv_carry = np.zeros(0, np.complex64)
            self.demod_spectrum = None

    def _demod_view_fanout(self, out):
        idx, off = self.demod_view, 0
        for g in out["groups"]:
            n = g["audio"].shape[0]
            if idx < off + n:
                tap = np.asarray(g["iq"])[idx - off]
                if tap.ndim == 2:            # planar (re, im) rows
                    tap = tap[0] + 1j * tap[1]
                buf = np.concatenate([self._dv_carry,
                                      tap.astype(np.complex64)])
                F = 2 * self.demod_view_fft   # ×2 internal FFT (VZM)
                n_fr = min(len(buf) // F, 8)
                if n_fr:
                    frames = buf[: n_fr * F].reshape(n_fr, F)
                    self._dv_state, disp = self._dv_spec.apply(
                        self._dv_state, self._jnp.asarray(frames))
                    self.demod_spectrum = np.asarray(
                        disp["spectrum_points"])
                self._dv_carry = buf[n_fr * F:][-4 * F:]
                return
            off += n

    def _fanout(self, iq, out):
        # Waterfall lines from the full-band tap.
        self._st_dist, (frames, valid) = self.dist.apply(self._st_dist, iq)
        nv = int(np.asarray(valid).sum())
        if nv:
            self._st_spec, disp = self.spec.apply(self._st_spec, frames)
            pts = np.asarray(disp["spectrum_points"])
            self.waterfall.add_lines(np.tile(pts, (nv, 1)))
        # Demod-view spectrum from the selected demod's IQ tap.
        if self.demod_view is not None:
            self._demod_view_fanout(out)
        # Mix audio tap for live listeners.
        if "mix" in out:
            with self.audio_cond:
                self.audio_tap.append(np.asarray(out["mix"]))
                self._audio_seq += 1
                self.audio_cond.notify_all()
        # Recording sinks per demod group/row.
        if self.record_path:
            gi_off = 0
            for gi, g in enumerate(out["groups"]):
                audio = np.asarray(g["audio"])
                squelched = np.asarray(g["squelched"])
                for ri in range(audio.shape[0]):
                    key = gi_off + ri
                    if key not in self._recorders:
                        sq, tl = self._rec_opts
                        self._recorders[key] = RecordingSink(
                            f"{self.record_path}_demod{key}",
                            int(self.pipeline.audio_rate),
                            channels=audio.shape[1],
                            squelch_option=sq, time_limit_s=tl)
                    self._recorders[key].write(audio[ri],
                                              bool(squelched[ri]))
                gi_off += audio.shape[0]
        if self.on_block is not None:
            self.on_block(out)

    def stop(self):
        self._stop.set()
        if self._producer is not None:
            self._producer.join(timeout=2.0)
        for r in self._recorders.values():
            r.close()

    def status(self) -> str:
        return self.metrics.status_line()
