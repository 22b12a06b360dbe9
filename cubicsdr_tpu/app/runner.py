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

    def _fanout(self, iq, out):
        # Waterfall lines from the full-band tap.
        self._st_dist, (frames, valid) = self.dist.apply(self._st_dist, iq)
        nv = int(np.asarray(valid).sum())
        if nv:
            self._st_spec, disp = self.spec.apply(self._st_spec, frames)
            pts = np.asarray(disp["spectrum_points"])
            self.waterfall.add_lines(np.tile(pts, (nv, 1)))
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
