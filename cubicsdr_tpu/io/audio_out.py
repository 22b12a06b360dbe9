"""Host audio playback sink — the RtAudio role.

The reference mixes into RtAudio device streams (ref: src/audio/
AudioThread.cpp:88-243). On a datacenter host there is usually no audio
device; this sink auto-detects an available backend (sounddevice, then
pyaudio), and otherwise degrades to a WAV spool or a null sink, so the same
application code runs everywhere.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def enumerate_output_devices() -> list[dict]:
    """AudioThread::enumerateDevices analog; empty on headless hosts."""
    try:
        import sounddevice as sd  # type: ignore
        return [dict(index=i, name=d["name"],
                     channels=d["max_output_channels"],
                     rate=int(d["default_samplerate"]))
                for i, d in enumerate(sd.query_devices())
                if d["max_output_channels"] > 0]
    except Exception:
        return []


class AudioOutput:
    """Plays float32 [channels, n] blocks; silently degrades when headless.

    backend: 'auto' | 'sounddevice' | 'wav:<path>' | 'null'
    """

    def __init__(self, sample_rate: int = 48000, channels: int = 2,
                 backend: str = "auto", device: Optional[int] = None):
        self.sample_rate = int(sample_rate)
        self.channels = int(channels)
        self.backend = "null"
        self._stream = None
        self._wav = None
        if backend.startswith("wav:"):
            from cubicsdr_tpu.io.wav import WavWriter
            self._wav = WavWriter(backend[4:], sample_rate, channels)
            self.backend = "wav"
            return
        if backend in ("auto", "sounddevice"):
            try:
                import sounddevice as sd  # type: ignore
                self._stream = sd.OutputStream(
                    samplerate=sample_rate, channels=channels,
                    dtype="float32", device=device)
                self._stream.start()
                self.backend = "sounddevice"
                return
            except Exception:
                if backend == "sounddevice":
                    raise

    def write(self, frames: np.ndarray):
        frames = np.asarray(frames, np.float32)
        if frames.ndim == 1:
            frames = frames[None, :]
        if self.backend == "sounddevice":
            self._stream.write(np.ascontiguousarray(frames.T))
        elif self.backend == "wav":
            self._wav.write(frames)
        # null: drop

    def close(self):
        if self._stream is not None:
            self._stream.stop()
            self._stream.close()
        if self._wav is not None:
            self._wav.close()
