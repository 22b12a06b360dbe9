"""Data blocks flowing through the pipeline.

Mirrors the reference's inter-thread message types as JAX pytrees:

  - ``IQBlock``    <- ``SDRThreadIQData{frequency, sampleRate, data}``
    (ref: src/sdr/SoapySDRThread.h:20-42) and
    ``DemodulatorThreadIQData{frequency, sampleRate, data}``
    (ref: src/demod/DemodDefs.h:18-32).
  - ``AudioBlock`` <- ``AudioThreadInput{frequency, inputRate, sampleRate,
    channels, peak, type, is_squelch_active, data}``
    (ref: src/audio/AudioThread.h:16-51).

Unlike the reference, metadata rides as traced scalars so retunes do NOT
recompile; only shape/rate changes trigger a new XLA program.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class IQBlock:
    """A fixed-size chunk of complex baseband samples plus tuning metadata.

    ``data`` is complex64 with shape ``[..., block_len]``; leading axes batch
    independent channels (the TPU replacement for the reference's one-thread-
    per-demodulator design).
    """

    data: jax.Array            # complex64 [..., L]
    frequency: jax.Array       # f64/f32 scalar — RF center frequency in Hz
    sample_rate: jax.Array     # f32 scalar — samples/second

    @staticmethod
    def make(data, frequency=0.0, sample_rate=1.0) -> "IQBlock":
        return IQBlock(
            data=jnp.asarray(data, jnp.complex64),
            frequency=jnp.asarray(frequency, jnp.float32),
            sample_rate=jnp.asarray(sample_rate, jnp.float32),
        )

    @property
    def block_len(self) -> int:
        return self.data.shape[-1]


@_pytree_dataclass
class AudioBlock:
    """Demodulated audio plus level/squelch metadata.

    ``data`` shape ``[..., channels, frames]`` (channels: 1 mono, 2 stereo).
    ``peak`` and ``squelched`` mirror AudioThreadInput.peak /
    is_squelch_active (ref: src/audio/AudioThread.h:27-38).
    """

    data: jax.Array            # float32 [..., C, frames]
    sample_rate: jax.Array     # f32 scalar
    peak: jax.Array            # f32 [...] per-stream max(|audio|)
    squelched: jax.Array       # bool [...]

    @staticmethod
    def make(data, sample_rate=48000.0, peak=None, squelched=None) -> "AudioBlock":
        data = jnp.asarray(data, jnp.float32)
        if peak is None:
            peak = jnp.max(jnp.abs(data), axis=(-2, -1))
        if squelched is None:
            squelched = jnp.zeros(data.shape[:-2], jnp.bool_)
        return AudioBlock(
            data=data,
            sample_rate=jnp.asarray(sample_rate, jnp.float32),
            peak=jnp.asarray(peak, jnp.float32),
            squelched=jnp.asarray(squelched, jnp.bool_),
        )
