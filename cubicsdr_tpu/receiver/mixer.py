"""Audio mixing with per-source gain and peak normalization.

The AudioThread controller/boundThreads mixer made pure (ref:
src/audio/AudioThread.cpp:88-243): sum active (non-muted, solo-respecting)
streams with per-source gain; if the summed peak exceeds 1.0, scale the mix
by 1/peak.
"""

from __future__ import annotations

import jax.numpy as jnp


def mix_audio(audio, gains, active=None, peaks=None):
    """audio: [..., N, C, L]; gains: [N]; active: bool [N] (mute/solo already
    resolved); peaks: [..., N] per-stream peaks (defaults to max|audio|).

    Returns (mix[..., C, L], mix_peak[...]).
    """
    g = jnp.asarray(gains, jnp.float32)
    if active is not None:
        g = g * jnp.asarray(active, jnp.float32)
    if peaks is None:
        peaks = jnp.max(jnp.abs(audio), axis=(-2, -1))
    mix = jnp.sum(audio * g[..., :, None, None], axis=-3)
    peak = jnp.sum(peaks * g, axis=-1)
    scale = jnp.where(peak > 1.0, 1.0 / jnp.maximum(peak, 1e-9), 1.0)
    return mix * scale[..., None, None], jnp.minimum(peak, 1.0)
