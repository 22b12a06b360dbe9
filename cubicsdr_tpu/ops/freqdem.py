"""FM quadrature discriminator.

Equivalent of liquid ``freqdem`` (created with kf=0.5,
ref: src/modules/modem/analog/ModemFM.cpp:7,36): output is the per-sample
phase increment scaled by 1/(2*pi*kf). Pure elementwise math — the only
state is the previous sample carried across blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cubicsdr_tpu.stream.op import StreamOp


def freqdem_block(prev: jax.Array, x: jax.Array, kf: float = 0.5):
    """prev: [...] complex; x: [..., L] complex. Returns (new_prev, audio)."""
    z = jnp.concatenate([prev[..., None], x], axis=-1)
    d = z[..., 1:] * jnp.conj(z[..., :-1])
    audio = jnp.arctan2(d.imag, d.real) * (1.0 / (2.0 * jnp.pi * kf))
    return x[..., -1], audio.astype(jnp.float32)


class FreqDem(StreamOp):
    def __init__(self, kf: float = 0.5, batch_shape: tuple = ()):
        self.kf = float(kf)
        self.batch_shape = batch_shape

    def init_state(self):
        # Start at 1+0j so the first sample's phase difference is the true
        # phase of x[0] rather than an arctan2(0,0) artifact.
        return jnp.ones(self.batch_shape, jnp.complex64)

    def apply(self, prev, x):
        return freqdem_block(prev, x, self.kf)
