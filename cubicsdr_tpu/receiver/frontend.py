"""Per-demodulator channel frontend: NCO shift + rational resample.

The DemodulatorPreThread analog (ref: src/demod/DemodulatorPreThread.cpp:
153-220): shift each demod's channel by (demodFreq - channelCenter) and
resample channelRate -> modem bandwidth. Batched: N demods = one [N, L]
NCO ramp + one [N]-batched polyphase resampler — a single fused XLA program
instead of N threads.

Shift frequencies are traced scalars: retuning is a new input value, not a
recompile. Changing bandwidth/modem rebuilds the kit (the reference posts
that to a worker thread, ref: DemodulatorPreThread.cpp:105-151; here the
host rebuilds while the old compiled step keeps running).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cubicsdr_tpu.ops.nco import NCOMixer
from cubicsdr_tpu.ops.resample import make_resampler, design_ratio
from cubicsdr_tpu.stream.op import StreamOp


class ChannelFrontend(StreamOp):
    """(state, (x[..., N, L], omega[N])) -> (state, y[..., N, Lout]).

    ``omega`` = 2*pi*(channelCenter - demodFreq)/channelRate per demod (the
    mix-down sign convention of DemodulatorPreThread.cpp:153-195: shifting
    the wanted carrier to DC).
    """

    def __init__(self, channel_rate: float, bandwidth: float,
                 n_demods: int, batch_shape: tuple = (),
                 dtype=jnp.complex64):
        self.channel_rate = float(channel_rate)
        self.bandwidth = float(bandwidth)
        bs = (*batch_shape, n_demods)
        self.nco = NCOMixer(bs)
        P, Q = design_ratio(bandwidth / channel_rate, max_denominator=500)
        self.P, self.Q = P, Q
        self.resampler = make_resampler(P, Q, batch_shape=bs, dtype=dtype)

    @property
    def block_multiple(self) -> int:
        return self.Q

    def out_len(self, in_len: int) -> int:
        return in_len // self.Q * self.P

    def init_state(self):
        return (self.nco.init_state(), self.resampler.init_state())

    def apply(self, state, inputs):
        x, omega = inputs
        s_n, s_r = state
        s_n, y = self.nco.apply(s_n, (x, omega))
        s_r, y = self.resampler.apply(s_r, y)
        return (s_n, s_r), y

    # --- time-sharding: NCO phase is closed-form in the shard index (no
    # collective); the resampler halo-exchanges its input tail. Planar-only
    # (the sharded receiver is the TPU path). ---
    def shard_carries(self):
        return (self.nco.init_state(), self.resampler.shard_carries())

    def shard_apply(self, carries, inputs, axis):
        from cubicsdr_tpu.parallel.shardable import nco_shard_mix
        x, omega = inputs
        base, c_r = carries
        base, y = nco_shard_mix(base, jnp.asarray(omega, jnp.float32),
                                x, axis)
        c_r, y = self.resampler.shard_apply(c_r, y, axis)
        return (base, c_r), y


def shift_omegas(demod_freqs, channel_centers, channel_rate):
    """omega[i] = 2*pi*(center_i - freq_i)/rate — mix the offset down to DC.

    Matches the reference's shiftFrequency = demodFreq - channelCenter with
    mix up/down by sign (DemodulatorPreThread.cpp:153-195); expressed here as
    one signed NCO frequency.
    """
    df = jnp.asarray(channel_centers, jnp.float32) - jnp.asarray(
        demod_freqs, jnp.float32)
    return 2.0 * jnp.pi * df / channel_rate
