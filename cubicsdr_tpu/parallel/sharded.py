"""ShardedReceiver — the multi-chip receive pipeline.

Shards the flagship chain (wideband channelize -> N-demodulator FM farm ->
mix) over a ('time', 'chan') mesh:

  * 'time': the IQ block is split into contiguous slices per device. Every
    FIR-like stage consumes (history, samples); the history is the previous
    shard's tail via one cyclic ppermute per stage (parallel/halo.py). The
    cyclic wrap carries streaming state across blocks for free. NCO phase
    continuity is closed-form: a carried per-demod phase base plus
    omega * (shard_index * local_len).
  * 'chan': demodulator rows are split across devices (embarrassingly
    parallel); the final mix is a psum over 'chan'.

This is the TPU translation of the reference's axes (SURVEY.md §2.11): its
thread pipeline becomes 'time', its per-demod threads become 'chan', and the
in-process queues become ICI collectives.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cubicsdr_tpu.ops.channelizer import ChannelizerPFB2, channel_centers
from cubicsdr_tpu.ops.freqdem import freqdem_block
from cubicsdr_tpu.ops.resample import RationalResampler, design_ratio
from cubicsdr_tpu.parallel.halo import streaming_halo
from cubicsdr_tpu.parallel.mesh import make_receiver_mesh

TWO_PI = 2.0 * np.pi


class ShardedReceiver:
    """Fixed-plan FM farm: M-channel PFBCH2 + n_demods FM receivers.

    block_len is the GLOBAL samples per step; it must divide into
    n_time equal shards with each shard a multiple of the stage block
    multiples (checked at construction).
    """

    def __init__(self, sample_rate: float, num_channels: int, n_demods: int,
                 mesh: jax.sharding.Mesh | None = None,
                 bandwidth: float = 200_000.0, audio_rate: int = 48_000,
                 block_len: int | None = None):
        self.mesh = mesh if mesh is not None else make_receiver_mesh()
        self.nt = self.mesh.shape["time"]
        self.nc = self.mesh.shape["chan"]
        assert n_demods % self.nc == 0
        self.sample_rate = float(sample_rate)
        self.M = int(num_channels)
        self.n_demods = int(n_demods)
        self.n_local = n_demods // self.nc
        self.audio_rate = audio_rate

        self.chan = ChannelizerPFB2(self.M)
        self.D = self.M // 2
        self.chan_rate = 2.0 * sample_rate / self.M

        P1, Q1 = design_ratio(bandwidth / self.chan_rate, 500)
        self.fe_rs = RationalResampler(P1, Q1, batch_shape=(self.n_local,))
        P2, Q2 = design_ratio(audio_rate / bandwidth, 500)
        self.au_rs = RationalResampler(P2, Q2, batch_shape=(self.n_local,),
                                       dtype=jnp.float32)
        self.bandwidth = float(bandwidth)

        # Local (per time-shard) input length: multiple of D, Ls/D even (so
        # the PFBCH2 parity flip is shard-invariant), channel samples
        # divisible by Q1, demod samples divisible by Q2.
        m = self.D * 2
        m = np.lcm(m, self.D * Q1)
        t = Q2 // np.gcd(P1, Q2)
        m = int(np.lcm(m, self.D * Q1 * t))
        if block_len is None:
            per_shard = max(m, ((1 << 17) // m) * m)
        else:
            assert block_len % (self.nt * m) == 0, (block_len, self.nt, m)
            per_shard = block_len // self.nt
        self.local_len = per_shard
        self.block_len = per_shard * self.nt
        self.local_chan_len = self.local_len // self.D
        self.local_demod_len = self.local_chan_len // Q1 * P1
        self.local_audio_len = self.local_demod_len // Q2 * P2
        self.centers = jnp.asarray(
            channel_centers(self.M, sample_rate), jnp.float32)

    # --- carried state ---
    # phase_base: per-demod NCO phase at block start (identical across time
    #   shards). Halo carries (h_*): per-(time, chan) device buffers holding
    #   what the cyclic permute delivered last block (see streaming_halo).
    def init_state(self):
        nt, nd = self.nt, self.n_demods
        return {
            "phase_base": jnp.zeros(nd, jnp.float32),
            "h_chan": jnp.zeros((nt, self.chan.hist_len), jnp.complex64),
            "h_fe": jnp.zeros((nt, nd, self.fe_rs.hist_len), jnp.complex64),
            # freqdem seed 1+0j matches FreqDem.init_state (first sample's
            # phase difference is the true phase, not arctan2(0,0)).
            "h_fd": jnp.ones((nt, nd), jnp.complex64),
            "h_au": jnp.zeros((nt, nd, self.au_rs.hist_len), jnp.float32),
        }

    def state_specs(self):
        return {
            "phase_base": P("chan"),
            "h_chan": P("time", None),
            "h_fe": P("time", "chan", None),
            "h_fd": P("time", "chan"),
            "h_au": P("time", "chan", None),
        }

    def _shard_body(self, state, iq_local, freqs_local):
        """Runs per-device inside shard_map.

        iq_local: [local_len]; freqs_local: [n_local] demod offsets (Hz);
        halo carries arrive with a leading time-shard axis of 1.
        """
        t_idx = jax.lax.axis_index("time")

        # ---- stage 1: time-sharded channelizer (halo = raw sample tail) ----
        z, c_chan = streaming_halo(iq_local, self.chan.hist_len,
                                   state["h_chan"][0], "time")
        hist = z[: self.chan.hist_len]
        x = z[self.chan.hist_len:]
        # Parity is 0 everywhere because local_len/D is even.
        (_, _), chans = self.chan.apply(
            (hist, jnp.zeros((), jnp.int32)), x)     # [M, local_chan_len]

        # ---- stage 2: route demods to channels ----
        dist = jnp.abs(freqs_local[:, None] - self.centers[None, :])
        ci = jnp.argmin(dist, axis=-1)
        xs = jnp.take(chans, ci, axis=0)             # [n_local, Lc]
        omega = (TWO_PI * (self.centers[ci] - freqs_local)
                 / self.chan_rate)                   # mix-down NCO

        # ---- stage 3: NCO with closed-form phase continuity ----
        phase_base = state["phase_base"]             # [n_local]
        Lc = self.local_chan_len
        phase0 = jnp.mod(phase_base + omega * (t_idx * Lc), TWO_PI)
        k = jnp.arange(Lc, dtype=jnp.float32)
        theta = jnp.mod(phase0[:, None] + omega[:, None] * k[None, :],
                        TWO_PI)
        xs = xs * jax.lax.complex(jnp.cos(theta), jnp.sin(theta))

        # ---- stage 4: resample chan_rate -> bandwidth (halo) ----
        xh, c_fe = streaming_halo(xs, self.fe_rs.hist_len,
                                  state["h_fe"][0], "time")
        _, y = self.fe_rs.apply(xh[..., : self.fe_rs.hist_len],
                                xh[..., self.fe_rs.hist_len:])

        # ---- stage 5: FM discriminator (1-sample halo) ----
        yh, c_fd = streaming_halo(y, 1, state["h_fd"][0][..., None], "time")
        _, audio = freqdem_block(yh[..., 0], y, kf=0.5)

        # ---- stage 6: audio resample bandwidth -> audio_rate (halo) ----
        ah, c_au = streaming_halo(audio, self.au_rs.hist_len,
                                  state["h_au"][0], "time")
        _, audio48 = self.au_rs.apply(ah[..., : self.au_rs.hist_len],
                                      ah[..., self.au_rs.hist_len:])

        # ---- stage 7: mix across ALL demods (sum local + psum 'chan') ----
        mix = jax.lax.psum(jnp.sum(audio48, axis=0), "chan")
        level = 20.0 * jnp.log10(
            jnp.maximum(jnp.mean(jnp.abs(audio48), axis=-1), 1e-20))

        # ---- state advance: phase base moves by a whole global block ----
        new_base = jnp.mod(
            phase_base + omega * (self.nt * Lc), TWO_PI)
        new_state = {"phase_base": new_base,
                     "h_chan": c_chan[None],
                     "h_fe": c_fe[None],
                     "h_fd": c_fd[None, ..., 0],
                     "h_au": c_au[None]}
        return new_state, audio48, mix, level

    def make_step(self):
        """Returns jitted step(state, iq[block_len], freqs[n_demods]) ->
        (state, audio[n_demods, audio_len], mix[audio_len], level[n_demods]).
        """
        fn = jax.shard_map(
            self._shard_body, mesh=self.mesh,
            in_specs=(self.state_specs(), P("time"), P("chan")),
            out_specs=(self.state_specs(),
                       P("chan", "time"), P("time"), P("chan")),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,))

    def place_state(self, state):
        return jax.device_put(state, {
            k: jax.sharding.NamedSharding(self.mesh, s)
            for k, s in self.state_specs().items()})

    # --- convenience: sharded input placement ---
    def shard_iq(self, iq: np.ndarray):
        sh = jax.sharding.NamedSharding(self.mesh, P("time"))
        return jax.device_put(jnp.asarray(iq, jnp.complex64), sh)
