"""Multi-device sharding on the virtual 8-device CPU mesh: halo-exchange
correctness (sharded == single-device bit-ish), graft entry points
(SURVEY.md §4 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cubicsdr_tpu.parallel import make_receiver_mesh
from cubicsdr_tpu.parallel.halo import with_halo
from cubicsdr_tpu.parallel.sharded import ShardedReceiver
from jax.sharding import PartitionSpec as P


def test_devices_available():
    assert len(jax.devices()) == 8


def test_halo_exchange_cyclic():
    mesh = make_receiver_mesh(n_time=4, n_chan=1,
                              devices=jax.devices()[:4])

    def body(x):
        return with_halo(x, 3, "time")

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("time"), out_specs=P("time")))
    x = jnp.arange(32, dtype=jnp.float32)
    sh = jax.sharding.NamedSharding(mesh, P("time"))
    y = np.asarray(fn(jax.device_put(x, sh)))
    # Each 8-sample shard becomes 11: [prev shard's last 3, own 8].
    y = y.reshape(4, 11)
    np.testing.assert_array_equal(y[1], np.r_[5, 6, 7, np.arange(8, 16)])
    np.testing.assert_array_equal(y[0], np.r_[29, 30, 31, np.arange(8)])


@pytest.mark.parametrize("nt,nc", [(4, 2), (8, 1), (2, 2)])
def test_sharded_receiver_matches_reference_chain(nt, nc):
    """The sharded FM farm must equal an unsharded single-device chain on
    the same samples (halo exchange is exact for all FIR stages)."""
    fs = 1_000_000
    mesh = make_receiver_mesh(n_time=nt, n_chan=nc,
                              devices=jax.devices()[: nt * nc])
    n_demods = 2 * nc
    rx = ShardedReceiver(fs, num_channels=8, n_demods=n_demods, mesh=mesh)
    step = rx.make_step()

    # Synthesize stations at two demod frequencies.
    f0, f1 = 150e3, -300e3
    freqs = np.zeros(n_demods, np.float32)
    freqs[0], freqs[1] = f0, f1
    n_blocks = 2
    t = np.arange(n_blocks * rx.block_len) / fs
    msg = np.sin(2 * np.pi * 1000.0 * t)
    iq = (0.7 * np.exp(1j * (2 * np.pi * f0 * t
                             + 2 * np.pi * 75e3 * np.cumsum(msg) / fs))
          + 0.5 * np.exp(2j * np.pi * f1 * t)).astype(np.complex64)

    state = rx.place_state(rx.init_state())
    fq = jax.device_put(jnp.asarray(freqs),
                        jax.sharding.NamedSharding(mesh, P("chan")))
    audio_blocks = []
    for b in range(n_blocks):
        blk = iq[b * rx.block_len:(b + 1) * rx.block_len]
        state, audio, mix, level = step(state, rx.shard_iq(blk), fq)
        audio_blocks.append(np.asarray(audio))
    audio = np.concatenate(audio_blocks, axis=-1)

    # Reference: same chain unsharded via the stateful ops.
    from cubicsdr_tpu.ops.channelizer import ChannelizerPFB2, channel_centers
    from cubicsdr_tpu.ops.freqdem import FreqDem
    from cubicsdr_tpu.ops.resample import RationalResampler, design_ratio
    from cubicsdr_tpu.ops.nco import NCOMixer

    ch = ChannelizerPFB2(8)
    centers = channel_centers(8, fs)
    chan_rate = 2 * fs / 8
    P1, Q1 = design_ratio(200e3 / chan_rate, 500)
    P2, Q2 = design_ratio(48e3 / 200e3, 500)
    for di in (0, 1):
        fsel = freqs[di]
        ci = int(np.argmin(np.abs(fsel - centers)))
        nco = NCOMixer()
        rs1 = RationalResampler(P1, Q1)
        fd = FreqDem(0.5)
        rs2 = RationalResampler(P2, Q2, dtype=jnp.float32)
        st = (ch.init_state(), nco.init_state(), rs1.init_state(),
              fd.init_state(), rs2.init_state())
        outs = []
        omega = 2 * np.pi * (centers[ci] - fsel) / chan_rate
        for b in range(n_blocks):
            blk = jnp.asarray(iq[b * rx.block_len:(b + 1) * rx.block_len])
            s0, chans = ch.apply(st[0], blk)
            s1, y = nco.apply(st[1], (chans[ci], omega))
            s2, y = rs1.apply(st[2], y)
            s3, a = fd.apply(st[3], y)
            s4, a48 = rs2.apply(st[4], a)
            st = (s0, s1, s2, s3, s4)
            outs.append(np.asarray(a48))
        ref = np.concatenate(outs)
        np.testing.assert_allclose(audio[di], ref, atol=2e-3)


def test_graft_entry_single():
    import __graft_entry__
    fn, (state, x) = __graft_entry__.entry()
    state2, mix, level = jax.jit(fn)(state, x)
    assert mix.ndim == 1 and mix.shape[0] > 1000    # mixed audio block
    assert np.isfinite(np.asarray(mix)).all()
    assert level.shape == (16,)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
