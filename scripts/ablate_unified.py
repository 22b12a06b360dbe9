"""Per-stage timing of the unified ReceiverPipeline on the real chip —
find what separates it from the bare planar FM farm (r01: 1260-1369 MS/s).

Times cumulative subchains of the 16-demod bench config:
  chan      : PFBCH2 channelizer (+ DC block)
  +route    : channel gather + frontend NCO+resample
  +kit      : modem kits (freqdem + audio resample)
  +gate+mix : squelch gates + stereo mixer (the full apply)
Also A/B: pallas vs XLA channelizer, K=8 vs K=32 scan batching.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, state, iqs, n=10):
    import jax
    state, out = fn(state, iqs)
    jax.block_until_ready(out)
    state, out = fn(state, iqs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        state, out = fn(state, iqs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--demods", type=int, default=16)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC, pc_take
    from cubicsdr_tpu.receiver.frontend import shift_omegas
    from cubicsdr_tpu.ops.channelizer import channel_centers
    from bench import build_pipeline

    rx, controls = build_pipeline(args.demods)
    K = 8
    rng = np.random.default_rng(0)
    iqs = PC(jnp.asarray(rng.standard_normal((K, rx.block_len))
                         .astype(np.float32)),
             jnp.asarray(rng.standard_normal((K, rx.block_len))
                         .astype(np.float32)))
    n_samp = K * rx.block_len

    centers = jnp.asarray(channel_centers(rx.M, rx.sample_rate), jnp.float32)
    freqs = jnp.asarray(controls[0]["frequency"], jnp.float32)
    dist = jnp.abs(freqs[:, None] - centers[None, :])
    chan_idx = jnp.argmin(dist, axis=-1)

    def scan(body, init_state):
        def multi(state, iqs):
            return jax.lax.scan(body, state, iqs)
        return jax.jit(multi, donate_argnums=(0,)), init_state

    # 1. channelizer only
    def b_chan(s, iq):
        s, chans = rx.channelizer.apply(s, iq)
        return s, jnp.sum(chans.re) + jnp.sum(chans.im)
    fn, st = scan(b_chan, rx.channelizer.init_state())
    t = timeit(fn, st, iqs)
    print(json.dumps({"stage": "chan", "msps": round(n_samp / t / 1e6, 1)}),
          flush=True)

    # 2. + route + frontend (fused kernel consumes the channel matrix
    # directly; the XLA path gathers per demod)
    from cubicsdr_tpu.receiver.frontend import RoutedChannelFrontend
    fe = rx.frontends[0]
    fused = isinstance(fe, RoutedChannelFrontend)
    def b_route(s, iq):
        sc, sf = s
        sc, chans = rx.channelizer.apply(sc, iq)
        omega = shift_omegas(freqs, centers[chan_idx], rx.chan_rate)
        if fused:
            sf, y = fe.apply(sf, (chans, chan_idx, omega))
        else:
            x = pc_take(chans, chan_idx, axis=-2)
            sf, y = fe.apply(sf, (x, omega))
        return (sc, sf), jnp.sum(y.re) + jnp.sum(y.im)
    fn, st = scan(b_route, (rx.channelizer.init_state(), fe.init_state()))
    t = timeit(fn, st, iqs)
    print(json.dumps({"stage": "+route", "msps": round(n_samp / t / 1e6, 1)}),
          flush=True)

    # 3. + kit
    kit = rx.kits[0]
    def b_kit(s, iq):
        sc, sf, sk = s
        sc, chans = rx.channelizer.apply(sc, iq)
        omega = shift_omegas(freqs, centers[chan_idx], rx.chan_rate)
        if fused:
            sf, y = fe.apply(sf, (chans, chan_idx, omega))
        else:
            x = pc_take(chans, chan_idx, axis=-2)
            sf, y = fe.apply(sf, (x, omega))
        sk, ko = kit.apply(sk, y)
        return (sc, sf, sk), jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(jnp.sum, ko))
    fn, st = scan(b_kit, (rx.channelizer.init_state(), fe.init_state(),
                          kit.init_state()))
    t = timeit(fn, st, iqs)
    print(json.dumps({"stage": "+kit", "msps": round(n_samp / t / 1e6, 1)}),
          flush=True)

    # 4. full apply
    def b_full(s, iq):
        s, out = rx.apply(s, (iq, controls))
        return s, (jnp.sum(out["mix"]), jnp.concatenate([g["level"] for g in out["groups"]], -1))
    fn, st = scan(b_full, rx.init_state())
    t = timeit(fn, st, iqs)
    print(json.dumps({"stage": "full", "msps": round(n_samp / t / 1e6, 1)}),
          flush=True)

    # 5. full apply, XLA channelizer (no pallas)
    rx2, controls2 = build_pipeline(args.demods, use_pallas=False)
    def b_full2(s, iq):
        s, out = rx2.apply(s, (iq, controls2))
        return s, (jnp.sum(out["mix"]), jnp.concatenate([g["level"] for g in out["groups"]], -1))
    fn, st = scan(b_full2, rx2.init_state())
    t = timeit(fn, st, iqs)
    print(json.dumps({"stage": "full_no_pallas",
                      "msps": round(n_samp / t / 1e6, 1)}), flush=True)

    # 6. K=32 batching
    iqs32 = PC(jnp.asarray(rng.standard_normal((32, rx.block_len))
                           .astype(np.float32)),
               jnp.asarray(rng.standard_normal((32, rx.block_len))
                           .astype(np.float32)))
    fn, st = scan(b_full, rx.init_state())
    t = timeit(fn, st, iqs32, n=4)
    print(json.dumps({"stage": "full_K32",
                      "msps": round(32 * rx.block_len / t / 1e6, 1)}),
          flush=True)
    print(json.dumps({"stage": "done"}), flush=True)


if __name__ == "__main__":
    main()
