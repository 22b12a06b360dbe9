"""Single-chip throughput benchmark: IQ Msamples/s through the full
channelize + demod chain (BASELINE.json metric of record).

Config #4 of BASELINE.json: 16-channel polyphase channelizer + 16-demod FM
farm on one chip. This drives the SAME class the application runs —
ReceiverPipeline(dtype=PLANAR) with squelch, control vectors, and the audio
mixer in the graph (the tunneled TPU backend has no complex64; planar f32
is also the faster TPU-native representation).

Baseline for vs_baseline: the north-star 1 GS/s aggregate on a 16-chip
v5p-16 => 62.5 MS/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Flags: --demods N (default 16), --block L, --no-pallas.
"""

import argparse
import json
import sys
import time

import numpy as np


def build_pipeline(n_demods: int = 16, block_len: int | None = None,
                   use_pallas: bool | None = None):
    import jax
    from cubicsdr_tpu.ops.planar import PLANAR
    from cubicsdr_tpu.receiver import ReceiverPipeline, DemodGroupSpec

    # Reference channel sizing: 16 channels <=> 8 MS/s capture
    # (numChannels = ceil(rate/500k), ref: SoapySDRThread.cpp:676-693),
    # keeping 500 kHz spacing so 200 kHz FM stations fit their channels.
    fs = 8_000_000
    if use_pallas is None:
        # Fused Pallas channelizer on TPU (ops/pallas/pfb.py); the XLA path
        # is the fallback for backends without Mosaic support.
        use_pallas = any(d.platform != "cpu" for d in jax.devices())
    specs = [DemodGroupSpec("FM", 200000, n_demods)]
    if block_len is None:
        # ~1M samples/block, 128-step aligned for the Pallas kernel's lane
        # tiling (chan_len % 128 == 0).
        rx0 = ReceiverPipeline(fs, specs, dtype=PLANAR)
        m = int(np.lcm(rx0.group_block_multiple(0), rx0._decim * 128))
        block_len = max(m, ((1 << 20) // m) * m)
    rx = ReceiverPipeline(fs, specs, dtype=PLANAR, use_pallas=use_pallas,
                          block_len=block_len)
    controls = rx.control_template()
    # Distribute demods across the 16 channels (wrapping for farms >16 —
    # the 256-demod north-star packs 16 stations per channel).
    controls[0]["frequency"] = np.asarray(
        [((i % 16) - 8) * 500e3 + 20e3 for i in range(n_demods)],
        np.float32)
    return rx, controls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demods", type=int, default=16)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC

    rx, controls = build_pipeline(
        args.demods, args.block, False if args.no_pallas else None)

    rng = np.random.default_rng(0)
    K = 8      # blocks per dispatch (lax.scan) — amortizes host round-trips
    iqs = PC(jnp.asarray(rng.standard_normal((K, rx.block_len))
                         .astype(np.float32)),
             jnp.asarray(rng.standard_normal((K, rx.block_len))
                         .astype(np.float32)))

    def multi_step(state, iqs):
        def body(s, iq):
            s, out = rx.apply(s, (iq, controls))
            level = jnp.concatenate(
                [g["level"] for g in out["groups"]], axis=-1)
            return s, (out["mix"], level)
        return jax.lax.scan(body, state, iqs)

    step = jax.jit(multi_step, donate_argnums=(0,))
    state = rx.init_state()
    for _ in range(2):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)

    n_iters = 15
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    msps = K * rx.block_len * n_iters / dt / 1e6
    baseline_per_chip = 1000.0 / 16.0       # MS/s
    print(json.dumps({
        "metric": "iq_msamples_per_sec_per_chip_channelize_demod16",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
