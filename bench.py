"""Single-chip throughput benchmark: IQ Msamples/s through the full
channelize + demod chain (BASELINE.json metric of record).

Config #4 of BASELINE.json: 16-channel polyphase channelizer + 16-demod FM
farm on one chip, planar-complex hot path (the tunneled TPU backend has no
complex64; planar f32 is also the faster TPU-native representation).
Baseline for vs_baseline: the north-star 1 GS/s aggregate on a 16-chip
v5p-16 => 62.5 MS/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC
    from cubicsdr_tpu.receiver.planar_fm import PlanarFMFarm

    # Reference channel sizing: 16 channels <=> 8 MS/s capture
    # (numChannels = ceil(rate/500k), ref: SoapySDRThread.cpp:676-693),
    # keeping 500 kHz spacing so 200 kHz FM stations fit their channels.
    fs = 8_000_000
    n_demods = 16
    # Fused Pallas channelizer on TPU (ops/pallas/pfb.py); the XLA path is
    # the fallback for backends without Mosaic support.
    use_pallas = any(d.platform != "cpu" for d in jax.devices())
    farm = PlanarFMFarm(fs, num_channels=16, n_demods=n_demods,
                        block_len=None,   # ~1M samples/block
                        use_pallas=use_pallas)
    freqs = jnp.asarray(
        [(i - n_demods // 2) * 500e3 + 20e3 for i in range(n_demods)],
        jnp.float32)

    rng = np.random.default_rng(0)
    K = 8      # blocks per dispatch (lax.scan) — amortizes host round-trips
    iqs = PC(jnp.asarray(rng.standard_normal((K, farm.block_len))
                         .astype(np.float32)),
             jnp.asarray(rng.standard_normal((K, farm.block_len))
                         .astype(np.float32)))

    def multi_step(state, iqs):
        def body(s, iq):
            s, audio, mix, level = farm.step(s, iq, freqs)
            return s, (mix, level)
        return jax.lax.scan(body, state, iqs)

    step = jax.jit(multi_step, donate_argnums=(0,))
    state = farm.init_state()
    for _ in range(2):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)

    n_iters = 15
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    msps = K * farm.block_len * n_iters / dt / 1e6
    baseline_per_chip = 1000.0 / 16.0       # MS/s
    print(json.dumps({
        "metric": "iq_msamples_per_sec_per_chip_channelize_demod16",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
