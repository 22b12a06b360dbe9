"""A/B bench on the real chip: PlanarFMFarm with and without the fused
Pallas PFBCH2 kernel. Prints MS/s per chip for each variant.

Run:  timeout 3000 python scripts/bench_ab.py
"""

import sys
import time

import numpy as np


def run_variant(use_pallas: bool, n_iters: int = 15) -> float:
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC
    from cubicsdr_tpu.receiver.planar_fm import PlanarFMFarm

    fs = 8_000_000
    n_demods = 16
    farm = PlanarFMFarm(fs, num_channels=16, n_demods=n_demods,
                        block_len=None, use_pallas=use_pallas)
    freqs = jnp.asarray(
        [(i - n_demods // 2) * 500e3 + 20e3 for i in range(n_demods)],
        jnp.float32)
    rng = np.random.default_rng(0)
    K = 8
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
    t0 = time.perf_counter()
    for _ in range(2):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    print(f"[pallas={use_pallas}] warmup+compile {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    ms_per_s = n_iters * K * farm.block_len / dt / 1e6
    print(f"[pallas={use_pallas}] {ms_per_s:.1f} MS/s per chip", flush=True)
    return ms_per_s


if __name__ == "__main__":
    which = sys.argv[1:] or ["base", "pallas"]
    if "base" in which:
        run_variant(False)
    if "pallas" in which:
        run_variant(True)
