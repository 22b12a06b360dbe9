"""Dispatch-amortization sweep: K blocks/scan x block_len, pallas path."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cubicsdr_tpu.ops.planar import PC
from cubicsdr_tpu.receiver.planar_fm import PlanarFMFarm


def run(K, blk_mult, n_iters=10):
    fs = 8_000_000
    N = 16
    base = PlanarFMFarm(fs, num_channels=16, n_demods=N, use_pallas=True)
    L = int(base.block_len * blk_mult)
    L -= L % base.block_multiple
    L -= L % (base.D * 128)
    farm = PlanarFMFarm(fs, num_channels=16, n_demods=N, block_len=L,
                        use_pallas=True)
    freqs = jnp.asarray([(i - N // 2) * 500e3 + 20e3 for i in range(N)],
                        jnp.float32)
    rng = np.random.default_rng(0)
    iqs = PC(jnp.asarray(rng.standard_normal((K, L)).astype(np.float32)),
             jnp.asarray(rng.standard_normal((K, L)).astype(np.float32)))

    def multi(state, iqs):
        def body(s, iq):
            s, audio, mix, level = farm.step(s, iq, freqs)
            return s, (mix, level)
        return jax.lax.scan(body, state, iqs)

    step = jax.jit(multi, donate_argnums=(0,))
    state = farm.init_state()
    for _ in range(2):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    ms = n_iters * K * L / dt / 1e6
    print(f"K={K:3d} L={L:9d}: {ms:8.1f} MS/s", flush=True)


if __name__ == "__main__":
    import sys
    for spec in sys.argv[1:]:
        k, m = spec.split(":")
        run(int(k), float(m))
