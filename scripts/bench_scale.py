"""Dispatch-amortization sweep on the unified ReceiverPipeline:
K blocks/scan x block-length multiplier, pallas channelizer path."""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from cubicsdr_tpu.ops.planar import PC       # noqa: E402
from bench import build_pipeline             # noqa: E402


def run(K, blk_mult, n_iters=10):
    rx0, _ = build_pipeline(16)
    L = int(rx0.block_len * blk_mult)
    m = int(np.lcm(rx0.group_block_multiple(0), rx0._decim * 128))
    L = max(m, L - L % m)
    rx, controls = build_pipeline(16, block_len=L)
    rng = np.random.default_rng(0)
    iqs = PC(jnp.asarray(rng.standard_normal((K, L)).astype(np.float32)),
             jnp.asarray(rng.standard_normal((K, L)).astype(np.float32)))

    def multi(state, iqs):
        def body(s, iq):
            s, out = rx.apply(s, (iq, controls))
            return s, (out["mix"],
                       jnp.concatenate([g["level"]
                                        for g in out["groups"]], -1))
        return jax.lax.scan(body, state, iqs)

    step = jax.jit(multi, donate_argnums=(0,))
    state = rx.init_state()
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
    for K, bm in [(4, 1), (8, 1), (16, 1), (8, 2), (8, 4), (4, 8)]:
        run(K, bm)
