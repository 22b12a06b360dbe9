"""Targeted perf experiments for the unified pipeline on the real chip.

Variants timed (16-demod bench config, full apply, K=8 scan):
  base          : current defaults (O-tile 128 Toeplitz resampler, DC, squelch)
  no_dc         : skip the channel-0 DC blocker (isolate its cost)
  tile64/256/512: resampler Toeplitz output-tile size sweep (density vs MXU)
  convform      : conv-form resampler instead of the Toeplitz matmul
  K32           : 32 blocks per dispatch
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed_full(rx, controls, K=8, n=10):
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC

    rng = np.random.default_rng(0)
    iqs = PC(jnp.asarray(rng.standard_normal((K, rx.block_len))
                         .astype(np.float32)),
             jnp.asarray(rng.standard_normal((K, rx.block_len))
                         .astype(np.float32)))

    def multi(state, iqs):
        def body(s, iq):
            s, out = rx.apply(s, (iq, controls))
            return s, (jnp.sum(out["mix"]),
                       jnp.concatenate([g["level"]
                                        for g in out["groups"]], -1))
        return jax.lax.scan(body, state, iqs)

    step = jax.jit(multi, donate_argnums=(0,))
    state = rx.init_state()
    for _ in range(2):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(n):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return K * rx.block_len * n / dt / 1e6


def main():
    from bench import build_pipeline
    import cubicsdr_tpu.ops.resample as rs

    rx, controls = build_pipeline(16)
    print(json.dumps({"v": "base", "msps": round(timed_full(rx, controls),
                                                 1)}), flush=True)

    # DC blocker cost: stub it to identity.
    dc0 = rx.dc

    class _NoDC:
        def init_state(self):
            return dc0.init_state()

        def apply(self, st, x):
            return st, x
    rx.dc = _NoDC()
    print(json.dumps({"v": "no_dc", "msps": round(timed_full(rx, controls),
                                                  1)}), flush=True)
    rx.dc = dc0

    # Tile-size sweep: _choose_tile target monkeypatch, fresh pipelines.
    orig_choose = rs._choose_tile
    for tgt in (64, 256, 512):
        rs._choose_tile = (lambda t: (lambda n_out, P, lo=64, hi=512,
                                      target=t:
                                      orig_choose(n_out, P, lo, hi, t)))(tgt)
        rx2, c2 = build_pipeline(16)
        print(json.dumps({"v": f"tile{tgt}",
                          "msps": round(timed_full(rx2, c2), 1)}),
              flush=True)
    rs._choose_tile = orig_choose

    # Conv-form resampler.
    rs._choose_tile = lambda *a, **k: None
    rx3, c3 = build_pipeline(16)
    print(json.dumps({"v": "convform",
                      "msps": round(timed_full(rx3, c3), 1)}), flush=True)
    rs._choose_tile = orig_choose

    # Bigger dispatch batch.
    print(json.dumps({"v": "K32",
                      "msps": round(timed_full(rx, controls, K=32, n=4),
                                    1)}), flush=True)
    print(json.dumps({"v": "done"}), flush=True)


if __name__ == "__main__":
    main()
