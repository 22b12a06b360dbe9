"""Perf matrix at HEAD: blocked-DC landed; A/B the folded-NCO frontend and
resampler tile size, then the best variant at K=32 and 256 demods."""

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
    return round(K * rx.block_len * n / dt / 1e6, 1)


def main():
    from bench import build_pipeline
    from cubicsdr_tpu.receiver.frontend import ChannelFrontend
    import cubicsdr_tpu.ops.resample as rs

    orig_choose = rs._choose_tile

    def set_tile(t):
        rs._choose_tile = (lambda n_out, P, lo=64, hi=512, target=t:
                           orig_choose(n_out, P, lo, hi, t))

    results = {}
    for fold in (True, False):
        for tile in (64, 128):
            ChannelFrontend.FOLD_NCO = fold
            set_tile(tile)
            rx, c = build_pipeline(16)
            key = f"fold{int(fold)}_tile{tile}"
            results[key] = timed_full(rx, c)
            print(json.dumps({"v": key, "msps": results[key]}), flush=True)

    best = max(results, key=results.get)
    fold = best.startswith("fold1")
    tile = int(best.split("tile")[1])
    ChannelFrontend.FOLD_NCO = fold
    set_tile(tile)
    rx, c = build_pipeline(16)
    print(json.dumps({"v": f"best_{best}_K32",
                      "msps": timed_full(rx, c, K=32, n=4)}), flush=True)
    rx, c = build_pipeline(256)
    print(json.dumps({"v": f"best_{best}_demod256",
                      "msps": timed_full(rx, c)}), flush=True)
    print(json.dumps({"v": "done", "best": best}), flush=True)


if __name__ == "__main__":
    main()
