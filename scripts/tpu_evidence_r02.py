"""Round-2 real-chip evidence run (one process = one chip holder):

1. bench config #4 (16-demod FM farm, unified planar ReceiverPipeline)
2. 256-demod/chip north-star-shaped config (BASELINE.json)
3. roofline: XLA cost_analysis of the compiled step -> FLOPs/sample,
   bytes/sample vs chip peaks
4. ShardedReceiver on an n=1 mesh on the REAL chip — proves the sharded
   planar program (shard_map + collectives) compiles/executes on the TPU
   backend, transferring the 8-device CPU dryrun evidence.

Results append to stdout as JSON lines; run via nohup and poll the log.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench_pipeline(n_demods: int, tag: str):
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC
    from bench import build_pipeline

    rx, controls = build_pipeline(n_demods)
    rng = np.random.default_rng(0)
    K = 8
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

    # Roofline numbers from the compiled module itself.
    cost = {}
    try:
        lowered = jax.jit(multi_step).lower(rx.init_state(), iqs)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        n_samp = K * rx.block_len
        cost = {
            "flops_per_sample": round(float(ca.get("flops", 0)) / n_samp, 1),
            "bytes_per_sample": round(
                float(ca.get("bytes accessed", 0)) / n_samp, 1),
        }
    except Exception as e:          # noqa: BLE001 — report, don't die
        cost = {"cost_analysis_error": repr(e)}

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
    print(json.dumps({"tag": tag, "demods": n_demods,
                      "msps_per_chip": round(msps, 2),
                      "block_len": rx.block_len, **cost}), flush=True)


def sharded_real_chip():
    import jax
    from cubicsdr_tpu.ops.planar import from_complex
    from cubicsdr_tpu.parallel import make_receiver_mesh
    from cubicsdr_tpu.parallel.sharded import ShardedReceiver
    from cubicsdr_tpu.receiver import DemodGroupSpec

    mesh = make_receiver_mesh(n_time=1, n_chan=1,
                              devices=jax.devices()[:1])
    fs = 1_000_000
    groups = [DemodGroupSpec("FM", 200000, 2),
              DemodGroupSpec("AM", 6000, 1),
              DemodGroupSpec("BPSK", 20000, 1)]
    rx = ShardedReceiver(fs, num_channels=8, groups=groups, mesh=mesh)
    controls = rx.control_template()
    controls[0]["frequency"][:] = 150e3
    controls[1]["frequency"][:] = 120e3
    controls[2]["frequency"][:] = -300e3
    step = rx.make_step()
    st = rx.place_state(rx.init_state())
    rng = np.random.default_rng(1)
    iq = (rng.standard_normal(rx.block_len)
          + 1j * rng.standard_normal(rx.block_len)).astype(np.complex64)
    t0 = time.perf_counter()
    st, out = step(st, rx.shard_iq(iq), controls)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    mix = np.asarray(out["mix"])
    print(json.dumps({
        "tag": "sharded_n1_real_chip", "ok": bool(np.isfinite(mix).all()),
        "mix_shape": list(mix.shape), "first_step_s": round(dt, 1),
        "platform": jax.devices()[0].platform,
    }), flush=True)


if __name__ == "__main__":
    import jax
    print(json.dumps({"tag": "env",
                      "devices": [str(d) for d in jax.devices()]}),
          flush=True)
    bench_pipeline(16, "bench_demod16")
    bench_pipeline(256, "bench_demod256")
    sharded_real_chip()
    print(json.dumps({"tag": "done"}), flush=True)
