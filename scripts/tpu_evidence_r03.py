"""Round-3 real-chip evidence, phase 1 (at HEAD, pre-perf-work):

1. bench config #4 (16-demod unified pipeline) — continuity check vs r02.
2. 256-demod north-star config at HEAD (folded-NCO + blocked DC landed
   AFTER the r02 256-demod measurement; VERDICT r02 weak #1 says the
   headline is stale) + compiled-module cost analysis.
3. Sharded n=1-mesh steady-state throughput vs the unsharded pipeline at
   the SAME config/block (shard_map overhead number, VERDICT r02 item 9),
   both with K-block scan dispatch.

One process = one chip holder. JSON lines to stdout; run via nohup.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(step, state, iqs, n_samples, n_iters=15, warmup=2):
    import jax
    for _ in range(warmup):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, outs = step(state, iqs)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return n_samples * n_iters / dt / 1e6


def bench_pipeline(n_demods: int, tag: str, use_pallas=None, K=8):
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC
    from bench import build_pipeline

    rx, controls = build_pipeline(n_demods, use_pallas=use_pallas)
    rng = np.random.default_rng(0)
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

    msps = timed(step, rx.init_state(), iqs, K * rx.block_len)
    print(json.dumps({"tag": tag, "demods": n_demods,
                      "msps_per_chip": round(msps, 2),
                      "block_len": rx.block_len, **cost}), flush=True)
    return msps


def sharded_vs_unsharded(K=8, block_len=None, use_pallas=False,
                         n_demods=16):
    """n=1 mesh ShardedReceiver vs the plain pipeline at the SAME config
    and Pallas setting — the delta is pure shard_map/collective overhead."""
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC
    from cubicsdr_tpu.parallel import make_receiver_mesh
    from cubicsdr_tpu.parallel.sharded import ShardedReceiver
    from cubicsdr_tpu.receiver import ReceiverPipeline, DemodGroupSpec

    fs = 8_000_000
    groups = [DemodGroupSpec("FM", 200000, n_demods)]
    mesh = make_receiver_mesh(n_time=1, n_chan=1,
                              devices=jax.devices()[:1])
    srx = ShardedReceiver(fs, num_channels=16, groups=groups, mesh=mesh,
                          block_len=block_len, use_pallas=use_pallas)
    controls = srx.control_template()
    controls[0]["frequency"][:] = np.asarray(
        [((i % 16) - 8) * 500e3 + 20e3 for i in range(n_demods)],
        np.float32)

    rng = np.random.default_rng(0)
    iq_np = rng.standard_normal((2, K, srx.block_len)).astype(np.float32)

    # --- sharded, K-block scan around the shard_mapped body ---
    from jax.sharding import PartitionSpec as P
    body = jax.shard_map(
        srx._shard_body, mesh=srx.mesh,
        in_specs=(srx.state_specs(), P("time"), srx._control_specs()),
        out_specs=(srx.state_specs(), srx._out_specs()),
        check_vma=False)

    def multi_sharded(state, iqs):
        def one(s, iq):
            s, out = body(s, iq, controls)
            return s, (out["mix"],
                       jnp.concatenate([g["level"]
                                        for g in out["groups"]], -1))
        return jax.lax.scan(one, state, iqs)

    sh = jax.sharding.NamedSharding(srx.mesh, P(None, "time"))
    iqs_sh = PC(jax.device_put(iq_np[0], sh), jax.device_put(iq_np[1], sh))
    sstep = jax.jit(multi_sharded, donate_argnums=(0,))
    msps_sharded = timed(sstep, srx.place_state(srx.init_state()), iqs_sh,
                         K * srx.block_len)
    print(json.dumps({"tag": "sharded_n1_steady", "msps_per_chip":
                      round(msps_sharded, 2), "block_len": srx.block_len,
                      "fused": srx.fused_route}), flush=True)

    # --- unsharded, same block_len, no pallas ---
    from cubicsdr_tpu.ops.planar import PLANAR
    rx = ReceiverPipeline(fs, groups, dtype=PLANAR, use_pallas=use_pallas,
                          block_len=srx.block_len)
    c2 = rx.control_template()
    c2[0]["frequency"] = controls[0]["frequency"]

    def multi_plain(state, iqs):
        def one(s, iq):
            s, out = rx.apply(s, (iq, c2))
            return s, (out["mix"],
                       jnp.concatenate([g["level"]
                                        for g in out["groups"]], -1))
        return jax.lax.scan(one, state, iqs)

    iqs_p = PC(jnp.asarray(iq_np[0]), jnp.asarray(iq_np[1]))
    pstep = jax.jit(multi_plain, donate_argnums=(0,))
    msps_plain = timed(pstep, rx.init_state(), iqs_p, K * rx.block_len)
    print(json.dumps({
        "tag": "unsharded_same_config", "msps_per_chip":
        round(msps_plain, 2),
        "shard_overhead_pct": round(100 * (1 - msps_sharded /
                                           max(msps_plain, 1e-9)), 1),
    }), flush=True)


def fused_check():
    """REAL-chip audio quality: demodulate a synthetic FM station with the
    fused (Pallas) and XLA pipelines and report each one's recovered-tone
    SNR. Cross-comparing outputs is the wrong test on TPU (before the
    round-3 precision work, the XLA einsums ran at the MXU's default
    one-pass-bf16, -51 dB rms vs float64 truth); with signal-path matmuls
    at HIGHEST and the kernel at split_bf16, both measure 85.3 dB."""
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC, PLANAR
    from cubicsdr_tpu.receiver import ReceiverPipeline, DemodGroupSpec

    fs = 8_000_000
    specs = [DemodGroupSpec("FM", 200000, 8)]
    rx0 = ReceiverPipeline(fs, specs, dtype=PLANAR)
    m = int(np.lcm(rx0.group_block_multiple(0), rx0._decim * 128))
    L = 2 * m
    station, tone = 1_020_000.0, 1000.0
    n_blocks = 3
    t = np.arange(n_blocks * L) / fs
    msg = np.sin(2 * np.pi * tone * t)
    iq_all = np.exp(1j * (2 * np.pi * station * t
                          + 2 * np.pi * 75e3 * np.cumsum(msg) / fs)
                    ).astype(np.complex64)

    def run(use_pallas):
        rx = ReceiverPipeline(fs, specs, dtype=PLANAR,
                              use_pallas=use_pallas, block_len=L)
        controls = rx.control_template()
        controls[0]["frequency"] = np.full(8, station, np.float32)
        step = jax.jit(rx.apply)
        st = rx.init_state()
        audio = []
        for b in range(n_blocks):
            blk = iq_all[b * L:(b + 1) * L]
            iq = PC(jnp.asarray(blk.real), jnp.asarray(blk.imag))
            st, out = step(st, (iq, controls))
            audio.append(np.asarray(out["groups"][0]["audio"][0, 0]))
        a = np.concatenate(audio)[len(audio[0]) // 2:]
        w = np.hanning(len(a))
        X = np.abs(np.fft.rfft(a * w)) ** 2
        f = np.fft.rfftfreq(len(a), 1.0 / rx.audio_rate)
        k = int(np.argmax(X))
        sig = X[max(0, k - 3): k + 4].sum()
        snr = 10 * np.log10(sig / max(X.sum() - sig, 1e-30))
        return bool(rx.fused_route[0]) if use_pallas else False, \
            round(float(f[k]), 1), round(float(snr), 1)

    fused_on, f_p, snr_p = run(True)
    _, f_x, snr_x = run(False)
    print(json.dumps({"tag": "fused_check", "fused_route": fused_on,
                      "peak_hz": [f_p, f_x],
                      "snr_db": {"fused": snr_p, "xla": snr_x},
                      "ok": fused_on and abs(f_p - 1000.0) < 5
                      and snr_p >= snr_x - 0.5 and snr_p > 40}),
          flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["all", "bench", "sharded", "check"],
                    default="all")
    ap.add_argument("--sharded-block", type=int, default=None)
    ap.add_argument("--sharded-pallas", action="store_true")
    ap.add_argument("--sharded-demods", type=int, default=16)
    args = ap.parse_args()
    import jax
    print(json.dumps({"tag": "env",
                      "devices": [str(d) for d in jax.devices()]}),
          flush=True)
    if args.only == "check":
        fused_check()
    if args.only in ("all", "bench"):
        bench_pipeline(16, "bench_demod16")
        bench_pipeline(256, "bench_demod256")
    if args.only in ("all", "sharded"):
        try:
            sharded_vs_unsharded(n_demods=args.sharded_demods,
                                 block_len=args.sharded_block,
                                 use_pallas=args.sharded_pallas)
        except Exception as e:          # noqa: BLE001
            print(json.dumps({"tag": "sharded_error", "err": repr(e)}),
                  flush=True)
    print(json.dumps({"tag": "done"}), flush=True)
