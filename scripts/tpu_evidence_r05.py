"""Round-5 on-chip evidence.

digital_check — the FULL digital bank on real hardware: QPSK, QAM-16,
    QAM-256, APSK-16 and GMSK through the fused pipeline, compared
    against the CPU-exact chain (plus FM sanity). QAM-256 is the stress
    case for the split-bf16 kernel's -96 dB floor: decision distances
    shrink 16x vs QPSK, exactly where silent chip-vs-CPU divergence
    would bite (VERDICT r4 item 3; ref: src/modules/modem/digital/
    ModemQAM.cpp:7-14, ModemGMSK.cpp:95-134).

    Agreement is evaluated on DECISION-STABLE samples of the CPU
    reference (same symbol across a +-2 neighborhood): with rectangular
    symbol holds and no clock recovery, transition-straddling samples sit
    arbitrarily close to decision boundaries where a 1e-7 numeric delta
    legitimately flips the argmax on either backend — excluding them
    makes the criterion test NUMERICS, not boundary luck. Interior
    samples (>= 6 of every 8) must agree >= 99.9%.

    Two-phase: `--save ref.npz` on CPU writes the reference (and reports
    tx accuracy as the ground-truth anchor); `--ref ref.npz` on the chip
    compares.

churn_soak — the REAL-TIME churn adversary on hardware: a paced 2.4 MS/s
    cs16 live loop (the production `serve` shape, M=6 fused channelizer)
    while a second thread drives the control plane through add/remove/
    modem-swap/retune/recording/zoom/view/solo/checkpoint cycles. A
    warm-up pass compiles every plan in the cycle (the webview's plan
    cache + the receiver's step cache make repeats free), then the timed
    soak asserts 0 drops and >= 0.98x real time (VERDICT r4 item 4;
    ref: src/demod/DemodulatorPreThread.cpp:105-151 retune-never-
    glitches).

soak — real-time-paced live soak (r04's, now with --format cs16|cs8):
    cs8 halves the wire bytes again, turning the 4.8 MS/s stretch into a
    pass candidate (VERDICT r4 item 8).
"""

import argparse
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FS = 8_000_000
BW = 20000
HOLD = 32                     # slicer samples per coherent data symbol
SYM_LEN = HOLD * (FS // BW)   # capture samples per coherent data symbol
GHOLD = 8                     # integrate-and-dump frames per GMSK bit

# Station offsets: +20 kHz off distinct channel centers (500 kHz grid).
ST_FREQ = {"FM": 1_020_000.0, "QPSK": -1_480_000.0, "QAM16": 2_020_000.0,
           "QAM256": -2_480_000.0, "APSK16": 3_020_000.0,
           "GMSK": -3_480_000.0}
GMSK_SPS = 4                  # slicer frames per GMSK symbol
COHERENT = ("QPSK", "QAM16", "QAM256", "APSK16")


def _tables():
    from cubicsdr_tpu.modems.digital import (apsk_constellation,
                                             psk_constellation,
                                             qam_constellation)
    return {"QPSK": psk_constellation(4),
            "QAM16": qam_constellation(16),
            "QAM256": qam_constellation(256),
            "APSK16": apsk_constellation(16)}


def _capture(L, n_blocks, cal=None, seed=11):
    """Six co-channel stations, each at UNIT amplitude in its own channel.

    The chain applies a deterministic complex gain per station (filter
    group-delay phase + NCO start phase; measured stable to <0.1 deg
    across minutes) and — like the reference's per-sample modemcf
    slicing — performs NO carrier recovery, so coherent constellations
    arrive rotated. ``cal`` maps modem name -> that complex gain; the
    transmitted baseband is PRE-DIVIDED by it so the slicer sees the
    true constellation and tx accuracy anchors to ground truth. The
    calibration is estimated once on the CPU reference and shipped in
    the .npz so both backends synthesize the identical capture."""
    rng = np.random.default_rng(seed)
    n = n_blocks * L
    t = np.arange(n) / FS

    msg = np.sin(2 * np.pi * 1000.0 * t)
    iq = np.exp(1j * (2 * np.pi * ST_FREQ["FM"] * t
                      + 2 * np.pi * 75e3 * np.cumsum(msg) / FS))

    tx = {}
    n_sym = n // SYM_LEN + 1
    for name, pts in _tables().items():
        tx[name] = rng.integers(0, len(pts), n_sym)
        g = (cal or {}).get(name, 1.0)
        bb = np.repeat(pts[tx[name]] / g, SYM_LEN)[:n]
        iq = iq + bb * np.exp(2j * np.pi * ST_FREQ[name] * t)

    # GMSK: MSK-style +-h/(2*sps) frequency keying at the channel's
    # slicing rate; each DATA bit held GHOLD integrate-and-dump frames
    # (frequency keying needs no phase calibration).
    bit_caps = GHOLD * GMSK_SPS * (FS // BW)  # capture samples per bit
    n_bits = n // bit_caps + 1
    tx["GMSK"] = rng.integers(0, 2, n_bits)
    dev = 0.25 / GMSK_SPS * BW                # Hz
    f_t = ST_FREQ["GMSK"] + (tx["GMSK"] * 2.0 - 1.0).repeat(bit_caps)[:n] \
        * dev
    iq = iq + np.exp(1j * 2 * np.pi * np.cumsum(f_t) / FS)

    return iq.astype(np.complex64), tx


def _stable_mask(ref_syms: np.ndarray, k: int = 2) -> np.ndarray:
    """True where the reference decision is locally constant (+-k)."""
    m = np.ones(ref_syms.shape, bool)
    for d in range(1, k + 1):
        m[d:] &= ref_syms[d:] == ref_syms[:-d]
        m[:-d] &= ref_syms[:-d] == ref_syms[d:]
    return m


def digital_check(args):
    import jax
    import jax.numpy as jnp
    from cubicsdr_tpu.ops.planar import PC, PLANAR
    from cubicsdr_tpu.receiver import ReceiverPipeline, DemodGroupSpec

    on_cpu = jax.devices()[0].platform == "cpu"
    specs = [DemodGroupSpec("FM", 200000, 1),
             DemodGroupSpec("QPSK", BW, 1),
             DemodGroupSpec("QAM", BW, 1, settings=(("cons", 16),)),
             DemodGroupSpec("QAM", BW, 1, settings=(("cons", 256),)),
             DemodGroupSpec("APSK", BW, 1, settings=(("cons", 16),)),
             DemodGroupSpec("GMSK", BW, 1,
                            settings=(("sps", GMSK_SPS),))]
    NAMES = ["QPSK", "QAM16", "QAM256", "APSK16", "GMSK"]
    rx0 = ReceiverPipeline(FS, specs, dtype=PLANAR)
    m = int(np.lcm.reduce([rx0.group_block_multiple(i)
                           for i in range(len(specs))]
                          + [rx0._decim * 128]))
    L = max(m, (1 << 19) // m * m)
    n_blocks = 8
    rx = ReceiverPipeline(FS, specs, dtype=PLANAR, block_len=L,
                          use_pallas=not on_cpu)
    controls = rx.control_template()
    controls[0]["frequency"] = np.asarray([ST_FREQ["FM"]], np.float32)
    for gi, name in enumerate(NAMES, start=1):
        controls[gi]["frequency"] = np.asarray([ST_FREQ[name]], np.float32)
    step = jax.jit(rx.apply)

    def run(iq_all, nb, taps_for=()):
        st = rx.init_state()
        syms = {k: [] for k in NAMES}
        evm = {k: [] for k in NAMES}
        audio, taps = [], {k: [] for k in taps_for}
        for b in range(nb):
            blk = iq_all[b * L:(b + 1) * L]
            iq = PC(jnp.asarray(blk.real), jnp.asarray(blk.imag))
            st, out = step(st, (iq, controls))
            for gi, name in enumerate(NAMES, start=1):
                g = out["groups"][gi]
                syms[name].append(np.asarray(g["symbols"][0]))
                evm[name].append(float(np.asarray(g["evm"][0])))
                if name in taps:
                    y = g["iq"]
                    taps[name].append(np.asarray(y.re[0])
                                      + 1j * np.asarray(y.im[0]))
            audio.append(np.asarray(out["groups"][0]["audio"][0, 0]))
        return ({k: np.concatenate(v) for k, v in syms.items()},
                {k: float(np.mean(v[1:])) for k, v in evm.items()},
                audio,
                {k: np.concatenate(v) for k, v in taps.items()})

    tables = _tables()

    def est_gain(tap, txs, pts):
        """Best-delay complex LS gain of the received constellation."""
        rep = np.repeat(pts[txs], HOLD)[:tap.size]
        best = None
        for d in range(3 * HOLD):
            a = tap[d:]
            b2 = rep[:a.size]
            g = np.vdot(b2, a) / np.vdot(b2, b2)
            err = float(np.mean(np.abs(a - g * b2) ** 2))
            if best is None or err < best[0]:
                best = (err, g)
        return complex(best[1])

    if args.save:
        # Calibration pass (CPU truth): estimate each coherent station's
        # chain gain from an uncompensated 2-block run.
        iq_cal, tx_cal = _capture(L, 2)
        _, _, _, taps = run(iq_cal, 2, taps_for=COHERENT)
        cal = {n: est_gain(taps[n], tx_cal[n], tables[n])
               for n in COHERENT}
    else:
        ref = np.load(args.ref)
        cal = {n: complex(ref[f"cal_{n}"]) for n in COHERENT}

    iq_all, tx = _capture(L, n_blocks, cal=cal)
    syms, evm, audio, _ = run(iq_all, n_blocks)

    if args.save:
        def tx_acc(dec, txs, hold, lo, hi, maxd=3 * HOLD):
            """Best-delay accuracy on INTERIOR samples of each hold
            (transition samples ring through the channel filters; the
            chain has no clock recovery — like the reference)."""
            rep = np.repeat(txs, hold)
            best = 0.0
            for d in range(maxd):
                n = min(len(dec) - d, len(rep))
                pos = np.arange(n) % hold
                mask = (pos >= lo) & (pos < hi)
                best = max(best, float(
                    (dec[d:d + n][mask] == rep[:n][mask]).mean()))
            return round(best, 4)

        acc = {}
        for n_ in COHERENT:
            acc[n_] = tx_acc(syms[n_], tx[n_], HOLD,
                             HOLD // 4, 3 * HOLD // 4)
        acc["GMSK"] = tx_acc(syms["GMSK"], tx["GMSK"], GHOLD, 2, 6)
        np.savez(args.save, evm=json.dumps(evm),
                 **{f"cal_{k}": np.complex128(v) for k, v in cal.items()},
                 **{f"sym_{k}": v for k, v in syms.items()})
        print(json.dumps({"tag": "digital_check_r05_ref_saved",
                          "platform": jax.devices()[0].platform,
                          "n_syms": {k: int(v.size)
                                     for k, v in syms.items()},
                          "cal": {k: [round(abs(v), 4),
                                      round(float(np.degrees(
                                          np.angle(v))), 2)]
                                  for k, v in cal.items()},
                          "tx_accuracy_interior": acc,
                          "evm": evm}), flush=True)
        return

    ref_evm = json.loads(str(ref["evm"]))
    res = {"tag": "digital_check_r05", "fused_route": rx.fused_route,
           "platform": jax.devices()[0].platform}
    ok = True
    for name in NAMES:
        a, b = ref[f"sym_{name}"], syms[name]
        n = min(a.size, b.size)
        a, b = a[:n], b[:n]
        mask = _stable_mask(a)
        agree = float((a[mask] == b[mask]).mean())
        raw = float((a == b).mean())
        d_evm = abs(ref_evm[name] - evm[name])
        res[name] = {"stable_samples": int(mask.sum()),
                     "stable_frac": round(float(mask.mean()), 3),
                     "agreement": round(agree, 5),
                     "agreement_raw": round(raw, 5),
                     "evm_chip": round(evm[name], 5),
                     "evm_delta": round(d_evm, 6)}
        ok = ok and agree >= 0.999 and d_evm < 0.02 \
            and float(mask.mean()) > 0.5
    a = np.concatenate(audio)[len(audio[0]) // 2:]
    X = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    f = np.fft.rfftfreq(len(a), 1.0 / rx.audio_rate)
    k = int(np.argmax(X))
    res["fm_tone_hz"] = round(float(f[k]), 1)
    sig = X[max(0, k - 3): k + 4].sum()
    res["fm_snr_db"] = round(10 * np.log10(
        sig / max(X.sum() - sig, 1e-30)), 1)
    ok = ok and abs(f[k] - 1000.0) < 5
    res["ok"] = bool(ok)
    print(json.dumps(res), flush=True)


class _PacedSource:
    """Emits int blocks at the capture's real-time rate (the SDR role).
    ``reset()`` re-bases the schedule to NOW — a long warm-up/compile
    phase must not leave a backlog that the source then sprays at full
    speed through the measured window (that backlog shed as hundreds of
    MS of 'drops' in the first chip churn run)."""

    def __init__(self, blocks, L, rate):
        self.blocks, self.L, self.rate = blocks, L, rate
        self.stopping = False
        self._t0 = None
        self._i = 0

    def reset(self):
        self._t0 = time.perf_counter()
        self._i = 0

    def __iter__(self):
        self.reset()
        while not self.stopping:
            due = self._t0 + (self._i + 1) * self.L / self.rate
            now = time.perf_counter()
            if due > now:
                time.sleep(due - now)
            yield self.blocks[self._i % len(self.blocks)]
            self._i += 1

    def stop(self):
        self.stopping = True


def churn_soak(args):
    import urllib.request
    import jax
    from cubicsdr_tpu.app.runner import LiveReceiver
    from cubicsdr_tpu.app.webview import WebViewer
    from cubicsdr_tpu.ops.planar import PLANAR
    from cubicsdr_tpu.receiver import (DemodulatorMgr, DemodGroupSpec,
                                       ReceiverPipeline,
                                       plan_from_manager,
                                       controls_from_manager)

    on_cpu = jax.devices()[0].platform == "cpu"
    rate = 2_400_000.0
    dt_np = {"cs16": np.int16, "cs8": np.int8}[args.format]
    full = float(np.iinfo(dt_np).max)
    # Every plan the churn cycle visits; the pinned block length is a
    # common multiple of ALL of them, so no rebuild ever changes the
    # wideband format (which would rebuild the ring and silently drop
    # its in-flight samples — the 0-drop criterion must stay strict).
    cfgs = [
        [DemodGroupSpec("FM", 200000, 1)],
        [DemodGroupSpec("FM", 200000, 1), DemodGroupSpec("AM", 10000, 1)],
        [DemodGroupSpec("FM", 200000, 1),
         DemodGroupSpec("NBFM", 12500, 1)],
        [DemodGroupSpec("FM", 200000, 1),
         DemodGroupSpec("NBFM", 10000, 1)],
    ]
    m = 1
    for specs_i in cfgs:
        r0 = ReceiverPipeline(rate, specs_i, dtype=PLANAR)
        for gi in range(len(specs_i)):
            m = int(np.lcm(m, r0.group_block_multiple(gi)))
        m = int(np.lcm(m, r0._decim * 128))
        for fe in r0.frontends:
            # Fused-route tiling (choose_block_len's pallas branch):
            # keep every plan's per-group n_out 128-aligned so the
            # fused kernel stays eligible through the whole cycle.
            m = int(np.lcm(m, r0._decim * fe.Q * 128))
    L = ((1 << 20) // m + 1) * m
    assert L <= (1 << 23), f"churn block too large: {L}"

    mgr = DemodulatorMgr()
    mgr.new_demodulator(100e6 + 200e3, "FM", 200000)   # the survivor
    specs, keyed = plan_from_manager(mgr)
    rx = ReceiverPipeline(rate, specs, dtype=PLANAR,
                          use_pallas=not on_cpu, block_len=L)
    controls = controls_from_manager(mgr, rx, keyed, 100e6)

    # Synthesized FM station at +200 kHz carrying a 1 kHz tone, CS16.
    n = 4 * L
    t = np.arange(n) / rate
    msg = np.sin(2 * np.pi * 1000.0 * t)
    iqc = 0.5 * np.exp(1j * (2 * np.pi * 200e3 * t
                             + 2 * np.pi * 75e3 * np.cumsum(msg) / rate))
    raw = np.stack([(iqc.real * full).astype(dt_np),
                    (iqc.imag * full).astype(dt_np)])
    blocks = [np.ascontiguousarray(raw[:, b * L:(b + 1) * L])
              for b in range(4)]

    src = _PacedSource(blocks, L, rate)
    lr = LiveReceiver(rx, controls, src, center_freq=100e6,
                      waterfall_fft=1024, waterfall_lines=64,
                      ring_seconds=8.0, ingest_dtype=dt_np)
    viewer = WebViewer(lr, mgr, keyed, port=0).start()
    port = viewer.port

    def ctl(body, path="/api/control"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(body).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=1200) as r:
            return json.loads(r.read())

    consumer_exc = []
    stop = threading.Event()

    def consume():
        try:
            while not stop.is_set():
                lr.run_blocks(max_blocks=4)
        except Exception as e:               # noqa: BLE001
            consumer_exc.append(repr(e))

    import tempfile
    tmp = tempfile.mkdtemp()

    def churn_cycle():
        ops = [
            {"action": "add", "freq": 100e6 - 300e3, "type": "AM",
             "bandwidth": 10000},                       # plan: FM+AM10k
            {"action": "set", "index": 1, "key": "type",
             "value": "NBFM"},                          # FM+NBFM12.5k
            {"action": "set", "index": 1, "key": "bandwidth",
             "value": 10000},                           # FM+NBFM10k
            {"action": "set", "index": 1, "key": "frequency",
             "value": 100e6 - 280e3},
            {"action": "set", "index": 0, "key": "recording",
             "value": True, "path": tmp + "/rec"},
            {"action": "set", "index": 0, "key": "recording",
             "value": False},
            {"action": "zoom", "offset": 200e3, "bandwidth": 300e3},
            {"action": "view", "index": 0},
            {"action": "audio_solo", "index": 0},
            {"action": "display", "lps": 20.0},
            {"action": "audio_solo", "index": None},
            {"action": "view", "index": None},
            {"action": "zoom", "offset": None},
            {"action": "display", "lps": 30.0},
            {"action": "remove", "index": 1},           # back to FM only
        ]
        for op in ops:
            r = ctl(op)
            assert r.get("ok"), (op, r)
            assert lr.pipeline.block_len == L, \
                (op, lr.pipeline.block_len, L)
            time.sleep(0.3)
        r = ctl({"op": "checkpoint", "path": tmp + "/ck.json"},
                path="/api/session")
        assert r.get("ok"), r
        r = ctl({"op": "restore", "path": tmp + "/ck.json"},
                path="/api/session")
        assert r.get("ok"), r
        assert lr.pipeline.block_len == L

    # Phase 1 — WARM: compile every program in the cycle while streaming
    # best-effort (drops expected and irrelevant here; the plan/step
    # caches make phase 2's repeats compile-free).
    lr.start_producer()
    th = threading.Thread(target=consume, daemon=True)
    th.start()
    t0 = time.perf_counter()
    churn_cycle()
    churn_cycle()             # second pass proves the caches hold
    warm_s = time.perf_counter() - t0
    assert not consumer_exc, consumer_exc

    # Probe the link's CURRENT wire rate at this row's format so the
    # result is self-describing (the tunnel varies hour to hour).
    import jax.numpy as jnp
    probe = jax.jit(lambda a, b: (a.astype(jnp.float32).sum()
                                  + b.astype(jnp.float32).sum()))
    float(probe(blocks[0][0], blocks[0][1]))
    t0 = time.perf_counter()
    for i in (1, 2):
        float(probe(jnp.asarray(blocks[i][0]),
                    jnp.asarray(blocks[i][1])))
    wire_mbps = round(2 * blocks[0].nbytes
                      / (time.perf_counter() - t0) / 1e6, 1)

    # Phase 2 — MEASURE: re-base the source's real-time schedule (the
    # warm-up backlog must not spray through the window), reset
    # counters, soak with continuous churn.
    src.reset()
    time.sleep(2 * L / rate)
    lr.metrics = type(lr.metrics)()
    t0 = time.perf_counter()
    deadline = t0 + 60.0 * args.minutes
    cycles = 0
    while time.perf_counter() < deadline and not consumer_exc:
        churn_cycle()
        cycles += 1
    dt = time.perf_counter() - t0
    snap = lr.metrics.snapshot()
    stop.set()
    src.stop()
    th.join(timeout=60)
    lr._stop.set()
    lr.stop()
    viewer.stop()

    samples = int(snap.get("pipeline", {}).get("samples", 0))
    blocks_n = int(snap.get("pipeline", {}).get("blocks", 0))
    msps = samples / dt / 1e6
    drops = int(snap.get("ingest", {}).get("dropped", 0))
    res = {"tag": "churn_soak",
           "platform": jax.devices()[0].platform,
           "format": args.format, "wire_mbps_probe": wire_mbps,
           "minutes": round(dt / 60.0, 2), "warmup_s": round(warm_s, 1),
           "block_len": L, "churn_cycles": cycles,
           "rest_ops": cycles * 17, "blocks": blocks_n,
           "sustained_msps": round(msps, 3),
           "realtime_factor": round(msps * 1e6 / rate, 3),
           "ring_dropped_samples": drops,
           "consumer_exceptions": consumer_exc,
           "ok": bool(not consumer_exc and drops == 0
                      and msps * 1e6 >= 0.98 * rate)}
    print(json.dumps(res), flush=True)


def soak(args):
    """Real-time-paced live soak through native-format ingest
    (--format cs16|cs8)."""
    from cubicsdr_tpu.app.runner import LiveReceiver
    from cubicsdr_tpu.ops.planar import PLANAR
    from cubicsdr_tpu.receiver import ReceiverPipeline, DemodGroupSpec

    rate = float(args.rate)
    dt_np = {"cs16": np.int16, "cs8": np.int8}[args.format]
    full = float(np.iinfo(dt_np).max)
    specs = [DemodGroupSpec("FM", 200000, 4)]
    rx0 = ReceiverPipeline(rate, specs, dtype=PLANAR)
    m = rx0.block_len
    L = ((1 << 20) // m + 1) * m
    import jax as _jax
    on_cpu = _jax.devices()[0].platform == "cpu"
    rx = ReceiverPipeline(rate, specs, dtype=PLANAR,
                          use_pallas=not on_cpu, block_len=L)
    controls = rx.control_template()
    controls[0]["frequency"] = np.asarray(
        [100e3, 300e3, -200e3, -400e3], np.float32)
    L = rx.block_len
    rng = np.random.default_rng(3)
    blocks = [np.ascontiguousarray(
        (rng.standard_normal((2, L)) * 0.25 * full).astype(dt_np))
        for _ in range(4)]

    src = _PacedSource(blocks, L, rate)
    lr = LiveReceiver(rx, controls, src,
                      waterfall_fft=1024, waterfall_lines=64,
                      ring_seconds=args.ring, ingest_dtype=dt_np)
    lr.start_producer()
    lr.run_blocks(max_blocks=4)              # compile + warm
    # Re-base the source's real-time schedule: the warm-up's compile
    # backlog must not spray through the measured window as fake drops.
    src.reset()
    time.sleep(2 * L / rate)
    lr.metrics = type(lr.metrics)()
    t0 = time.perf_counter()
    deadline = t0 + 60.0 * args.minutes
    n = 0
    while time.perf_counter() < deadline:
        n += lr.run_blocks(max_blocks=8)
    dt = time.perf_counter() - t0
    snap = lr.metrics.snapshot()
    lr.stop()
    msps = n * L / dt / 1e6
    drops = int(snap.get("ingest", {}).get("dropped", 0))
    print(json.dumps({
        "tag": "soak", "format": args.format,
        "minutes": round(dt / 60.0, 2),
        "rate_msps": rate / 1e6, "blocks": n,
        "sustained_msps": round(msps, 3),
        "ring_dropped_samples": drops,
        "realtime_factor": round(msps * 1e6 / rate, 3),
        "ok": bool(drops == 0 and msps * 1e6 >= 0.98 * rate),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    d = sub.add_parser("digital_check")
    d.add_argument("--save", default=None)
    d.add_argument("--ref", default=None)
    c = sub.add_parser("churn_soak")
    c.add_argument("--minutes", type=float, default=5.0)
    c.add_argument("--format", choices=["cs16", "cs8"], default="cs16")
    s = sub.add_parser("soak")
    s.add_argument("--rate", type=float, default=4_800_000.0)
    s.add_argument("--minutes", type=float, default=3.0)
    s.add_argument("--format", choices=["cs16", "cs8"], default="cs8")
    s.add_argument("--ring", type=float, default=4.0,
                   help="ring depth in seconds (the queue-depth knob: "
                        "deeper rings ride longer transport transients)")
    args = ap.parse_args()
    {"digital_check": digital_check, "churn_soak": churn_soak,
     "soak": soak}[args.mode](args)
