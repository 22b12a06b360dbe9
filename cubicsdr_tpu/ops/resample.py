"""Rational polyphase resampler — the msresamp replacement.

The reference resamples with liquid ``msresamp_crcf`` (arbitrary ratio,
60 dB stop-band; ref: src/demod/DemodulatorWorkerThread.cpp:95-100 and
src/modules/modem/ModemAnalog.cpp:21-33), which emits a data-dependent
``num_written`` per call — impossible under XLA's static shapes. Here the
ratio is snapped to a rational P/Q (error bounded, typically exact: e.g.
200k -> 48k is 6/25) and each block of L inputs (L % Q == 0) produces exactly
L*P/Q outputs.

MXU formulation: instead of per-output gather, the P polyphase branches are
folded into ONE strided conv with P output features (branch p's taps pre-
shifted by its input offset), so XLA lowers the whole resampler to a single
TPU convolution. Streaming equals one-shot ``scipy.signal.upfirdn`` (tests).
"""

from __future__ import annotations

from fractions import Fraction
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cubicsdr_tpu.stream.op import StreamOp
from cubicsdr_tpu.ops import design
from cubicsdr_tpu.ops.planar import PC, dtype_zeros, xcat, xtail

MAX_DENOMINATOR = 1_000_000


def design_ratio(ratio: float, max_denominator: int = 256,
                 tol: float = 1e-3) -> tuple[int, int]:
    """Snap an arbitrary resample ratio to P/Q within relative error ``tol``.

    The reference's msresamp accepts any real ratio (ref:
    src/demod/DemodulatorWorkerThread.cpp:95-100); static XLA shapes need a
    rational. The denominator bound auto-grows until the snap error is within
    ``tol`` (narrow bandwidths on wide channels need Q >> 256: a 500 Hz CW
    demod on an 800 kHz channel is exactly 1/1600). Raises if no acceptable
    rational exists below MAX_DENOMINATOR or the ratio is degenerate —
    silently returning P=0 (a round-1 bug) muted the demod entirely.
    """
    if not (ratio > 0):
        raise ValueError(f"resample ratio must be positive, got {ratio}")
    md = max_denominator
    while True:
        fr = Fraction(ratio).limit_denominator(md)
        if fr.numerator > 0 and abs(float(fr) / ratio - 1.0) <= tol:
            return fr.numerator, fr.denominator
        if md >= MAX_DENOMINATOR:
            raise ValueError(
                f"cannot approximate resample ratio {ratio} to within "
                f"{tol:g} with denominator <= {MAX_DENOMINATOR}")
        md *= 10


def resampler_taps(P: int, Q: int, taps_per_phase: int = 24,
                   as_db: float = 60.0) -> np.ndarray:
    """Anti-alias/anti-image lowpass at the upsampled rate P*fs, cutoff
    min(0.5/P, 0.5/Q), gain P (preserve amplitude through zero-stuffing).

    Length scales with max(P, Q): the transition band is 1/max(P,Q) of the
    upsampled Nyquist, so a pure decimator (P=1) still gets a sharp filter.
    """
    L = max(P, Q) * taps_per_phase
    fc = min(0.5 / P, 0.5 / Q)
    return design.kaiser_lowpass(L, fc, as_db, gain=float(P))


class RationalResampler(StreamOp):
    """P/Q resampler over the last axis; block length must be divisible by Q.

    Output y[m] = sum_k h[k] u[m*Q - k] where u is the P-upsampled (zero
    stuffed) input stream — identical semantics to scipy.signal.upfirdn with
    streaming state.
    """

    def __init__(self, P: int, Q: int, taps=None, batch_shape: tuple = (),
                 dtype=jnp.complex64, taps_per_phase: int = 24,
                 as_db: float = 60.0):
        self.P, self.Q = int(P), int(Q)
        h = resampler_taps(P, Q, taps_per_phase, as_db) if taps is None \
            else np.asarray(taps, np.float32)
        self.h = h
        K = len(h)
        # Polyphase decomposition: h_poly[p, j] = h[j*P + p]; branch p has
        # ceil((K-p)/P) taps -> pad to J.
        J = int(np.ceil(K / P))
        h_poly = np.zeros((P, J), np.float32)
        for p in range(P):
            t = h[p::P]
            h_poly[p, : len(t)] = t
        # Output m uses phase phi(m) = (m*Q) % P and base input index
        # n(m) = floor(m*Q / P). Outputs group into super-blocks of P outputs
        # per Q inputs: for r in [0,P), phi=(r*Q)%P, offset d_r=floor(r*Q/P)
        # in [0, Q). Fold d_r into a common kernel of length J + Q so all P
        # branches share stride-Q conv positions:
        #   y[b*P + r] = sum_j h_poly[phi_r, j] x[b*Q + d_r - j]
        #             = sum_t ker[r, t] x[b*Q + (Q-1) - t ... ]   (conv form)
        KK = J + self.Q - 1
        ker = np.zeros((P, KK), np.float32)
        for r in range(P):
            phi = (r * Q) % P
            d = (r * Q) // P
            # taps aligned: contribution of x[b*Q + d - j] with weight
            # h_poly[phi, j]  ->  lag relative to base (b*Q + Q - 1) is
            # (Q - 1 - d + j).
            lag0 = (Q - 1) - d
            ker[r, lag0: lag0 + J] = h_poly[phi]
        self.ker = jnp.asarray(ker)            # [P, KK]
        self.KK = KK
        self.batch_shape = batch_shape
        self.dtype = dtype
        # history long enough to cover max lag (KK - 1), rounded up to Q.
        self.hist_len = int(np.ceil((KK - 1) / self.Q)) * self.Q

    def init_state(self):
        return dtype_zeros((*self.batch_shape, self.hist_len), self.dtype)

    def _conv_multi(self, z: jax.Array) -> jax.Array:
        """z: [..., T] -> [..., P, n_blocks] strided-Q multi-filter conv."""
        batch_shape = z.shape[:-1]
        n = int(np.prod(batch_shape)) if batch_shape else 1
        ker = self.ker[:, ::-1][:, None, :]    # [P, 1, KK] (conv = corr w/ rev)

        def real_conv(xr):
            y = lax.conv_general_dilated(
                xr.reshape(n, 1, z.shape[-1]), ker,
                window_strides=(self.Q,), padding="VALID",
                dimension_numbers=("NCW", "OIW", "NCW"),
                preferred_element_type=jnp.float32,
            )
            return y.reshape(*batch_shape, self.P, y.shape[-1])

        if jnp.iscomplexobj(z):
            return (real_conv(z.real) + 1j * real_conv(z.imag)
                    ).astype(jnp.complex64)
        return real_conv(z)

    # Time-sharding: the carried state IS the input tail.
    shard_kind = "tail"

    def shard_halo_len(self) -> int:
        return self.hist_len

    def shard_carry_init(self):
        return self.init_state()

    def apply(self, hist, x):
        assert x.shape[-1] % self.Q == 0, (x.shape, self.Q)
        if isinstance(x, PC) or not jnp.iscomplexobj(x):
            # Planar / real: MXU Toeplitz-matmul form (conv fallback inside).
            z = xcat([hist, x])
            y = planar_resample_matmul(z, self)
            return xtail(z, self.hist_len), y
        z = jnp.concatenate([hist, x], axis=-1)
        # First output super-block b=0 corresponds to stream base index
        # hist_len; slice so conv window [base-KK+1 .. base] ends at
        # base = hist_len + Q - 1.
        start = self.hist_len + self.Q - 1 - (self.KK - 1)
        y = self._conv_multi(z[..., start:])           # [..., P, L//Q]
        # interleave: outputs ordered (b, r) -> m = b*P + r
        y = jnp.swapaxes(y, -1, -2).reshape(*y.shape[:-2], -1)
        new_hist = z[..., z.shape[-1] - self.hist_len:]
        return new_hist, y

    def out_len(self, in_len: int) -> int:
        assert in_len % self.Q == 0
        return in_len // self.Q * self.P


# ------------------------------------------------------- multi-stage ----

def _prime_factors(n: int) -> list[int]:
    out = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def stage_plan(P: int, Q: int, max_stage: int = 64) -> list[tuple[int, int]]:
    """Decompose a P/Q resample into cascaded rational stages.

    A single polyphase stage with huge Q needs ~24*Q taps (the transition
    band is 1/Q of the input Nyquist) — a 1/1600 CW decimator would carry a
    38k-tap filter. Classic multistage decimation splits Q into factors
    <= max_stage, each stage a stock 60 dB kaiser design. The interpolation
    factor P rides the FIRST stage so every intermediate rate stays >= the
    final rate (decimating below the output band first would destroy it).
    Pure upsampling (P >= Q) stays single-stage: its polyphase branch count
    grows with P but taps-per-branch stay ~taps_per_phase.
    """
    if Q <= max_stage or P >= Q:
        return [(P, Q)]
    # Greedy bin-pack the prime factors (largest first) into <= max_stage.
    packs: list[int] = []
    for f in sorted(_prime_factors(Q), reverse=True):
        for i in range(len(packs)):
            if packs[i] * f <= max_stage:
                packs[i] *= f
                break
        else:
            packs.append(f)
    packs.sort(reverse=True)          # decimate hardest at the highest rate
    return [(P, packs[0])] + [(1, q) for q in packs[1:]]


class ResamplerChain(StreamOp):
    """Multi-stage P/Q resampler (complex64 / real) with the single-stage
    RationalResampler interface: block length must divide Q, output is
    exactly in_len*P/Q. Replaces msresamp for extreme ratios (ref:
    src/demod/DemodulatorWorkerThread.cpp:95-100 handles any ratio)."""

    def __init__(self, P: int, Q: int, batch_shape: tuple = (),
                 dtype=jnp.complex64, taps_per_phase: int = 24,
                 as_db: float = 60.0, max_stage: int = 64):
        self.P, self.Q = int(P), int(Q)
        self.stages = [
            RationalResampler(p, q, batch_shape=batch_shape, dtype=dtype,
                              taps_per_phase=taps_per_phase, as_db=as_db)
            for p, q in stage_plan(self.P, self.Q, max_stage)]
        self.batch_shape = batch_shape
        self.dtype = dtype

    def init_state(self):
        return tuple(rs.init_state() for rs in self.stages)

    def apply(self, state, x):
        new = []
        for rs, s in zip(self.stages, state):
            s, x = rs.apply(s, x)
            new.append(s)
        return tuple(new), x

    # Time-sharding: each stage halo-exchanges its own (intermediate) input
    # tail — in_len % Q guarantees every stage's local length divides its q.
    def shard_carries(self):
        return tuple(rs.shard_carry_init() for rs in self.stages)

    def shard_apply(self, carries, x, axis):
        from cubicsdr_tpu.parallel.shardable import shard_stage
        new = []
        for rs, c in zip(self.stages, carries):
            c, x = shard_stage(rs, c, x, axis)
            new.append(c)
        return tuple(new), x

    def out_len(self, in_len: int) -> int:
        assert in_len % self.Q == 0
        return in_len // self.Q * self.P


class IdentityResampler(StreamOp):
    """Unity-ratio passthrough (a Nyquist-cutoff FIR is both undesignable
    and pointless). Interface-identical to RationalResampler."""

    P = Q = 1
    hist_len = 0
    shard_kind = "tail"

    def __init__(self, batch_shape: tuple = (), dtype=jnp.complex64):
        self.batch_shape = batch_shape
        self.dtype = dtype

    def init_state(self):
        return dtype_zeros((*self.batch_shape, 0), self.dtype)

    def shard_halo_len(self) -> int:
        return 0

    def shard_carry_init(self):
        return self.init_state()

    def apply(self, state, x):
        return state, x

    def out_len(self, in_len: int) -> int:
        return in_len


def make_resampler(P: int, Q: int, batch_shape: tuple = (),
                   dtype=jnp.complex64, taps_per_phase: int = 24,
                   as_db: float = 60.0, max_stage: int = 64):
    """Single-stage RationalResampler when the ratio is mild, ResamplerChain
    when Q needs splitting, identity when unity. Interface-identical."""
    if P == Q:
        return IdentityResampler(batch_shape=batch_shape, dtype=dtype)
    if len(stage_plan(P, Q, max_stage)) == 1:
        return RationalResampler(P, Q, batch_shape=batch_shape, dtype=dtype,
                                 taps_per_phase=taps_per_phase, as_db=as_db)
    return ResamplerChain(P, Q, batch_shape=batch_shape, dtype=dtype,
                          taps_per_phase=taps_per_phase, as_db=as_db,
                          max_stage=max_stage)


# ---------------------------------------------------- planar (TPU) form ----
# The TPU hot path carries IQ as two float32 planes (ops/planar.py) and runs
# each resampler stage as ONE [rows, W] @ [W, O] MXU matmul against a banded
# Toeplitz tap matrix (the skinny strided-conv form left the MXU ~1%
# utilized; see BENCH.md round-1 fast-math notes).

def _choose_tile(n_out: int, P: int, lo: int = 64, hi: int = 512,
                 target: int = 128):
    cands = [o for o in range(lo, hi + 1) if o % P == 0 and n_out % o == 0]
    return min(cands, key=lambda o: abs(o - target)) if cands else None


@lru_cache(maxsize=None)
def _toeplitz_np(ker_key, P: int, Q: int, KK: int, O: int):
    """Banded output-tile matrix T [W, O]: y_tile[m] = sum_i w_s[i]*T[i, m]
    where m = lb*P + r and t = lb*Q + KK-1 - i indexes ker[r, t]."""
    ker = np.asarray(ker_key, np.float32).reshape(P, KK)
    S = (O // P) * Q
    W = (O // P - 1) * Q + KK
    T = np.zeros((W, O), np.float32)
    for m in range(O):
        lb, r = divmod(m, P)
        for t in range(KK):
            i = lb * Q + KK - 1 - t
            if 0 <= i < W:
                T[i, m] = ker[r, t]
    return T, S, W


def planar_rational_resample(x, rs: RationalResampler):
    """Conv-form fallback: apply rs's polyphase kernel to [..., L] data
    (planar PC or real), input already prefixed with rs.hist_len history."""
    from cubicsdr_tpu.ops.planar import PC, conv_real
    start = rs.hist_len + rs.Q - 1 - (rs.KK - 1)
    ker = np.asarray(rs.ker)

    def one_plane(z):
        y = conv_real(z[..., None, start:], ker, stride=rs.Q)  # [..., P, T]
        return jnp.swapaxes(y, -1, -2).reshape(*y.shape[:-2], -1)

    if isinstance(x, PC):
        return PC(one_plane(x.re), one_plane(x.im))
    return one_plane(x)


def _signal_precision():
    """Signal-path matmul precision for the XLA (no-Pallas) route.

    Default HIGH = the MXU's 3-pass bf16x3 algorithm, split internally by
    XLA (no HBM re-reads, unlike the hand-split variant that lost the
    round-3 A/B); plain f32 on CPU. Chip A/B on the 256-demod fallback
    (evidence/soak2_xla_ab_r04.log + xla_high_snr_r04.log): HIGH measures
    THE SAME 85.3 dB on-chip audio SNR as the 6-pass HIGHEST at +11%
    throughput (121 vs 108 MS/s) — the stage is HBM-bound, so the extra
    three passes of HIGHEST buy nothing. Override with
    ``CUBICSDR_XLA_PRECISION=highest|default``.

    The HIGH default is gated on the TPU backend: the A/B evidence is
    TPU-only, and on GPU ``Precision.HIGH`` selects tf32 (~10-bit
    mantissa), which would silently degrade signal-path SNR relative to
    HIGHEST. Non-TPU backends therefore default to HIGHEST (exact f32 on
    CPU either way)."""
    import os
    name = os.environ.get("CUBICSDR_XLA_PRECISION", "").lower()
    if not name:
        try:
            is_tpu = jax.default_backend() not in ("cpu", "gpu", "cuda",
                                                   "rocm")
        except Exception:                    # noqa: BLE001 — no backend
            is_tpu = False
        name = "high" if is_tpu else "highest"
    return {"high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[name]


def _hp_einsum(sub: str, a, b):
    """Signal-path einsum at true-f32 accuracy (Precision.HIGHEST, or the
    CUBICSDR_XLA_PRECISION override).

    A HAND-split bf16x3 variant was A/B'd on the chip and LOST on both
    axes for these HBM-resident operands (96 vs 107 MS/s at 256 demods,
    64.8 vs 85.3 dB audio SNR): materializing hi/lo operand copies re-reads
    the big window tensors from HBM, while HIGHEST splits internally. The
    split trick only wins inside the Pallas kernel where the operands are
    already VMEM-resident (ops/pallas/route.py)."""
    return jnp.einsum(sub, a, b, preferred_element_type=jnp.float32,
                      precision=_signal_precision())


def planar_resample_matmul(x, rs: RationalResampler):
    """MXU form of the rational resampler: overlapping stride-S windows of
    the stream against a banded [W, O] tap matrix — one big
    [rows, W] @ [W, O] matmul instead of a skinny strided conv.
    Falls back to the conv form when no tile divides the output length.
    Input must be prefixed with rs.hist_len history samples.
    """
    from cubicsdr_tpu.ops.planar import PC
    is_pc = isinstance(x, PC)
    L = (x.re if is_pc else x).shape[-1] - rs.hist_len
    n_out = L // rs.Q * rs.P
    O = _choose_tile(n_out, rs.P)
    if O is None:
        return planar_rational_resample(x, rs)
    T_np, S, W = _toeplitz_np(
        tuple(np.asarray(rs.ker).reshape(-1).tolist()), rs.P, rs.Q, rs.KK, O)
    T = jnp.asarray(T_np)
    start = rs.hist_len + rs.Q - 1 - (rs.KK - 1)
    n_rows = n_out // O
    k_sl = -(-W // S)                   # ceil
    def one_plane(plane):
        w = plane[..., start:]
        pad = (n_rows + k_sl - 1) * S - w.shape[-1]
        wp = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, max(pad, 0))])
        A = wp.reshape(*wp.shape[:-1], n_rows + k_sl - 1, S)
        fr = jnp.concatenate([A[..., i: i + n_rows, :] for i in range(k_sl)],
                             axis=-1)[..., :W]         # [..., n_rows, W]
        y = _hp_einsum("...rw,wo->...ro", fr, T)
        return y.reshape(*y.shape[:-2], n_out)

    if is_pc:
        return PC(one_plane(x.re), one_plane(x.im))
    return one_plane(x)


def planar_shifted_resample_matmul(z, rs: RationalResampler, omega,
                                   phase_w0):
    """Fused NCO-shift + rational resample in one batched MXU matmul —
    the frontend hot path (receiver/frontend.py).

    Mathematically identical to ``resample(nco_mix(z))`` (NCOMixer
    multiplies by e^{+i(φ0+ωk)}) but the full-rate phasor multiply is
    FOLDED into the tap matrix:

        y[m] = e^{+i(φ0 + ω n_m)} Σ_i T[i,m] e^{+iω(i - n_m)} x[i]

    i.e. modulate the banded Toeplitz matrix by e^{-iω i} along its sample
    axis (a rank-1 broadcast — the phase is linear in the sample index, so
    no per-tap gather), matmul against windows of the RAW stream, and
    rotate each output tile by its base phase. The [N, W, O] modulated
    matrix depends only on ω (a control input), so XLA hoists it out of
    the K-block dispatch scan — per-block cost is just 4 real einsums on
    raw windows plus an [N, n_tiles] tile phasor, replacing the full-rate
    [N, L] phasor generation + complex multiply.

    z: PC [..., N, hist+L] RAW (unmixed) stream with rs.hist_len history.
    omega: [..., N] NCO rate (rad/sample); phase_w0: [..., N] phase of the
    first window sample w[0] (= block phase0 - ω*(hist_len - start)).
    Returns PC [..., N, L//Q*P]. None if no tile divides the output.
    """
    from cubicsdr_tpu.ops.planar import PC
    assert isinstance(z, PC)
    L = z.re.shape[-1] - rs.hist_len
    n_out = L // rs.Q * rs.P
    O = _choose_tile(n_out, rs.P)
    if O is None:
        return None
    T_np, S, W = _toeplitz_np(
        tuple(np.asarray(rs.ker).reshape(-1).tolist()), rs.P, rs.Q, rs.KK, O)
    T = jnp.asarray(T_np)                        # [W, O]
    start = rs.hist_len + rs.Q - 1 - (rs.KK - 1)
    n_rows = n_out // O
    k_sl = -(-W // S)

    def windows(plane):
        w = plane[..., start:]
        pad = (n_rows + k_sl - 1) * S - w.shape[-1]
        wp = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, max(pad, 0))])
        A = wp.reshape(*wp.shape[:-1], n_rows + k_sl - 1, S)
        return jnp.concatenate(
            [A[..., i: i + n_rows, :] for i in range(k_sl)],
            axis=-1)[..., :W]                    # [..., N, n_rows, W]

    fr_re, fr_im = windows(z.re), windows(z.im)
    omega = jnp.asarray(omega, jnp.float32)
    phase_w0 = jnp.asarray(phase_w0, jnp.float32)
    i_idx = jnp.arange(W, dtype=jnp.float32)
    # e^{+i ω i} along the W axis (wrap for f32 phase accuracy).
    th = jnp.mod(omega[..., None] * i_idx, TWO_PI)   # [..., N, W]
    Tm_re = T * jnp.cos(th)[..., :, None]            # [..., N, W, O]
    Tm_im = T * jnp.sin(th)[..., :, None]
    # True-f32 accuracy: TPU's default one-pass-bf16 matmuls measure
    # ~-51 dB rms vs float64 truth on chip — below the 60 dB stopband
    # these taps promise (_hp_einsum picks the cheapest exact-enough form).
    y_re = (_hp_einsum("...ri,...io->...ro", fr_re, Tm_re)
            - _hp_einsum("...ri,...io->...ro", fr_im, Tm_im))
    y_im = (_hp_einsum("...ri,...io->...ro", fr_re, Tm_im)
            + _hp_einsum("...ri,...io->...ro", fr_im, Tm_re))
    # Per-tile base rotation e^{+i(phase_w0 + ω r S)}.
    r_idx = jnp.arange(n_rows, dtype=jnp.float32)
    a = jnp.mod(omega * S, TWO_PI)
    phi = jnp.mod(phase_w0[..., None] + jnp.mod(a[..., None] * r_idx,
                                                TWO_PI), TWO_PI)
    c, s = jnp.cos(phi)[..., None], jnp.sin(phi)[..., None]
    out_re = y_re * c - y_im * s
    out_im = y_im * c + y_re * s
    shp = (*out_re.shape[:-2], n_out)
    return PC(out_re.reshape(shp), out_im.reshape(shp))


TWO_PI = 6.283185307179586


def planar_shifted_resample_conv(z, rs: RationalResampler, omega,
                                 phase_w0):
    """Grouped-conv form of the fused NCO-shift + resample (the XLA
    no-Pallas route's HBM diet): instead of materializing per-demod
    Toeplitz windows [N, rows, W] AND a modulated [N, W, O] tap tensor
    in HBM (~GB per 256-demod block — BENCH.md round-3 ablation), fold
    the NCO into a per-demod complex kernel of KK taps and run ONE
    grouped strided conv over the gathered stream:

        y[n, m] = e^{i(φ0_n + ω_n Q (m//P))}
                  Σ_k ker[m%P, KK-1-k] e^{+i ω_n k} x[n, start + (m//P)Q + k]

    (exactly planar_shifted_resample_matmul's math — derived from
    _toeplitz_np's index map — so the two paths are interchangeable;
    equality is tested). HBM traffic drops to the gathered stream reads
    + an output-rate phasor.

    z: PC [N, hist+L]; omega/phase_w0: [N]. Returns PC [N, n_out].
    """
    from cubicsdr_tpu.ops.planar import PC
    assert isinstance(z, PC) and z.re.ndim == 2
    N = z.re.shape[0]
    L = z.re.shape[-1] - rs.hist_len
    n_out = L // rs.Q * rs.P
    T_len = n_out // rs.P
    start = rs.hist_len + rs.Q - 1 - (rs.KK - 1)
    ker = np.asarray(rs.ker, np.float32).reshape(rs.P, rs.KK)
    ker_rev = jnp.asarray(ker[:, ::-1].copy())       # [P, KK]

    omega = jnp.asarray(omega, jnp.float32)
    phase_w0 = jnp.asarray(phase_w0, jnp.float32)
    k_idx = jnp.arange(rs.KK, dtype=jnp.float32)
    th = jnp.mod(omega[:, None] * k_idx, TWO_PI)     # [N, KK]
    # rhs[n*P + r, 0, k] = ker[r, KK-1-k] * e^{+i w_n k}
    g_re = (ker_rev[None, :, :] * jnp.cos(th)[:, None, :]
            ).reshape(N * rs.P, 1, rs.KK)
    g_im = (ker_rev[None, :, :] * jnp.sin(th)[:, None, :]
            ).reshape(N * rs.P, 1, rs.KK)

    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(0, 1, 2), rhs_spec=(0, 1, 2), out_spec=(0, 1, 2))
    need = (T_len - 1) * rs.Q + rs.KK

    def conv(plane, g):
        lhs = plane[None, :, start:start + need]     # [1, N, need]
        y = jax.lax.conv_general_dilated(
            lhs, g, window_strides=(rs.Q,), padding="VALID",
            dimension_numbers=dn, feature_group_count=N,
            precision=_signal_precision())
        return y[0].reshape(N, rs.P, T_len)          # [N, P, T]

    y_re = conv(z.re, g_re) - conv(z.im, g_im)
    y_im = conv(z.re, g_im) + conv(z.im, g_re)

    # Output rotation e^{i(φ0 + ω Q j)}, j = m//P — split pre-wrapped
    # increments keep the f32 phase products small at any block length.
    a1 = jnp.mod(omega * rs.Q, TWO_PI)[:, None]
    a64 = jnp.mod(64.0 * a1, TWO_PI)
    j = jnp.arange(T_len, dtype=jnp.float32)
    hi, lo = jnp.floor(j / 64.0), jnp.mod(j, 64.0)
    phi = jnp.mod(phase_w0[:, None] + a64 * hi[None, :]
                  + a1 * lo[None, :], TWO_PI)        # [N, T]
    c, s = jnp.cos(phi)[:, None, :], jnp.sin(phi)[:, None, :]
    out_re = y_re * c - y_im * s
    out_im = y_im * c + y_re * s
    # Interleave the P phase streams: [N, P, T] -> [N, T*P].
    out_re = jnp.swapaxes(out_re, -1, -2).reshape(N, n_out)
    out_im = jnp.swapaxes(out_im, -1, -2).reshape(N, n_out)
    return PC(out_re, out_im)


class PlanarResampler(StreamOp):
    """Stateful multi-stage P/Q resampler on planar-complex (PC) or real
    float32 data; each stage runs in the MXU Toeplitz-matmul form. State is
    per-stage history (the sharded receiver halo-exchanges these tails).

    ``apply(state, x)`` with x: PC or real [..., L], L % Q == 0; returns
    (state, y) with y of length L*P/Q.
    """

    def __init__(self, P: int, Q: int, batch_shape: tuple = (),
                 complex_data: bool = True, taps_per_phase: int = 24,
                 as_db: float = 60.0, max_stage: int = 64):
        self.P, self.Q = int(P), int(Q)
        self.stages = [
            RationalResampler(p, q, taps_per_phase=taps_per_phase,
                              as_db=as_db)
            for p, q in stage_plan(self.P, self.Q, max_stage)]
        self.batch_shape = batch_shape
        self.complex_data = complex_data

    def init_state(self):
        from cubicsdr_tpu.ops.planar import pc_zeros

        def z(n):
            if self.complex_data:
                return pc_zeros((*self.batch_shape, n))
            return jnp.zeros((*self.batch_shape, n), jnp.float32)

        return tuple(z(rs.hist_len) for rs in self.stages)

    def apply(self, state, x):
        from cubicsdr_tpu.ops.planar import PC, pc_concat
        new = []
        for rs, h in zip(self.stages, state):
            if isinstance(x, PC):
                xh = pc_concat([h, x])
                y = planar_resample_matmul(xh, rs)
                new.append(xh.slice_last(
                    slice(xh.shape[-1] - rs.hist_len, None)))
            else:
                xh = jnp.concatenate([h, x], axis=-1)
                y = planar_resample_matmul(xh, rs)
                new.append(xh[..., xh.shape[-1] - rs.hist_len:])
            x = y
        return tuple(new), x

    def out_len(self, in_len: int) -> int:
        assert in_len % self.Q == 0, (in_len, self.Q)
        return in_len // self.Q * self.P
