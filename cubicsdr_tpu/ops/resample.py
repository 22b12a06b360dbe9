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

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cubicsdr_tpu.stream.op import StreamOp
from cubicsdr_tpu.ops import design


def design_ratio(ratio: float, max_denominator: int = 256) -> tuple[int, int]:
    """Snap an arbitrary resample ratio to P/Q."""
    fr = Fraction(ratio).limit_denominator(max_denominator)
    return fr.numerator, fr.denominator


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
        return jnp.zeros((*self.batch_shape, self.hist_len), self.dtype)

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

    def apply(self, hist, x):
        assert x.shape[-1] % self.Q == 0, (x.shape, self.Q)
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
