"""StreamOp protocol: the universal stage contract.

Every DSP stage is a pure function ``(state, x) -> (state, y)`` where ``state``
is an arbitrary pytree of carried arrays (filter history, NCO phase, EMA
accumulators — the explicit analog of liquid-dsp's hidden per-object state that
the reference carries across calls, see SURVEY.md §5 "long-context").

Stages compose with ``Chain`` and stream with ``scan_blocks`` (a ``lax.scan``
over pre-staged blocks — the jit-compiled replacement for the reference's
thread-per-stage pipeline, ref: src/CubicSDR.cpp:342-397).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

State = Any


class StreamOp:
    """Base class: subclasses define ``init_state()`` and ``apply(state, x)``.

    Ops must be shape-preserving-or-statically-resizing: output length is a
    function of input length and construction params only (XLA static shapes).
    """

    def init_state(self) -> State:
        return ()

    def apply(self, state: State, x):
        raise NotImplementedError

    def __call__(self, state: State, x):
        return self.apply(state, x)


class Chain(StreamOp):
    """Sequential composition of StreamOps; state is a tuple of stage states."""

    def __init__(self, *ops: StreamOp):
        self.ops = ops

    def init_state(self):
        return tuple(op.init_state() for op in self.ops)

    def apply(self, state, x):
        new_states = []
        for op, s in zip(self.ops, state):
            s, x = op.apply(s, x)
            new_states.append(s)
        return tuple(new_states), x


def scan_blocks(op: StreamOp | Callable, state: State, blocks):
    """Run ``op`` over a leading blocks axis with carried state via lax.scan.

    ``blocks``: pytree whose leaves have shape [n_blocks, ...block shape...].
    Returns (final_state, stacked_outputs). This is how a long capture is
    processed as a stream while remaining one compiled program.
    """
    fn = op.apply if isinstance(op, StreamOp) else op

    def body(s, blk):
        s, y = fn(s, blk)
        return s, y

    return jax.lax.scan(body, state, blocks)


def split_blocks(x: jax.Array, block_len: int) -> jax.Array:
    """Frame a 1-D (or [..., N]) array into [..., n_blocks, block_len], dropping
    the ragged tail (the host feeder's job in live mode; ref overflow-carry
    behavior: src/sdr/SoapySDRThread.cpp:223-243)."""
    n = x.shape[-1] // block_len
    return x[..., : n * block_len].reshape(*x.shape[:-1], n, block_len)
