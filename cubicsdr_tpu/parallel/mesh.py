"""Mesh helpers for the receiver's (time, chan) sharding."""

from __future__ import annotations

import numpy as np
import jax


def make_receiver_mesh(n_time: int | None = None, n_chan: int = 1,
                       devices=None) -> jax.sharding.Mesh:
    """Mesh with axes ('time', 'chan'). Defaults to all devices on 'time'
    (halo-exchange streaming), optionally splitting demod rows on 'chan'.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_time is None:
        n_time = n // n_chan
    assert n_time * n_chan == n, (n_time, n_chan, n)
    arr = np.asarray(devices).reshape(n_time, n_chan)
    return jax.sharding.Mesh(arr, ("time", "chan"))
