"""Per-stage timing of the PlanarFMFarm chain on the real chip, post-pallas.

Times isolated jits of: channelize (pallas + XLA), NCO mix, front-end
resample, freqdem, audio resample, and the full step, on bench.py shapes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cubicsdr_tpu.ops.planar import PC, pc_concat, pc_mul, pc_mul_conj
from cubicsdr_tpu.ops.planar import phasor_ramp_outer, fast_atan2
from cubicsdr_tpu.receiver.planar_fm import planar_resample_matmul
from cubicsdr_tpu.receiver.planar_fm import PlanarFMFarm


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3   # ms


def main():
    fs = 8_000_000
    N = 16
    farm = PlanarFMFarm(fs, num_channels=16, n_demods=N, use_pallas=True)
    L = farm.block_len
    Lc = farm.chan_len
    rng = np.random.default_rng(0)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    z = PC(rand(L + farm.hist_len), rand(L + farm.hist_len))
    freqs = jnp.asarray([(i - N // 2) * 500e3 + 20e3 for i in range(N)],
                        jnp.float32)

    # channelize
    from cubicsdr_tpu.ops.pallas.pfb import pfbch2_planar_pallas
    h_poly = np.asarray(farm.h_poly)

    pal = jax.jit(lambda zr, zi: pfbch2_planar_pallas(zr, zi, h_poly, 16))
    print(f"channelize pallas : {timeit(pal, z.re, z.im):8.3f} ms")

    farm_x = PlanarFMFarm(fs, num_channels=16, n_demods=N, use_pallas=False)

    # full steps
    def full(f):
        st = f.init_state()
        iq = PC(rand(L), rand(L))

        def stepf(st, iq):
            return f.step(st, iq, freqs)

        j = jax.jit(stepf)
        st2, *out = j(st, iq)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(30):
            st, *out = j(st, iq)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 30 * 1e3

    # NCO mix
    xs = PC(rand(N, Lc), rand(N, Lc))
    ph = jnp.zeros(N, jnp.float32)
    om = jnp.full((N,), 0.1, jnp.float32)

    def nco(xs_re, xs_im, ph, om):
        rot = phasor_ramp_outer(ph, om, Lc)
        return pc_mul(PC(xs_re, xs_im), rot)

    print(f"NCO mix           : {timeit(jax.jit(nco), xs.re, xs.im, ph, om):8.3f} ms")

    # front-end resample
    xh = PC(rand(N, Lc + farm.fe_rs.hist_len),
            rand(N, Lc + farm.fe_rs.hist_len))
    fe = jax.jit(lambda r, i: planar_resample_matmul(PC(r, i), farm.fe_rs))
    print(f"fe resample       : {timeit(fe, xh.re, xh.im):8.3f} ms")

    # freqdem
    Ld = farm.demod_len
    yb = PC(rand(N, Ld + 1), rand(N, Ld + 1))

    def fd(r, i):
        zb = PC(r, i)
        d = pc_mul_conj(zb.slice_last(slice(1, None)),
                        zb.slice_last(slice(0, -1)))
        return fast_atan2(d.im, d.re)

    print(f"freqdem           : {timeit(jax.jit(fd), yb.re, yb.im):8.3f} ms")

    # audio resample
    ah = rand(N, Ld + farm.au_rs.hist_len)
    au = jax.jit(lambda a: planar_resample_matmul(a, farm.au_rs))
    print(f"audio resample    : {timeit(au, ah):8.3f} ms")

    print(f"full step pallas  : {full(farm):8.3f} ms "
          f"({L / full(farm) / 1e3:.0f} MS/s)")
    print(f"full step XLA     : {full(farm_x):8.3f} ms")


if __name__ == "__main__":
    main()
