"""Slope-timed VPU primitive-pair issue ceiling (RTT-free).

The round-2 ceiling — 44.4 Gpairs/s (micro_r2 C6 sphere-major), 44.1
baked (A) — was timed as a SINGLE blocking call: 1.64e9 pairs/call at
44.4 G/s is 36.9 ms, of which ~25 ms is the tunnel's fixed RTT.  The
production roofline then reported device_utilization 2.4 (impossible),
because the production render amortizes its dispatch overhead over
seconds of kernel time while the micro ceiling did not.

This probe re-measures the ceiling with the same slope method as
exp/hbm_bw.py: the rep count is a DYNAMIC SMEM scalar (one compile),
timed at two counts, Gpairs/s = extra pairs / extra seconds.  The
subtraction cancels RTT, dispatch, and the output transfer exactly.

Usage: python exp/pair_ceiling.py [--reps-lo 2000] [--reps-hi 18000]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS", "")
if _want and "axon" not in _want:
    jax.config.update("jax_platforms", _want)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import micro_r2 as m  # noqa: E402  (module-level data setup only)


def make_dyn_reps_kernel(baked: bool):
    """C6 (dynamic sphere-major) / A2 (baked immediates) sweep body with
    the rep count read from SMEM instead of closed over."""
    nblk = m.S // 8

    def kernel(reps_ref, *refs):
        if baked:
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref = refs
            tab = m.PACKED_SM
            iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

            def col(vals):
                out = jnp.zeros((8, 1), jnp.float32)
                for j, v in enumerate(vals):
                    out = jnp.where(iota == j, jnp.float32(float(v)), out)
                return out

            def get_block(k):
                blk = tab[k * 8:(k + 1) * 8]
                return {n: col(blk[:, c])
                        for n, c in (("tcx", 16), ("tcy", 17), ("tcz", 18),
                                     ("kappa", 14), ("a0", 4), ("a9", 13))}
        else:
            (scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             out_ref) = refs

            def get_block(k):
                blk = scn_ref[pl.ds(k * 8, 8), :]
                return {"tcx": blk[:, 16:17], "tcy": blk[:, 17:18],
                        "tcz": blk[:, 18:19], "kappa": blk[:, 14:15],
                        "a0": blk[:, 4:5], "a9": blk[:, 13:14]}

        def rep(i, carry):
            acc, bump = carry
            bump = bump + 1e-6
            acc = acc + m._sm_sweep_rows(get_block, nblk, ox_ref, oy_ref,
                                         oz_ref, dx_ref, dy_ref, dz_ref,
                                         bump, False)
            return acc, bump

        acc, _ = jax.lax.fori_loop(
            0, reps_ref[0], rep, (jnp.zeros((m.ROWS, 128), jnp.float32),
                                  jnp.float32(0.0)))
        out_ref[:] = acc

    return kernel


def measure(baked: bool, reps_pair, timing_reps=5):
    ins = [jnp.asarray(x) for x in (m.ox0, m.oy0, m.oz0,
                                    m.dx0, m.dy0, m.dz0)]
    if not baked:
        ins = [jnp.asarray(m.PACKED_SM)] + ins
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fn = jax.jit(pl.pallas_call(
        make_dyn_reps_kernel(baked),
        in_specs=[smem] + [full] * len(ins),
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((m.ROWS, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    ))
    jax.block_until_ready(fn(np.array([1], np.int32), *ins))

    def tc(p):
        parr = np.array([p], np.int32)
        times = []
        for _ in range(timing_reps):
            t0 = time.perf_counter()
            out = fn(parr, *ins)
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        return min(times)

    p_lo, p_hi = reps_pair
    dt = tc(p_hi) - tc(p_lo)
    pairs = (p_hi - p_lo) * m.S * m.ROWS * 128
    single = tc(p_lo)
    return pairs / dt / 1e9, dt, single


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps-lo", type=int, default=2000)
    p.add_argument("--reps-hi", type=int, default=18000)
    args = p.parse_args()
    pair = (args.reps_lo, args.reps_hi)
    print(f"device: {jax.devices()[0]}  S={m.S} ROWS={m.ROWS} "
          f"reps {pair[0]}->{pair[1]}")
    for baked, name in ((False, "C6 dynamic sphere-major"),
                        (True, "A2 baked immediates   ")):
        gbs, dt, single = measure(baked, pair)
        legacy = args.reps_lo * m.S * m.ROWS * 128 / single / 1e9
        print(f"| {name} | slope {gbs:7.2f} Gpairs/s | "
              f"single-call(lo) {legacy:6.2f} Gpairs/s | "
              f"slope window {dt*1e3:7.1f} ms |")


if __name__ == "__main__":
    main()
