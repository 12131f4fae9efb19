"""Measure the VPU issue rate for bf16 (and int8/int16) elementwise ops
vs f32 on this chip — the decisive input for the round-5 "reduced-
precision pair prefilter" lever (VERDICT r4 Weak #3: at ~331 pair tests
per ray, even 100% of the 146.3 Gpairs/s f32 ceiling caps the headline
at ~440 Mrays/s; a 2x-issue bf16 prefilter is the only remaining
2x-class lever).

Method: same slope protocol as exp/pair_ceiling.py — a Pallas kernel
whose rep count is a dynamic SMEM scalar runs a chain of dependent
fma-shaped ops on a (ROWS, 128) block; timed at two rep counts, the
subtraction cancels RTT/dispatch exactly.  The op chain alternates two
accumulators so the VPU pipeline stays full.  Reported: G elementwise
ops/s per dtype, and the bf16/f32 ratio.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/bf16_issue.py
"""

import argparse
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

ROWS = 256          # f32 tile-friendly; bf16 wants >=16 sublanes — ok
CHAIN = 64          # fma ops per rep per accumulator pair


def make_kernel(dtype):
    floaty = jnp.issubdtype(dtype, jnp.floating)

    def kernel(reps_ref, x_ref, out_ref):
        if floaty:
            one = jnp.ones((), dtype) * 1.0000001
            half = jnp.ones((), dtype) * 0.4999999
        else:
            one = jnp.ones((), dtype) * 3
            half = jnp.ones((), dtype)

        def rep(i, carry):
            a, b = carry
            for _ in range(CHAIN // 2):
                a = (a * one + half).astype(dtype)   # 2 ops
                b = (b * half + one).astype(dtype)   # 2 ops
            return a, b

        x = x_ref[:]
        a, b = jax.lax.fori_loop(0, reps_ref[0], rep, (x, x + one))
        out_ref[:] = a + b

    return kernel


def measure(dtype, reps_pair, timing_reps=5):
    x = jnp.asarray(np.random.RandomState(0).rand(ROWS, 128), dtype)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fn = jax.jit(pl.pallas_call(
        make_kernel(dtype),
        in_specs=[smem, full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), dtype),
        interpret=jax.default_backend() == "cpu",
    ))
    jax.block_until_ready(fn(np.array([1], np.int32), x))

    def tc(p):
        parr = np.array([p], np.int32)
        times = []
        for _ in range(timing_reps):
            t0 = time.perf_counter()
            out = fn(parr, x)
            float(jnp.asarray(out[0, 0], jnp.float32))
            times.append(time.perf_counter() - t0)
        return min(times)

    p_lo, p_hi = reps_pair
    dt = tc(p_hi) - tc(p_lo)
    # ops = fma pairs: each line is mul+add = 2 elementwise ops
    ops = (p_hi - p_lo) * CHAIN * 2 * ROWS * 128
    return ops / dt / 1e9, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps-lo", type=int, default=4000)
    p.add_argument("--reps-hi", type=int, default=36000)
    args = p.parse_args()
    pair = (args.reps_lo, args.reps_hi)
    print(f"device: {jax.devices()[0]}  ROWS={ROWS} CHAIN={CHAIN} "
          f"reps {pair[0]}->{pair[1]}")
    results = {}
    for dtype, name in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16"),
                        (jnp.int16, "i16 "), (jnp.int8, "i8  ")):
        try:
            gops, dt = measure(dtype, pair)
        except Exception as e:  # pragma: no cover
            print(f"| {name} | FAILED: {str(e)[:120]} |")
            continue
        results[name.strip()] = gops
        print(f"| {name} | {gops:8.1f} Gops/s | window {dt * 1e3:7.1f} ms |")
    if "f32" in results:
        for k, v in results.items():
            if k != "f32":
                print(f"{k}/f32 issue ratio: {v / results['f32']:.2f}x")


if __name__ == "__main__":
    main()
