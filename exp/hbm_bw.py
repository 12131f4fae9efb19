"""Measure real HBM->VMEM streaming bandwidth with pipelined DMA.

The round-2 architecture rests on "HBM streaming ~12 GB/s effective"
(BENCHMARKS.md device characteristics) — ~1.5% of TPU v5e's spec
~819 GB/s — measured with NAIVE (XLA-scheduled, non-pipelined) loads.
That number is what forced the scene-in-VMEM/immediates design, the
bake times, and the scene-size cap.  This probe measures what
DOUBLE-BUFFERED in-kernel DMA (pltpu.make_async_copy) actually
sustains, with and without concurrent VPU work, across chunk sizes —
the design-deciding number for a streamed-cluster intersector and
HBM-atlas textures (VERDICT round-2 items 2-4).

Reference analog: the arbitrary-size storage-buffer scene binding the
GPU gets for free (/root/reference/gpu_wavefront_pt/shaders/
extend.wgsl:40-45).

Usage: python exp/hbm_bw.py [--mb 256] [--reps 5]
Writes a GB/s table to stdout (markdown-ready).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax  # noqa: E402

# sitecustomize force-selects the TPU plugin; honor an explicit
# JAX_PLATFORMS=cpu (plumbing validation) like tests/conftest.py does.
_want = os.environ.get("JAX_PLATFORMS", "")
if _want and "axon" not in _want:
    jax.config.update("jax_platforms", _want)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128


def stream_kernel(passes_ref, hbm_ref, out_ref, *, chunk_rows: int,
                  n_chunks: int, compute_iters: int):
    """Double-buffered HBM->VMEM stream; optional VPU work per chunk.

    Accumulates a sum of every chunk into out_ref so no copy can be
    elided.  ``compute_iters`` extra fma-chain iterations per chunk
    emulate the intersector math the stream would overlap with.

    ``passes`` repeats the full sweep inside ONE dispatch: on this
    tunneled device a blocking call costs ~25 ms RTT, which at spec
    bandwidth (~819 GB/s) swamps a 268 MB transfer (0.33 ms) by 75x.
    Timing two different pass counts and taking the slope cancels the
    RTT, dispatch, and host-transfer overheads exactly.
    """

    def body(scratch, acc, sem):
        def get_dma(slot, idx):
            chunk = jax.lax.rem(idx, n_chunks)
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(chunk * chunk_rows, chunk_rows)],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()
        acc[:] = jnp.zeros_like(acc)
        # Dynamic pass count (SMEM scalar): one compile serves every
        # slope point, instead of one ~30 s tunnel compile per count.
        total = passes_ref[0] * n_chunks

        def loop(idx, carry):
            slot = jax.lax.rem(idx, 2)
            nxt = jax.lax.rem(idx + 1, 2)

            @pl.when(idx + 1 < total)
            def _():
                get_dma(nxt, idx + 1).start()

            get_dma(slot, idx).wait()
            # Touch all of the chunk (8-row strips summed) so the data
            # is genuinely consumed by the VPU.
            part = jnp.zeros((8, LANES), jnp.float32)
            for r in range(0, chunk_rows, 8):
                part = part + scratch[slot, r:r + 8, :]
            x = carry
            for _ in range(compute_iters):
                x = x * 1.0000001 + 0.5  # fma chain: issue-bound VPU work
            acc[:] = acc[:] + part
            return x

        x = jax.lax.fori_loop(0, total, loop,
                              jnp.full((8, LANES), 0.1, jnp.float32))
        out_ref[:] = acc[:] + x * 1e-30

    pl.run_scoped(
        body,
        pltpu.VMEM((2, chunk_rows, LANES), jnp.float32),
        pltpu.VMEM((8, LANES), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def _stream_fn(data, chunk_rows: int, n_chunks: int, compute_iters: int):
    fn = pl.pallas_call(
        functools.partial(stream_kernel, chunk_rows=chunk_rows,
                          n_chunks=n_chunks, compute_iters=compute_iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )
    jfn = jax.jit(fn)
    import numpy as _np
    jax.block_until_ready(jfn(_np.array([1], _np.int32), data))
    return jfn


def _time_call(jfn, p, data, reps: int) -> float:
    import numpy as _np
    parr = _np.array([p], _np.int32)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(parr, data)
        float(out[0, 0])  # force a host transfer (tunnel-safe timing)
        times.append(time.perf_counter() - t0)
    return min(times)


def run_stream(data, chunk_rows: int, compute_iters: int, reps: int,
               passes=(2, 42)):
    """Slope-timed bandwidth: stream the buffer p times in one dispatch
    for each p in ``passes``; GB/s = extra bytes / extra seconds.  The
    subtraction cancels RTT, dispatch, compile-cache lookup, and the
    result transfer — everything that is not the stream itself.
    """
    rows = data.shape[0]
    n_chunks = rows // chunk_rows
    p_lo, p_hi = passes
    jfn = _stream_fn(data, chunk_rows, n_chunks, compute_iters)
    t_lo = _time_call(jfn, p_lo, data, reps)
    t_hi = _time_call(jfn, p_hi, data, reps)
    nbytes = n_chunks * chunk_rows * LANES * 4
    dt = t_hi - t_lo
    if dt <= 0:
        return float("nan"), dt
    return (p_hi - p_lo) * nbytes / dt / 1e9, dt


def run_xla_baseline(data, reps: int, passes=(2, 12)):
    """The round-2 'naive' comparison: XLA reduce straight over HBM.

    Slope-timed like run_stream: p full-array reduces inside one jit
    (the idx-dependent scale defeats loop-invariant hoisting), GB/s
    from the (p_hi - p_lo) delta.
    """
    def make(p):
        def f(x):
            def body(i, acc):
                return acc * 1e-37 + (x * (1.0 + i * 1e-30)).sum(axis=0)
            return jax.lax.fori_loop(0, p, body,
                                     jnp.zeros((x.shape[1],), x.dtype))
        jfn = jax.jit(f)
        jax.block_until_ready(jfn(data))
        return jfn

    def tc(jfn):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jfn(data)
            float(out[0])
            times.append(time.perf_counter() - t0)
        return min(times)

    p_lo, p_hi = passes
    dt = tc(make(p_hi)) - tc(make(p_lo))
    if dt <= 0:
        return float("nan"), dt
    return (p_hi - p_lo) * data.nbytes / dt / 1e9, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=256,
                   help="total MB streamed per measurement")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--passes", type=int, nargs=2, default=(2, 42),
                   help="low/high pass counts for slope timing; wider "
                        "= more stable (10.7 GB extra at the default)")
    args = p.parse_args()
    passes = tuple(args.passes)

    rows = args.mb * 1024 * 1024 // (LANES * 4)
    data = jnp.asarray(
        np.random.RandomState(0).rand(rows, LANES).astype(np.float32))
    jax.block_until_ready(data)
    print(f"device: {jax.devices()[0]}  payload: {data.nbytes/1e6:.0f} MB "
          f"({rows}x{LANES} f32)")

    gbs, dt = run_xla_baseline(data, args.reps, passes)
    print(f"| XLA jit sum over HBM (naive baseline) | {gbs:7.2f} GB/s | "
          f"slope {dt*1e3:7.1f} ms |")

    for chunk_kb in (64, 256, 1024, 4096):
        chunk_rows = chunk_kb * 1024 // (LANES * 4)
        if chunk_rows > rows:
            continue
        for iters, label in ((0, "stream only"),
                             (64, "+64 fma/chunk"),
                             (512, "+512 fma/chunk")):
            try:
                gbs, dt = run_stream(data, chunk_rows, iters, args.reps,
                                     passes)
            except Exception as e:
                print(f"| DMA chunk {chunk_kb} KB, {label} | FAILED {e} |")
                continue
            print(f"| DMA double-buffered, chunk {chunk_kb:5d} KB, "
                  f"{label:15s} | {gbs:7.2f} GB/s | slope {dt*1e3:7.1f} ms |")


if __name__ == "__main__":
    main()
