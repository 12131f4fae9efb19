"""Slope-timed re-measurement of the decision-relevant micro_r2 kernels.

Every micro_r2 number was timed as a single blocking call through the
tunnel, so each carried the ~25 ms fixed RTT: at REPS=4000 that is
+6.25 us/iter of pollution on numbers reported as 8-18 us/iter — the
round-2 structural analysis (W8 8.0 vs C9 13.3 us/iter etc.) compared
distorted quantities.  This harness re-times each variant at two REPS
values and uses the slope (extra reps / extra seconds), which cancels
RTT, dispatch, and the output transfer exactly (same method as
exp/pair_ceiling.py, validated there against hbm_bw).

micro_r2's kernel makers close over its module-global REPS at trace
time, so we monkey-patch m.REPS before each jit build — two compiles
per variant (persistently cached).

Usage: python exp/micro_slope.py [W8 C45 C7 A C8 C9 ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS", "")
if _want and "axon" not in _want:
    jax.config.update("jax_platforms", _want)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import micro_r2 as m  # noqa: E402

REPS_LO = 2000
REPS_HI = 18000
TIMING_REPS = 5


def _time(fn, ins):
    times = []
    for _ in range(TIMING_REPS):
        t0 = time.perf_counter()
        out = fn(*ins)
        float(out[0, 0])
        times.append(time.perf_counter() - t0)
    return min(times)


def _build(make_kernel, reps, ins_builder):
    m.REPS = reps
    kernel, ins, specs = ins_builder(make_kernel)
    fn = jax.jit(functools.partial(
        pl.pallas_call, kernel,
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m.ROWS, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu")())
    jax.block_until_ready(fn(*ins))
    return fn, ins


def slope_time(name, make_kernel, ins_builder, pairs_per_rep):
    f_lo, ins = _build(make_kernel, REPS_LO, ins_builder)
    f_hi, _ = _build(make_kernel, REPS_HI, ins_builder)
    t_lo = _time(f_lo, ins)
    t_hi = _time(f_hi, ins)
    per_rep = (t_hi - t_lo) / (REPS_HI - REPS_LO)
    legacy = t_lo / REPS_LO
    print(f"{name}: {per_rep*1e9:8.0f} ns/iter slope "
          f"({pairs_per_rep/per_rep/1e9:6.1f} Gpairs/s eff)   "
          f"[single-call method: {legacy*1e9:8.0f} ns/iter]", flush=True)


def _plain(table):
    """ins_builder for run_pairs-style kernels."""
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def build(make_kernel):
        kernel = make_kernel()
        ins = [jnp.asarray(x) for x in (m.ox0, m.oy0, m.oz0,
                                        m.dx0, m.dy0, m.dz0)]
        specs = [full] * 6
        if table == "sm":
            ins = [jnp.asarray(m.PACKED_SM)] + ins
            specs = [full] + specs
        elif table:
            ins = [jnp.asarray(m.packed)] + ins
            specs = [full] + specs
        return kernel, ins, specs
    return build


def _gated(n_conds, entered, kind):
    """ins_builder for run_gated-style kernels (fixed entry pattern)."""
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def build(make_kernel):
        kernel = make_kernel()
        rs = np.random.RandomState(7)
        cond = np.zeros(n_conds, np.int32)
        cond[rs.choice(n_conds, entered, replace=False)] = 1
        rays = [jnp.asarray(x) for x in (m.ox0, m.oy0, m.oz0,
                                         m.dx0, m.dy0, m.dz0)]
        if kind == "C9":
            masks = np.zeros(n_conds // 8, np.int32)
            for ci in range(n_conds):
                if cond[ci]:
                    masks[ci // 8] |= 1 << (ci % 8)
            ins = [jnp.asarray(m.PACKED_SM), jnp.asarray(masks)] + rays
            specs = [full, smem] + [full] * 6
        elif kind == "C8":
            ins = [jnp.asarray(m.PACKED_SM), jnp.asarray(cond)] + rays
            specs = [full, smem] + [full] * 6
        else:
            ins = [jnp.asarray(cond)] + rays
            specs = [smem] + [full] * 6
        return kernel, ins, specs
    return build


def main():
    which = sys.argv[1:] or ["W8", "C45", "C7", "C8", "C9"]
    pairs_sweep = m.S * m.ROWS * 128
    print(f"device: {jax.devices()[0]}  S={m.S} ROWS={m.ROWS} "
          f"slope {REPS_LO}->{REPS_HI}")
    if "W8" in which:
        # production-shaped tile-gated baked: effective pairs = entered
        # clusters x 16 spheres x 1024 lanes
        slope_time("W8 tile-gated RM baked 12/25",
                   lambda: m.make_kernel_w8(12),
                   _gated(25, 12, "W8"), 12 * 16 * m.ROWS * 128)
    if "C45" in which:
        slope_time("C45 dyn ray-major 10-attr  ",
                   lambda: m.make_kernel_c45(True, 10),
                   _plain(True), pairs_sweep)
    if "C7" in which:
        slope_time("C7  dyn sph-major 10-attr  ",
                   lambda: m.make_kernel_c7(10),
                   _plain("sm"), pairs_sweep)
    if "A2" in which:
        # CAUTION: A2's measured slope (202 ns/iter -> "2028 Gpairs/s")
        # is physically impossible (the VPU cannot issue 14x its pair
        # ceiling) — its baked iota-select constant blocks are loop-
        # invariant enough that the compiler collapses most of the rep
        # loop at REPS_HI.  The number measures code motion, not sweep
        # cost; kept runnable for reproduction, excluded from defaults.
        slope_time("A2  baked sph-major 2-attr [UNTRUSTWORTHY, see note]",
                   lambda: m.make_kernel_a2(False),
                   _plain(False), pairs_sweep)
    if "C8" in which:
        slope_time("C8  row-gated SM pl.when   ",
                   lambda: m.make_kernel_c8(37),
                   _gated(200, 37, "C8"), 37 * 16 * 128)
    if "C9" in which:
        slope_time("C9  row-gated SM worklist  ",
                   lambda: m.make_kernel_c9(),
                   _gated(200, 37, "C9"), 37 * 16 * 128)


if __name__ == "__main__":
    main()
