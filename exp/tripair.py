"""Slope-timed triangle-pair test forms (RTT-free, exp/pair_ceiling.py
protocol).

The 50k-tri knot spends 89.1% of iteration cost in primitive block
tests (BENCHMARKS.md round 4 decomposition), so ops-per-triangle-pair
is the one direct lever left on the mesh axis.  This probe measures
the production dynamic tri_block form against a precomputed-matrix
form at the production shape (8-tri blocks x (8,128) ray planes,
dynamic f32 table, full 15-field winner carry):

* T1  production two-sided Moller-Trumbore (pallas_kernels.tri_block:
      2 cross products + 3 dots + div, 18-col table, 11 carry selects)
* T1p T1 with the winner albedo+material packed 16:16 into int32
      columns of a parallel table (4 float selects -> 2 int selects;
      the baked path's pack_attrs applied to the dynamic table)
* T2  matrix form: bake rows of inv([e1, e2, n]) per triangle; the
      test is 6 dots + 2 fma + div, and the third row IS the
      (unnormalized) geometric normal, so the separate normal columns
      and their extracts vanish (same 18-col table width)
* T2p T2 + packed attrs

The rep loop's block base alternates table halves on the rep counter,
so block loads/extracts cannot be hoisted out of the loop (they are
not hoistable in production either: cluster indices are fori-dynamic
under pl.when).

Usage: python exp/tripair.py [--reps-lo 60] [--reps-hi 360]
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

T_MIN = 0.001
T_FAR = 1e30
NTRI = 512            # triangles in the table (64 blocks of 8)
ROWS = 8              # production compute shape (8, 128)


def build_tables(seed=7):
    """Random unit-scale triangles -> (mt_table, mx_table, pk_table).

    mt_table cols: v0 e1 e2 nrm alb fz io mt  (production layout)
    mx_table cols: v0 r0 r1 r2  alb fz io mt  (rows of inv([e1,e2,n]))
    pk_table cols: (r16|g16), (b16|mat)       int32
    """
    rs = np.random.RandomState(seed)
    v0 = rs.uniform(-4, 4, (NTRI, 3)).astype(np.float64)
    e1 = rs.uniform(-1, 1, (NTRI, 3)).astype(np.float64)
    e2 = rs.uniform(-1, 1, (NTRI, 3)).astype(np.float64)
    n = np.cross(e1, e2)
    alb = rs.uniform(0, 1, (NTRI, 3))
    fz = rs.uniform(0, 1, NTRI)
    io = np.full(NTRI, 1.5)
    mt = rs.randint(0, 3, NTRI).astype(np.float64)

    mt_tab = np.concatenate(
        [v0, e1, e2, n, alb, fz[:, None], io[:, None], mt[:, None]],
        axis=1).astype(np.float32)

    minv = np.linalg.inv(np.stack([e1, e2, n], axis=2))  # rows solve
    mx_tab = np.concatenate(
        [v0, minv[:, 0], minv[:, 1], minv[:, 2],
         alb, fz[:, None], io[:, None], mt[:, None]],
        axis=1).astype(np.float32)

    q = np.clip(np.round(alb * 65535.0), 0, 65535).astype(np.int64)
    pk1 = (q[:, 0] << 16) | q[:, 1]
    pk2 = (q[:, 2] << 16) | mt.astype(np.int64)
    pk = np.stack([pk1, pk2], axis=1)
    pk = np.where(pk >= (1 << 31), pk - (1 << 32), pk).astype(np.int32)
    return mt_tab, mx_tab, pk


def tri_mt(blk, j, o, d, carry, pkblk=None):
    """Production tri_block body for one triangle row."""
    ox, oy, oz = o
    dx, dy, dz = d
    (best_t, b_ar, b_ag, b_ab, b_fz, b_io, b_mt,
     b_nx, b_ny, b_nz, b_it) = carry[:11]
    pks = carry[11:]
    v0x, v0y, v0z = blk[j, 0], blk[j, 1], blk[j, 2]
    e1x, e1y, e1z = blk[j, 3], blk[j, 4], blk[j, 5]
    e2x, e2y, e2z = blk[j, 6], blk[j, 7], blk[j, 8]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = jnp.abs(det) > 1e-9
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
             & (tt > T_MIN))
    tt = jnp.where(valid, tt, T_FAR)
    better = tt < best_t
    out = [jnp.where(better, tt, best_t)]
    if pkblk is None:
        out += [jnp.where(better, blk[j, 12], b_ar),
                jnp.where(better, blk[j, 13], b_ag),
                jnp.where(better, blk[j, 14], b_ab)]
        out += [jnp.where(better, blk[j, 15], b_fz),
                jnp.where(better, blk[j, 16], b_io),
                jnp.where(better, blk[j, 17], b_mt)]
    else:
        out += [b_ar, b_ag, b_ab]
        out += [jnp.where(better, blk[j, 15], b_fz),
                jnp.where(better, blk[j, 16], b_io), b_mt]
    out += [jnp.where(better, blk[j, 9], b_nx),
            jnp.where(better, blk[j, 10], b_ny),
            jnp.where(better, blk[j, 11], b_nz),
            jnp.where(better, 1.0, b_it)]
    if pkblk is not None:
        out += [jnp.where(better, pkblk[j, 0], pks[0]),
                jnp.where(better, pkblk[j, 1], pks[1])]
    return tuple(out)


def tri_mx(blk, j, o, d, carry, pkblk=None):
    """Matrix-form body: rows r0,r1,r2 of inv([e1,e2,n]); r2 is the
    unnormalized normal (shade rsqrt-normalizes, sign preserved)."""
    ox, oy, oz = o
    dx, dy, dz = d
    (best_t, b_ar, b_ag, b_ab, b_fz, b_io, b_mt,
     b_nx, b_ny, b_nz, b_it) = carry[:11]
    pks = carry[11:]
    v0x, v0y, v0z = blk[j, 0], blk[j, 1], blk[j, 2]
    r0x, r0y, r0z = blk[j, 3], blk[j, 4], blk[j, 5]
    r1x, r1y, r1z = blk[j, 6], blk[j, 7], blk[j, 8]
    r2x, r2y, r2z = blk[j, 9], blk[j, 10], blk[j, 11]
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    hd = r2x * dx + r2y * dy + r2z * dz
    h0 = r2x * sx + r2y * sy + r2z * sz
    ok = jnp.abs(hd) > 1e-12
    tt = -h0 / jnp.where(ok, hd, 1.0)
    u = (r0x * sx + r0y * sy + r0z * sz) \
        + tt * (r0x * dx + r0y * dy + r0z * dz)
    v = (r1x * sx + r1y * sy + r1z * sz) \
        + tt * (r1x * dx + r1y * dy + r1z * dz)
    valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
             & (tt > T_MIN))
    tt = jnp.where(valid, tt, T_FAR)
    better = tt < best_t
    # Normal carries select r2 (unnormalized n / |n|^2, same sign as n).
    out = [jnp.where(better, tt, best_t)]
    if pkblk is None:
        out += [jnp.where(better, blk[j, 12], b_ar),
                jnp.where(better, blk[j, 13], b_ag),
                jnp.where(better, blk[j, 14], b_ab)]
        out += [jnp.where(better, blk[j, 15], b_fz),
                jnp.where(better, blk[j, 16], b_io),
                jnp.where(better, blk[j, 17], b_mt)]
    else:
        out += [b_ar, b_ag, b_ab]
        out += [jnp.where(better, blk[j, 15], b_fz),
                jnp.where(better, blk[j, 16], b_io), b_mt]
    out += [jnp.where(better, r2x, b_nx),
            jnp.where(better, r2y, b_ny),
            jnp.where(better, r2z, b_nz),
            jnp.where(better, 1.0, b_it)]
    if pkblk is not None:
        out += [jnp.where(better, pkblk[j, 0], pks[0]),
                jnp.where(better, pkblk[j, 1], pks[1])]
    return tuple(out)


def make_kernel(body, packed):
    nblk = NTRI // 8

    def kernel(reps_ref, tab_ref, pk_ref, ox_r, oy_r, oz_r,
               dx_r, dy_r, dz_r, out_ref):
        o0 = (ox_r[:], oy_r[:], oz_r[:])
        d = (dx_r[:], dy_r[:], dz_r[:])
        shape = (ROWS, 128)
        zero = jnp.zeros(shape, jnp.float32)
        init = (jnp.full(shape, T_FAR, jnp.float32),) + (zero,) * 9 \
            + (zero,)
        if packed:
            init = init + (jnp.zeros(shape, jnp.int32),) * 2

        def rep(i, carry):
            # Alternate table halves on the rep counter: block bases are
            # rep-dynamic, so loads/extracts can't hoist (production's
            # cluster indices are fori-dynamic under pl.when too).
            base = (i % 2) * (nblk // 2)
            bump = jnp.float32(i) * 1e-7
            o = (o0[0] + bump, o0[1], o0[2])
            vals = carry
            for k in range(nblk // 2):
                blk = tab_ref[pl.ds((base + k) * 8, 8), :]
                pkb = pk_ref[pl.ds((base + k) * 8, 8), :] if packed \
                    else None
                for j in range(8):
                    vals = body(blk, j, o, d, vals, pkb)
            return vals

        out = jax.lax.fori_loop(0, reps_ref[0], rep, init)
        acc = out[0]
        for v in out[1:11]:
            acc = acc + v
        if packed:
            acc = acc + out[11].astype(jnp.float32) * 1e-9
            acc = acc + out[12].astype(jnp.float32) * 1e-9
        out_ref[:] = acc

    return kernel


def measure(name, body, packed, tab, pk, reps_pair, timing_reps=5):
    rs = np.random.RandomState(3)
    o = [jnp.asarray(rs.uniform(-6, 6, (ROWS, 128)), jnp.float32)
         for _ in range(3)]
    dd = rs.normal(size=(3, ROWS, 128))
    dd /= np.linalg.norm(dd, axis=0, keepdims=True)
    d = [jnp.asarray(x, jnp.float32) for x in dd]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fn = jax.jit(pl.pallas_call(
        make_kernel(body, packed),
        in_specs=[smem] + [full] * 8,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    ))
    args = (jnp.asarray(tab), jnp.asarray(pk)) + tuple(o) + tuple(d)
    jax.block_until_ready(fn(np.array([1], np.int32), *args))

    def tc(p):
        parr = np.array([p], np.int32)
        times = []
        for _ in range(timing_reps):
            t0 = time.perf_counter()
            out = fn(parr, *args)
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        return min(times)

    p_lo, p_hi = reps_pair
    dt = tc(p_hi) - tc(p_lo)
    pairs = (p_hi - p_lo) * (NTRI // 2) * ROWS * 128
    rate = pairs / dt / 1e9
    print(f"{name:28s} {rate:8.2f} Gpairs/s   (dt {dt*1e3:.1f} ms)",
          flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps-lo", type=int, default=60)
    ap.add_argument("--reps-hi", type=int, default=360)
    a = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    mt_tab, mx_tab, pk = build_tables()
    rp = (a.reps_lo, a.reps_hi)
    r1 = measure("T1  MT (production)", tri_mt, False, mt_tab, pk, rp)
    r1p = measure("T1p MT + packed attrs", tri_mt, True, mt_tab, pk, rp)
    r2 = measure("T2  matrix form", tri_mx, False, mx_tab, pk, rp)
    r2p = measure("T2p matrix + packed attrs", tri_mx, True, mx_tab, pk, rp)
    print(f"\nmatrix/MT: {r2 / r1:.3f}x   pack effect (MT): "
          f"{r1p / r1:.3f}x   combined: {r2p / r1:.3f}x")


if __name__ == "__main__":
    main()
