"""Round-2 kernel-design microbenchmarks (run on the real TPU).

Measures pairs/s (ray-sphere tests per second) for candidate intersect
loop designs, plus raw in-kernel matmul throughput, to decide the
round-2 fused-kernel architecture.  Variants:

  A   baked unroll, 11 winner-attribute selects per sphere (status quo)
  B   baked unroll, best_t+best_idx carries only + unrolled one-hot
      attribute-accumulate pass
  C   sphere-major dynamic: fori over 8-sphere VMEM blocks, (8,1)->(8,128)
      broadcasts, rays one (1,128) row at a time
  C2  ray-major dynamic: block vector load + static scalar extracts,
      11 attribute selects (A's structure, no baking)
  C3  ray-major dynamic: block load + t/idx carries + block one-hot pass
  D   raw matmul: f32 (128,8)x(8,S2) small-K and (16,S)x(S,128) onehot-shape
  C7  sphere-major with FULL 10-attr select carries (production shape)
  C8  row-gated sphere-major: pl.when per (cluster, row) + one-hot decode
  C9  row-gated worklist: fori + scalar-while over SMEM row masks,
      dynamic-base loads (branchless C8)
  W8  tile-gated ray-major baked baseline for C8/C9 (production shape)

Usage: python exp/micro_r2.py [A B C ...]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402 (enables cache)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 400            # spheres
REPS = int(os.environ.get("REPS", "4000"))  # sphere-set sweeps per kernel call
ROWS = 8
T_MIN = 0.001
T_FAR = 1e30

rng = np.random.RandomState(0)
centers = rng.uniform(-10, 10, (S, 3)).astype(np.float32)
radii = rng.uniform(0.2, 1.0, (S,)).astype(np.float32)
attrs = rng.uniform(0.1, 1.0, (S, 10)).astype(np.float32)  # ar..mt etc.
# packed dynamic table (S,16): c xyz, r, attrs 10
packed = np.zeros((S, 16), np.float32)
packed[:, 0:3] = centers
packed[:, 3] = radii
packed[:, 4:14] = attrs

SPH = [tuple(float(v) for v in row) for row in packed[:, :14]]

ox0 = rng.uniform(-1, 1, (ROWS, 128)).astype(np.float32)
oy0 = rng.uniform(-1, 1, (ROWS, 128)).astype(np.float32)
oz0 = rng.uniform(-1, 1, (ROWS, 128)).astype(np.float32)
d = rng.normal(size=(3, ROWS, 128)).astype(np.float32)
d /= np.linalg.norm(d, axis=0, keepdims=True)
dx0, dy0, dz0 = d[0], d[1], d[2]


def quadratic(ox, oy, oz, dx, dy, dz, cx, cy, cz, r, best_t):
    """Shared sphere test; returns (t, better)."""
    ocx = ox - cx
    ocy = oy - cy
    ocz = oz - cz
    b_q = dx * ocx + dy * ocy + dz * ocz
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b_q * b_q - c_q
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = -b_q - sq
    t2 = -b_q + sq
    t = jnp.where(t1 > T_MIN, t1, jnp.where(t2 > T_MIN, t2, T_FAR))
    t = jnp.where(disc >= 0.0, t, T_FAR)
    better = t < best_t
    return t, better


def kernel_a(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    f32 = jnp.float32
    shape = ox.shape
    zeros = jnp.zeros(shape, f32)

    def rep(i, carry):
        acc, dxm = carry
        dxm = dxm + 1e-6  # defeat loop-invariant hoisting
        best_t = jnp.full(shape, T_FAR, f32)
        b = [zeros] * 10
        for cx, cy, cz, r, *a in SPH:
            t, better = quadratic(ox, oy, oz, dxm, dy, dz, cx, cy, cz, r, best_t)
            best_t = jnp.where(better, t, best_t)
            b = [jnp.where(better, av, bv) for av, bv in zip(a, b)]
        acc = acc + best_t + b[0] + b[9]
        return acc, dxm

    acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
    out_ref[:] = acc


def kernel_b(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    f32 = jnp.float32
    shape = ox.shape
    zeros = jnp.zeros(shape, f32)

    def rep(i, carry):
        acc, dxm = carry
        dxm = dxm + 1e-6
        best_t = jnp.full(shape, T_FAR, f32)
        best_i = jnp.full(shape, -1.0, f32)
        for si, (cx, cy, cz, r, *a) in enumerate(SPH):
            t, better = quadratic(ox, oy, oz, dxm, dy, dz, cx, cy, cz, r, best_t)
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, f32(si), best_i)
        # one-hot attribute accumulation pass (unrolled)
        b = [zeros] * 10
        for si, (cx, cy, cz, r, *a) in enumerate(SPH):
            onehot = jnp.where(best_i == f32(si), 1.0, 0.0)
            b = [bv + onehot * av for av, bv in zip(a, b)]
        acc = acc + best_t + b[0] + b[9]
        return acc, dxm

    acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
    out_ref[:] = acc


def kernel_c(scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
    """Sphere-major dynamic: blocks of 8 spheres on sublanes, 128 rays on lanes."""
    f32 = jnp.float32
    nblk = S // 8
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(f32)

    def rep(i, carry):
        acc, bump = carry
        bump = bump + 1e-6
        row_accs = []
        for rr in range(ROWS):
            ox = ox_ref[rr:rr + 1, :]
            oy = oy_ref[rr:rr + 1, :]
            oz = oz_ref[rr:rr + 1, :]
            dx = dx_ref[rr:rr + 1, :] + bump
            dy = dy_ref[rr:rr + 1, :]
            dz = dz_ref[rr:rr + 1, :]

            def blk_step(k, c):
                best_t, best_i = c
                blk = scn_ref[pl.ds(k * 8, 8), :]       # (8,16) dynamic sublane load
                cx = blk[:, 0:1]
                cy = blk[:, 1:2]
                cz = blk[:, 2:3]
                r = blk[:, 3:4]
                t, _ = quadratic(ox, oy, oz, dx, dy, dz, cx, cy, cz, r,
                                 jnp.full((8, 128), T_FAR, f32))
                # per-block min + index over sublanes
                tmin = jnp.min(t, axis=0, keepdims=True)          # (1,128)
                win = jnp.where(t == tmin, iota8 + f32(1.0), f32(0.0))
                idx = jnp.max(win, axis=0, keepdims=True) - 1.0 + 8.0 * k.astype(f32)
                better = tmin < best_t
                best_t = jnp.where(better, tmin, best_t)
                best_i = jnp.where(better, idx, best_i)
                return best_t, best_i

            bt0 = jnp.full((1, 128), T_FAR, f32)
            bi0 = jnp.full((1, 128), -1.0, f32)
            best_t, best_i = jax.lax.fori_loop(0, nblk, blk_step, (bt0, bi0))

            # attribute fetch pass: one-hot fma over blocks
            def attr_step(k, accs):
                blk = scn_ref[pl.ds(k * 8, 8), :]
                onehot = jnp.where(iota8 + 8.0 * k.astype(f32) == best_i, 1.0, 0.0)
                return [av + jnp.sum(onehot * blk[:, 4 + j:5 + j], axis=0,
                                     keepdims=True)
                        for j, av in enumerate(accs)]

            accs = jax.lax.fori_loop(
                0, nblk, attr_step, [jnp.zeros((1, 128), f32)] * 10)
            row_accs.append(best_t + accs[0] + accs[9])
        acc = acc + jnp.concatenate(row_accs, axis=0)
        return acc, bump

    acc, _ = jax.lax.fori_loop(
        0, REPS, rep, (jnp.zeros((ROWS, 128), f32), jnp.float32(0.0)))
    out_ref[:] = acc


def kernel_c2(scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
    """Ray-major dynamic: block vector load, static scalar extracts, A-style selects."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    f32 = jnp.float32
    shape = ox.shape
    zeros = jnp.zeros(shape, f32)
    nblk = S // 8

    def rep(i, carry):
        acc, dxm = carry
        dxm = dxm + 1e-6

        def blk_step(k, c):
            best_t, b0, b9 = c
            blk = scn_ref[pl.ds(k * 8, 8), :]
            for j in range(8):
                cx, cy, cz, r = blk[j, 0], blk[j, 1], blk[j, 2], blk[j, 3]
                t, better = quadratic(ox, oy, oz, dxm, dy, dz, cx, cy, cz, r,
                                      best_t)
                best_t = jnp.where(better, t, best_t)
                b0 = jnp.where(better, blk[j, 4], b0)
                b9 = jnp.where(better, blk[j, 13], b9)
            return best_t, b0, b9

        best_t, b0, b9 = jax.lax.fori_loop(
            0, nblk, blk_step, (jnp.full(shape, T_FAR, f32), zeros, zeros))
        # NOTE: only 2 of 10 attrs carried (cheaper than A; C3 has the full fix)
        acc = acc + best_t + b0 + b9
        return acc, dxm

    acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
    out_ref[:] = acc


def kernel_c3(scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
    """Ray-major dynamic: block load + t/idx carries + one-hot attr pass."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    f32 = jnp.float32
    shape = ox.shape
    zeros = jnp.zeros(shape, f32)
    nblk = S // 8

    def rep(i, carry):
        acc, dxm = carry
        dxm = dxm + 1e-6

        def blk_step(k, c):
            best_t, best_i = c
            blk = scn_ref[pl.ds(k * 8, 8), :]
            base = 8.0 * k.astype(f32)
            for j in range(8):
                cx, cy, cz, r = blk[j, 0], blk[j, 1], blk[j, 2], blk[j, 3]
                t, better = quadratic(ox, oy, oz, dxm, dy, dz, cx, cy, cz, r,
                                      best_t)
                best_t = jnp.where(better, t, best_t)
                best_i = jnp.where(better, base + f32(j), best_i)
            return best_t, best_i

        best_t, best_i = jax.lax.fori_loop(
            0, nblk, blk_step,
            (jnp.full(shape, T_FAR, f32), jnp.full(shape, -1.0, f32)))

        def attr_step(k, accs):
            blk = scn_ref[pl.ds(k * 8, 8), :]
            base = 8.0 * k.astype(f32)
            out = list(accs)
            for j in range(8):
                onehot = jnp.where(best_i == base + f32(j), 1.0, 0.0)
                out = [av + onehot * blk[j, 4 + jj] for jj, av in enumerate(out)]
            return out

        accs = jax.lax.fori_loop(0, nblk, attr_step, [zeros] * 10)
        acc = acc + best_t + accs[0] + accs[9]
        return acc, dxm

    acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
    out_ref[:] = acc


def run_pairs(name, kernel, dynamic_table):
    ins = [jnp.asarray(x) for x in (ox0, oy0, oz0, dx0, dy0, dz0)]
    if dynamic_table == "sm":
        ins = [jnp.asarray(PACKED_SM)] + ins
    elif dynamic_table:
        ins = [jnp.asarray(packed)] + ins
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = jax.jit(functools.partial(
        pl.pallas_call,
        kernel,
        in_specs=[full] * len(ins),
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
    )())
    t0 = time.time()
    out = np.asarray(fn(*ins))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = np.asarray(fn(*ins))
        times.append(time.time() - t0)
    dt = min(times)
    pairs = REPS * S * ROWS * 128
    print(f"{name}: {pairs / dt / 1e9:.2f} Gpairs/s  ({dt*1e3:.1f} ms/call, "
          f"compile {compile_s:.0f}s, checksum {out.sum():.3e})", flush=True)


def matmul_bench():
    f32 = jnp.float32
    for name, (m, k, n), prec, dt_in in [
        ("f32 (128,8)x(8,1024) DEFAULT", (128, 8, 1024), "default", f32),
        ("f32 (128,8)x(8,1024) HIGHEST", (128, 8, 1024), "highest", f32),
        ("f32 (16,400)x(400,128) DEFAULT", (16, 400, 128), "default", f32),
        ("f32 (16,400)x(400,128) HIGHEST", (16, 400, 128), "highest", f32),
        ("f32 (256,128)x(128,256) DEFAULT", (256, 128, 256), "default", f32),
        ("f32 (256,128)x(128,256) HIGHEST", (256, 128, 256), "highest", f32),
        ("bf16 (256,128)x(128,256)", (256, 128, 256), "default", jnp.bfloat16),
    ]:
        a = jnp.asarray(rng.uniform(-1, 1, (m, k)), dt_in)
        b = jnp.asarray(rng.uniform(-1, 1, (k, n)), dt_in)

        def kern(a_ref, b_ref, o_ref, prec=prec):
            av = a_ref[:]

            def rep(i, acc):
                out = jax.lax.dot_general(
                    av + acc[0, 0] * 1e-9, b_ref[:],
                    (((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)
                return acc + out
            o_ref[:] = jax.lax.fori_loop(
                0, REPS * 4, rep, jnp.zeros((m, n), jnp.float32))

        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        fn = jax.jit(functools.partial(
            pl.pallas_call, kern,
            in_specs=[full, full], out_specs=full,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32))())
        t0 = time.time()
        out = np.asarray(fn(a, b))
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = np.asarray(fn(a, b))
            times.append(time.time() - t0)
        dt = min(times)
        flops = 2 * m * k * n * REPS * 4
        print(f"{name}: {flops / dt / 1e12:.2f} TFLOP/s  ({dt*1e3:.1f} ms, "
              f"compile {compile_s:.0f}s, sum {out.sum():.3e})", flush=True)


def kernel_q(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
    """Floor: baked quadratic + best_t min only (no attrs, no idx)."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    f32 = jnp.float32
    shape = ox.shape
    zeros = jnp.zeros(shape, f32)

    def rep(i, carry):
        acc, dxm = carry
        dxm = dxm + 1e-6
        best_t = jnp.full(shape, T_FAR, f32)
        for cx, cy, cz, r, *a in SPH:
            t, better = quadratic(ox, oy, oz, dxm, dy, dz, cx, cy, cz, r, best_t)
            best_t = jnp.where(better, t, best_t)
        acc = acc + best_t
        return acc, dxm

    acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
    out_ref[:] = acc


def kernel_q2(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
    """Like Q but sqrt replaced by a multiply — gauges sqrt cost."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    f32 = jnp.float32
    shape = ox.shape
    zeros = jnp.zeros(shape, f32)

    def rep(i, carry):
        acc, dxm = carry
        dxm = dxm + 1e-6
        best_t = jnp.full(shape, T_FAR, f32)
        for cx, cy, cz, r, *a in SPH:
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b_q = dxm * ocx + dy * ocy + dz * ocz
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b_q * b_q - c_q
            sq = disc * 0.5  # fake sqrt
            t1 = -b_q - sq
            t2 = -b_q + sq
            t = jnp.where(t1 > T_MIN, t1, jnp.where(t2 > T_MIN, t2, T_FAR))
            t = jnp.where(disc >= 0.0, t, T_FAR)
            best_t = jnp.where(t < best_t, t, best_t)
        acc = acc + best_t
        return acc, dxm

    acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
    out_ref[:] = acc




def make_kernel_qn(nchains):
    """Quadratic with nchains independent best_t chains (ILP test)."""
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        f32 = jnp.float32
        shape = ox.shape
        zeros = jnp.zeros(shape, f32)

        def rep(i, carry):
            acc, dxm = carry
            dxm = dxm + 1e-6
            bts = [jnp.full(shape, T_FAR, f32) for _ in range(nchains)]
            for si, (cx, cy, cz, r, *a) in enumerate(SPH):
                c = si % nchains
                t, better = quadratic(ox, oy, oz, dxm, dy, dz, cx, cy, cz, r, bts[c])
                bts[c] = jnp.where(better, t, bts[c])
            best_t = bts[0]
            for b in bts[1:]:
                best_t = jnp.minimum(best_t, b)
            acc = acc + best_t
            return acc, dxm

        acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
        out_ref[:] = acc
    return kernel



def make_kernel_when(n_checks, body_spheres, use_when):
    """Cost model probe: n_checks consensus gates per rep, each gating
    body_spheres sphere tests.  use_when=False runs bodies unconditionally."""
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        f32 = jnp.float32
        shape = ox.shape
        zeros = jnp.zeros(shape, f32)

        def scoped(t_ref):
            def rep(i, carry):
                acc, dxm = carry
                dxm = dxm + 1e-6
                t_ref[:] = jnp.full(shape, T_FAR, f32)
                for c in range(n_checks):
                    # fake slab test (~15 ops) + consensus
                    lo = [-10.0 + c, -1.0, -10.0]
                    hi = [-8.0 + c, 1.0, -8.0]
                    tx0 = (lo[0] - ox) / dxm
                    tx1 = (hi[0] - ox) / dxm
                    tmin = jnp.minimum(tx0, tx1)
                    tmax = jnp.maximum(tx0, tx1)
                    ty0 = (lo[1] - oy) * dy
                    ty1 = (hi[1] - oy) * dy
                    tmin = jnp.maximum(tmin, jnp.minimum(ty0, ty1))
                    tmax = jnp.minimum(tmax, jnp.maximum(ty0, ty1))
                    tz0 = (lo[2] - oz) * dz
                    tz1 = (hi[2] - oz) * dz
                    tmin = jnp.maximum(tmin, jnp.minimum(tz0, tz1))
                    tmax = jnp.minimum(tmax, jnp.maximum(tz0, tz1))
                    live = (tmin <= tmax) & (jnp.maximum(tmin, 0.0) < t_ref[:])

                    def bodyfn(c=c):
                        best_t = t_ref[:]
                        for cx, cy, cz, r, *a in SPH[c * body_spheres:
                                                     (c + 1) * body_spheres]:
                            t, better = quadratic(ox, oy, oz, dxm, dy, dz,
                                                  cx, cy, cz, r, best_t)
                            best_t = jnp.where(better, t, best_t)
                        t_ref[:] = best_t

                    if use_when:
                        pl.when(jnp.any(live))(bodyfn)
                    else:
                        bodyfn()
                acc = acc + t_ref[:]
                return acc, dxm

            acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
            out_ref[:] = acc

        pl.run_scoped(scoped, pltpu.VMEM(shape, jnp.float32))
    return kernel


def make_kernel_when2(n_checks, body_spheres, mode):
    """Batched-consensus probes.  mode: "pre" = all any()s computed up
    front then scalar whens; "pack" = single or-reduce of an int32
    bitmask plane then scalar bit-test whens."""
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        f32 = jnp.float32
        shape = ox.shape
        zeros = jnp.zeros(shape, f32)

        def boxtest(c, dxm, cap):
            lo = [-10.0 + c, -1.0, -10.0]
            hi = [-8.0 + c, 1.0, -8.0]
            tx0 = (lo[0] - ox) / dxm
            tx1 = (hi[0] - ox) / dxm
            tmin = jnp.minimum(tx0, tx1)
            tmax = jnp.maximum(tx0, tx1)
            ty0 = (lo[1] - oy) * dy
            ty1 = (hi[1] - oy) * dy
            tmin = jnp.maximum(tmin, jnp.minimum(ty0, ty1))
            tmax = jnp.minimum(tmax, jnp.maximum(ty0, ty1))
            tz0 = (lo[2] - oz) * dz
            tz1 = (hi[2] - oz) * dz
            tmin = jnp.maximum(tmin, jnp.minimum(tz0, tz1))
            tmax = jnp.minimum(tmax, jnp.maximum(tz0, tz1))
            return (tmin <= tmax) & (jnp.maximum(tmin, 0.0) < cap)

        def scoped(t_ref):
            def rep(i, carry):
                acc, dxm = carry
                dxm = dxm + 1e-6
                t_ref[:] = jnp.full(shape, T_FAR, f32)
                cap = t_ref[:]
                if mode == "pre":
                    conds = [jnp.any(boxtest(c, dxm, cap))
                             for c in range(n_checks)]
                else:
                    mask = jnp.zeros(shape, jnp.int32)
                    for c in range(n_checks):
                        mask = mask | (boxtest(c, dxm, cap).astype(jnp.int32)
                                       << c)
                    packed = jnp.max(jnp.bitwise_or(
                        mask, jnp.zeros(shape, jnp.int32)))  # placeholder
                    # real OR-reduce:
                    packed = jax.lax.reduce(
                        mask, jnp.int32(0), jax.lax.bitwise_or, (0, 1))
                    conds = [((packed >> c) & 1) > 0 for c in range(n_checks)]

                for c in range(n_checks):
                    def bodyfn(c=c):
                        best_t = t_ref[:]
                        for cx, cy, cz, r, *a in SPH[c * body_spheres:
                                                     (c + 1) * body_spheres]:
                            t, better = quadratic(ox, oy, oz, dxm, dy, dz,
                                                  cx, cy, cz, r, best_t)
                            best_t = jnp.where(better, t, best_t)
                        t_ref[:] = best_t
                    pl.when(conds[c])(bodyfn)
                acc = acc + t_ref[:]
                return acc, dxm

            acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
            out_ref[:] = acc

        pl.run_scoped(scoped, pltpu.VMEM(shape, jnp.float32))
    return kernel


def make_kernel_w7(n_clusters, spheres_per_cluster):
    """Dynamic-culled prototype: batched conds -> SMEM scalars -> fori
    over clusters with pl.when(smem scalar) gating dynamic block loads.
    Compile size O(n_clusters) for conds only; body is O(1)."""
    def kernel(scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               out_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        f32 = jnp.float32
        shape = ox.shape
        zeros = jnp.zeros(shape, f32)
        blocks_per_cluster = spheres_per_cluster // 8

        def scoped(t_ref, cond_ref):
            def rep(i, carry):
                acc, dxm = carry
                dxm = dxm + 1e-6
                t_ref[:] = jnp.full(shape, T_FAR, f32)

                # cond pass: batched anys (pipelined), stored to SMEM
                for c in range(n_clusters):
                    lo = [-10.0 + c * 0.5, -1.0, -10.0]
                    hi = [-8.0 + c * 0.5, 1.0, -8.0]
                    tx0 = (lo[0] - ox) / dxm
                    tx1 = (hi[0] - ox) / dxm
                    tmin = jnp.minimum(tx0, tx1)
                    tmax = jnp.maximum(tx0, tx1)
                    ty0 = (lo[1] - oy) * dy
                    ty1 = (hi[1] - oy) * dy
                    tmin = jnp.maximum(tmin, jnp.minimum(ty0, ty1))
                    tmax = jnp.minimum(tmax, jnp.maximum(ty0, ty1))
                    live = (tmin <= tmax) & (jnp.maximum(tmin, 0.0) < t_ref[0, 0])
                    cond_ref[c] = jnp.any(live).astype(jnp.int32)

                def cluster_step(k, best_t):
                    @pl.when(cond_ref[k] > 0)
                    def _():
                        bt = t_ref[:]
                        for b in range(blocks_per_cluster):
                            blk = scn_ref[pl.ds(k * spheres_per_cluster
                                                + b * 8, 8), :]
                            for j in range(8):
                                cx, cy, cz, r = (blk[j, 0], blk[j, 1],
                                                 blk[j, 2], blk[j, 3])
                                t, better = quadratic(ox, oy, oz, dxm, dy,
                                                      dz, cx, cy, cz, r, bt)
                                bt = jnp.where(better, t, bt)
                        t_ref[:] = bt
                    return best_t

                jax.lax.fori_loop(0, n_clusters, cluster_step, jnp.float32(0))
                acc = acc + t_ref[:]
                return acc, dxm

            acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
            out_ref[:] = acc

        pl.run_scoped(scoped, pltpu.VMEM(shape, jnp.float32),
                      pltpu.SMEM((n_clusters,), jnp.int32))
    return kernel


def _packed_sm():
    """Sphere-major table: (S, 24) f32 — c xyz, r, attrs 10, kappa,
    inv_r, 2c xyz (the pack_culled_scene column layout, widened)."""
    t = np.zeros((S, 24), np.float32)
    t[:, :16] = packed
    c64 = centers.astype(np.float64)
    t[:, 14] = (np.sum(c64 * c64, axis=1) - radii.astype(np.float64) ** 2)
    t[:, 15] = 1.0 / radii
    t[:, 16:19] = 2.0 * c64
    return t


PACKED_SM = _packed_sm()


def _sm_sweep_rows(get_block, nblk, ox_ref, oy_ref, oz_ref,
                   dx_ref, dy_ref, dz_ref, bump, decode: bool):
    """Shared sphere-major body: 8 spheres on sublanes x 128 rays on
    lanes, one ray row at a time.  Slimmed quadratic on (kappa, 2c)
    columns, (t8, i8) carries merged per block (3 ops), one cross-
    sublane reduce per row, then a one-hot fma decode pass (2.5
    ops/sphere) for 2 probe attrs (real kernel: 10+, same shape).

    ``get_block(k) -> dict`` returns (8,1) column arrays (dynamic:
    slices of a VMEM block load; baked: trace-time constants)."""
    f32 = jnp.float32
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(f32)
    row_out = []
    for rr in range(ROWS):
        ox = jnp.broadcast_to(ox_ref[rr:rr + 1, :], (8, 128))
        oy = jnp.broadcast_to(oy_ref[rr:rr + 1, :], (8, 128))
        oz = jnp.broadcast_to(oz_ref[rr:rr + 1, :], (8, 128))
        dx = jnp.broadcast_to(dx_ref[rr:rr + 1, :], (8, 128)) + bump
        dy = jnp.broadcast_to(dy_ref[rr:rr + 1, :], (8, 128))
        dz = jnp.broadcast_to(dz_ref[rr:rr + 1, :], (8, 128))
        hdx, hdy, hdz = 0.5 * dx, 0.5 * dy, 0.5 * dz
        dd_o = dx * ox + dy * oy + dz * oz
        oo2 = ox * ox + oy * oy + oz * oz
        t8 = jnp.full((8, 128), T_FAR, f32)
        i8 = jnp.full((8, 128), -1.0, f32)
        for k in range(nblk):
            b = get_block(k)
            nb = (hdx * b["tcx"] + hdy * b["tcy"] + hdz * b["tcz"]) - dd_o
            c_q = (oo2 + b["kappa"]) - (ox * b["tcx"] + oy * b["tcy"]
                                        + oz * b["tcz"])
            disc = nb * nb - c_q
            sq = jnp.sqrt(disc)            # NaN when disc < 0
            t1 = nb - sq
            t2 = nb + sq
            t = jnp.where(t1 > T_MIN, t1, jnp.where(t2 > T_MIN, t2, T_FAR))
            better = t < t8
            t8 = jnp.where(better, t, t8)
            i8 = jnp.where(better, iota8 + f32(8 * k), i8)
        tmin = jnp.min(t8, axis=0, keepdims=True)                 # (1,128)
        ii = jnp.where(t8 == tmin, i8, f32(1e9))
        imin = jnp.min(ii, axis=0, keepdims=True)                 # (1,128)
        if decode:
            win_i = jnp.broadcast_to(imin, (8, 128))
            a0 = jnp.zeros((8, 128), f32)
            a9 = jnp.zeros((8, 128), f32)
            for k in range(nblk):
                b = get_block(k)
                onehot = jnp.where(win_i == iota8 + f32(8 * k), 1.0, 0.0)
                a0 = a0 + onehot * b["a0"]
                a9 = a9 + onehot * b["a9"]
            out = tmin + jnp.sum(a0 + a9, axis=0, keepdims=True)
        else:
            out = tmin + imin
        row_out.append(out)
    return jnp.concatenate(row_out, axis=0)


def make_kernel_c6(decode: bool):
    """Dynamic sphere-major: (8,24) block loads, (8,1) column slices
    broadcast along lanes — NO scalar extracts anywhere."""
    nblk = S // 8

    def kernel(scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               out_ref):
        def get_block(k):
            blk = scn_ref[pl.ds(k * 8, 8), :]
            return {"tcx": blk[:, 16:17], "tcy": blk[:, 17:18],
                    "tcz": blk[:, 18:19], "kappa": blk[:, 14:15],
                    "a0": blk[:, 4:5], "a9": blk[:, 13:14]}

        def rep(i, carry):
            acc, bump = carry
            bump = bump + 1e-6
            acc = acc + _sm_sweep_rows(get_block, nblk, ox_ref, oy_ref,
                                       oz_ref, dx_ref, dy_ref, dz_ref,
                                       bump, decode)
            return acc, bump

        acc, _ = jax.lax.fori_loop(
            0, REPS, rep, (jnp.zeros((ROWS, 128), jnp.float32),
                           jnp.float32(0.0)))
        out_ref[:] = acc

    return kernel


def make_kernel_c7(nattrs: int = 10):
    """Sphere-major dynamic with FULL attribute select carries — the
    planned production dynculled structure: per block, merge t/i plus
    ``nattrs`` attribute planes with (8,128) selects against (8,1)
    column broadcasts (no scalar extracts, no decode pass, no second
    pl.when boundary); per row, one final cross-sublane winner reduce
    (masked sums, ~2 ops/attr/row — amortized over all blocks)."""
    nblk = S // 8

    def kernel(scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               out_ref):
        f32 = jnp.float32
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(f32)

        def rep(i, carry):
            acc, bump = carry
            bump = bump + 1e-6
            rows_out = []
            for rr in range(ROWS):
                ox = jnp.broadcast_to(ox_ref[rr:rr + 1, :], (8, 128))
                oy = jnp.broadcast_to(oy_ref[rr:rr + 1, :], (8, 128))
                oz = jnp.broadcast_to(oz_ref[rr:rr + 1, :], (8, 128))
                dx = jnp.broadcast_to(dx_ref[rr:rr + 1, :], (8, 128)) + bump
                dy = jnp.broadcast_to(dy_ref[rr:rr + 1, :], (8, 128))
                dz = jnp.broadcast_to(dz_ref[rr:rr + 1, :], (8, 128))
                hdx, hdy, hdz = 0.5 * dx, 0.5 * dy, 0.5 * dz
                dd_o = dx * ox + dy * oy + dz * oz
                oo2 = ox * ox + oy * oy + oz * oz
                t8 = jnp.full((8, 128), T_FAR, f32)
                i8 = jnp.full((8, 128), -1.0, f32)
                a8 = [jnp.zeros((8, 128), f32)] * nattrs
                for k in range(nblk):
                    blk = scn_ref[pl.ds(k * 8, 8), :]
                    tcx, tcy, tcz = (blk[:, 16:17], blk[:, 17:18],
                                     blk[:, 18:19])
                    nb = (hdx * tcx + hdy * tcy + hdz * tcz) - dd_o
                    c_q = (oo2 + blk[:, 14:15]) - (ox * tcx + oy * tcy
                                                   + oz * tcz)
                    disc = nb * nb - c_q
                    sq = jnp.sqrt(disc)        # NaN when disc < 0
                    t1 = nb - sq
                    t2 = nb + sq
                    t = jnp.where(t1 > T_MIN, t1,
                                  jnp.where(t2 > T_MIN, t2, T_FAR))
                    better = t < t8
                    t8 = jnp.where(better, t, t8)
                    i8 = jnp.where(better, iota8 + f32(8 * k), i8)
                    a8 = [jnp.where(better, blk[:, 4 + jj:5 + jj], av)
                          for jj, av in enumerate(a8)]
                tmin = jnp.min(t8, axis=0, keepdims=True)
                ii = jnp.where(t8 == tmin, i8, f32(1e9))
                imin = jnp.min(ii, axis=0, keepdims=True)
                winm = i8 == jnp.broadcast_to(imin, (8, 128))
                outs = tmin
                for av in a8:
                    outs = outs + jnp.sum(jnp.where(winm, av, 0.0),
                                          axis=0, keepdims=True)
                rows_out.append(outs)
            acc = acc + jnp.concatenate(rows_out, axis=0)
            return acc, bump

        acc, _ = jax.lax.fori_loop(
            0, REPS, rep, (jnp.zeros((ROWS, 128), jnp.float32),
                           jnp.float32(0.0)))
        out_ref[:] = acc

    return kernel


def make_kernel_c8(entered_rows: int, n_clusters: int = 25,
                   cluster_size: int = 16, nattrs: int = 10):
    """Row-gated sphere-major sweep — the granularity_sim candidate.

    Structure: per (cluster, row) pl.when on an input-driven SMEM cond
    (8x finer consensus than the tile-gated production sweep), SM
    (t8, i8) carries in (64,128) VMEM refs, then a decode pass over the
    SAME conds accumulating ``nattrs`` one-hot attributes.  The cond
    pattern enters ``entered_rows`` of the n_clusters*8 (cluster, row)
    pairs per cluster-column — granularity_sim says production-like
    workloads need only ~39% of the tile-gated pair work at this
    granularity; this kernel measures the realized wall-time cost of
    the finer structure (extra whens, restage, decode)."""
    bpc = cluster_size // 8

    def kernel(scn_ref, cond_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, out_ref):
        f32 = jnp.float32
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(f32)

        def scoped(t_ref, i_ref, *a_refs):
            def rep(i, carry):
                acc, bump = carry
                bump = bump + 1e-6
                rows_pre = []
                for rr in range(ROWS):
                    ox = jnp.broadcast_to(ox_ref[rr:rr + 1, :], (8, 128))
                    oy = jnp.broadcast_to(oy_ref[rr:rr + 1, :], (8, 128))
                    oz = jnp.broadcast_to(oz_ref[rr:rr + 1, :], (8, 128))
                    dx = jnp.broadcast_to(dx_ref[rr:rr + 1, :],
                                          (8, 128)) + bump
                    dy = jnp.broadcast_to(dy_ref[rr:rr + 1, :], (8, 128))
                    dz = jnp.broadcast_to(dz_ref[rr:rr + 1, :], (8, 128))
                    hdx, hdy, hdz = 0.5 * dx, 0.5 * dy, 0.5 * dz
                    dd_o = dx * ox + dy * oy + dz * oz
                    oo2 = ox * ox + oy * oy + oz * oz
                    rows_pre.append((ox, oy, oz, hdx, hdy, hdz, dd_o, oo2))
                    t_ref[pl.ds(rr * 8, 8), :] = jnp.full((8, 128), T_FAR,
                                                          f32)
                    i_ref[pl.ds(rr * 8, 8), :] = jnp.full((8, 128), -1.0,
                                                          f32)
                # Sweep: per (cluster, row) whens, (t, i) carries only.
                for c in range(n_clusters):
                    for rr in range(ROWS):
                        @pl.when(cond_ref[c * ROWS + rr] > 0)
                        def _(c=c, rr=rr):
                            ox, oy, oz, hdx, hdy, hdz, dd_o, oo2 = \
                                rows_pre[rr]
                            t8 = t_ref[pl.ds(rr * 8, 8), :]
                            i8 = i_ref[pl.ds(rr * 8, 8), :]
                            for b in range(bpc):
                                k = c * bpc + b
                                blk = scn_ref[pl.ds(k * 8, 8), :]
                                tcx = blk[:, 16:17]
                                tcy = blk[:, 17:18]
                                tcz = blk[:, 18:19]
                                nb = (hdx * tcx + hdy * tcy
                                      + hdz * tcz) - dd_o
                                c_q = (oo2 + blk[:, 14:15]) - (
                                    ox * tcx + oy * tcy + oz * tcz)
                                disc = nb * nb - c_q
                                sq = jnp.sqrt(disc)
                                t1 = nb - sq
                                t2 = nb + sq
                                t = jnp.where(
                                    t1 > T_MIN, t1,
                                    jnp.where(t2 > T_MIN, t2, T_FAR))
                                better = t < t8
                                t8 = jnp.where(better, t, t8)
                                i8 = jnp.where(better, iota8 + f32(8 * k),
                                               i8)
                            t_ref[pl.ds(rr * 8, 8), :] = t8
                            i_ref[pl.ds(rr * 8, 8), :] = i8
                # Decode: same conds, one-hot attr accumulation.
                for rr in range(ROWS):
                    tmin = jnp.min(t_ref[pl.ds(rr * 8, 8), :], axis=0,
                                   keepdims=True)
                    ii = jnp.where(t_ref[pl.ds(rr * 8, 8), :] == tmin,
                                   i_ref[pl.ds(rr * 8, 8), :], f32(1e9))
                    imin = jnp.min(ii, axis=0, keepdims=True)
                    i_ref[pl.ds(rr * 8, 8), :] = jnp.broadcast_to(
                        imin, (8, 128))
                    t_ref[pl.ds(rr * 8, 8), :] = jnp.broadcast_to(
                        tmin, (8, 128))
                    for j in range(nattrs):
                        a_refs[j][pl.ds(rr * 8, 8), :] = jnp.zeros(
                            (8, 128), f32)
                for c in range(n_clusters):
                    for rr in range(ROWS):
                        @pl.when(cond_ref[c * ROWS + rr] > 0)
                        def _(c=c, rr=rr):
                            win = i_ref[pl.ds(rr * 8, 8), :]
                            accs = [a_refs[j][pl.ds(rr * 8, 8), :]
                                    for j in range(nattrs)]
                            for b in range(bpc):
                                k = c * bpc + b
                                blk = scn_ref[pl.ds(k * 8, 8), :]
                                onehot = jnp.where(
                                    win == iota8 + f32(8 * k), 1.0, 0.0)
                                for j in range(nattrs):
                                    accs[j] = accs[j] + onehot * \
                                        blk[:, 4 + j:5 + j]
                            for j in range(nattrs):
                                a_refs[j][pl.ds(rr * 8, 8), :] = accs[j]
                # Fold winner t + two attrs into the accumulator.
                outs = []
                for rr in range(ROWS):
                    v = (t_ref[pl.ds(rr * 8, 8), :][0:1, :]
                         + jnp.sum(a_refs[0][pl.ds(rr * 8, 8), :]
                                   + a_refs[nattrs - 1][pl.ds(rr * 8, 8), :],
                                   axis=0, keepdims=True))
                    outs.append(v)
                acc = acc + jnp.concatenate(outs, axis=0)
                return acc, bump

            acc, _ = jax.lax.fori_loop(
                0, REPS, rep, (jnp.zeros((ROWS, 128), jnp.float32),
                               jnp.float32(0.0)))
            out_ref[:] = acc

        pl.run_scoped(scoped,
                      *[pltpu.VMEM((ROWS * 8, 128), jnp.float32)
                        for _ in range(2 + nattrs)])

    return kernel


def make_kernel_c9(n_clusters: int = 25, cluster_size: int = 16,
                   nattrs: int = 10):
    """Worklist-driven row-gated sphere-major sweep — C8 without the
    pl.when wall (C8 measured ~243 ns per boundary, 2.25x slower than
    tile-gating despite 0.39x pairs).

    Entered (cluster, row) pairs come from per-cluster 8-bit row masks
    (SMEM input; production builds them in the cond pass for ~3 vector
    ops per 8-cluster group).  The sweep is an outer fori over clusters
    with an inner scalar while over set mask bits (ctz via
    population_count) — no vector-pipeline branches; skipped work costs
    loop-counter scalars only.  Dynamic-base block loads (W7-validated)
    and dynamic row slices of the ray planes; full attribute carries
    (no decode pass)."""
    bpc = cluster_size // 8

    def kernel(scn_ref, mask_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, out_ref):
        f32 = jnp.float32
        i32 = jnp.int32
        iota8 = jax.lax.broadcasted_iota(i32, (8, 128), 0).astype(f32)

        def scoped(pre_ref, t_ref, i_ref, *a_refs):
            def rep(i, carry):
                acc, bump = carry
                bump = bump + 1e-6
                # Stage per-row ray invariants: pre_ref rows r*8..r*8+8
                # hold [ox, oy, oz, hdx, hdy, hdz, dd_o, oo2] broadcast
                # is NOT needed -- store one (1,128) row per quantity,
                # pre_ref layout (8 quantities x 8 rows, 128).
                for rr in range(ROWS):
                    ox = ox_ref[rr:rr + 1, :]
                    oy = oy_ref[rr:rr + 1, :]
                    oz = oz_ref[rr:rr + 1, :]
                    dx = dx_ref[rr:rr + 1, :] + bump
                    dy = dy_ref[rr:rr + 1, :]
                    dz = dz_ref[rr:rr + 1, :]
                    vals = [ox, oy, oz, 0.5 * dx, 0.5 * dy, 0.5 * dz,
                            dx * ox + dy * oy + dz * oz,
                            ox * ox + oy * oy + oz * oz]
                    for q, v in enumerate(vals):
                        pre_ref[pl.ds(q * 8 + rr, 1), :] = v
                    t_ref[pl.ds(rr * 8, 8), :] = jnp.full((8, 128), T_FAR,
                                                          f32)
                    i_ref[pl.ds(rr * 8, 8), :] = jnp.full((8, 128), -1.0,
                                                          f32)
                    for j in range(nattrs):
                        a_refs[j][pl.ds(rr * 8, 8), :] = jnp.zeros(
                            (8, 128), f32)

                def do_pair(c, r):
                    q = [jnp.broadcast_to(pre_ref[pl.ds(qq * 8 + r, 1), :],
                                          (8, 128)) for qq in range(8)]
                    ox, oy, oz, hdx, hdy, hdz, dd_o, oo2 = q
                    t8 = t_ref[pl.ds(r * 8, 8), :]
                    i8 = i_ref[pl.ds(r * 8, 8), :]
                    a8 = [a_refs[j][pl.ds(r * 8, 8), :]
                          for j in range(nattrs)]
                    for b in range(bpc):
                        k = c * bpc + b
                        blk = scn_ref[pl.ds(k * 8, 8), :]
                        tcx = blk[:, 16:17]
                        tcy = blk[:, 17:18]
                        tcz = blk[:, 18:19]
                        nb = (hdx * tcx + hdy * tcy + hdz * tcz) - dd_o
                        c_q = (oo2 + blk[:, 14:15]) - (ox * tcx + oy * tcy
                                                       + oz * tcz)
                        disc = nb * nb - c_q
                        sq = jnp.sqrt(disc)
                        t1 = nb - sq
                        t2 = nb + sq
                        t = jnp.where(t1 > T_MIN, t1,
                                      jnp.where(t2 > T_MIN, t2, T_FAR))
                        better = t < t8
                        t8 = jnp.where(better, t, t8)
                        i8 = jnp.where(better,
                                       iota8 + (k * 8).astype(f32), i8)
                        a8 = [jnp.where(better, blk[:, 4 + j:5 + j], av)
                              for j, av in enumerate(a8)]
                    t_ref[pl.ds(r * 8, 8), :] = t8
                    i_ref[pl.ds(r * 8, 8), :] = i8
                    for j in range(nattrs):
                        a_refs[j][pl.ds(r * 8, 8), :] = a8[j]

                def cluster_step(c, x):
                    def row_cond(s):
                        return s[0] != 0

                    def row_body(s):
                        m, _ = s
                        low = m & (-m)
                        # ctz of a power of two in [1, 128], int-only
                        # (population_count is unsupported on scalars).
                        r = (((low & 0xAA) != 0).astype(jnp.int32)
                             + 2 * ((low & 0xCC) != 0).astype(jnp.int32)
                             + 4 * ((low & 0xF0) != 0).astype(jnp.int32))
                        do_pair(c, r)
                        return m & (m - 1), 0

                    jax.lax.while_loop(row_cond, row_body,
                                       (mask_ref[c], 0))
                    return x

                jax.lax.fori_loop(0, n_clusters, cluster_step, 0)

                # Winner extraction per row: masked sums over sublanes.
                outs = []
                for rr in range(ROWS):
                    t8 = t_ref[pl.ds(rr * 8, 8), :]
                    i8 = i_ref[pl.ds(rr * 8, 8), :]
                    tmin = jnp.min(t8, axis=0, keepdims=True)
                    ii = jnp.where(t8 == tmin, i8, f32(1e9))
                    imin = jnp.min(ii, axis=0, keepdims=True)
                    winm = i8 == jnp.broadcast_to(imin, (8, 128))
                    v = tmin
                    for j in (0, nattrs - 1):
                        v = v + jnp.sum(
                            jnp.where(winm, a_refs[j][pl.ds(rr * 8, 8), :],
                                      0.0), axis=0, keepdims=True)
                    outs.append(v)
                acc = acc + jnp.concatenate(outs, axis=0)
                return acc, bump

            acc, _ = jax.lax.fori_loop(
                0, REPS, rep, (jnp.zeros((ROWS, 128), jnp.float32),
                               jnp.float32(0.0)))
            out_ref[:] = acc

        pl.run_scoped(scoped,
                      pltpu.VMEM((64, 128), jnp.float32),
                      *[pltpu.VMEM((ROWS * 8, 128), jnp.float32)
                        for _ in range(2 + nattrs)])

    return kernel


def make_kernel_w8(entered_tile: int, n_clusters: int = 25,
                   cluster_size: int = 16):
    """Production-shaped baseline for C8: tile-gated ray-major baked
    sweep (immediates, 11 attr selects) over the same cluster count,
    entering ``entered_tile`` clusters via the same input-driven SMEM
    conds (tile granularity: one cond per cluster)."""
    bpc = cluster_size // 8

    def kernel(cond_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               out_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        f32 = jnp.float32
        shape = ox.shape
        zeros = jnp.zeros(shape, f32)

        def scoped(*refs):
            t_ref = refs[0]

            def rep(i, carry):
                acc, dxm = carry
                dxm = dxm + 1e-6
                t_ref[:] = jnp.full(shape, T_FAR, f32)
                for j in range(1, 11):
                    refs[j][:] = zeros
                for c in range(n_clusters):
                    @pl.when(cond_ref[c] > 0)
                    def _(c=c):
                        vals = [r[:] for r in refs]
                        bt = vals[0]
                        b = vals[1:]
                        for s in range(cluster_size):
                            cx, cy, cz, r, *a = SPH[
                                (c * cluster_size + s) % S]
                            t, better = quadratic(ox, oy, oz, dxm, dy, dz,
                                                  cx, cy, cz, r, bt)
                            bt = jnp.where(better, t, bt)
                            b = [jnp.where(better, av, bv)
                                 for av, bv in zip(a, b)]
                        refs[0][:] = bt
                        for j in range(1, 11):
                            refs[j][:] = b[j - 1]
                acc = acc + t_ref[:] + refs[1][:] + refs[10][:]
                return acc, dxm

            acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
            out_ref[:] = acc

        pl.run_scoped(scoped, *[pltpu.VMEM(shape, jnp.float32)
                                for _ in range(11)])

    return kernel


def run_gated(name, kernel, n_conds, entered, pairs_per_rep):
    """Timing harness for the cond-gated variants: a fixed pseudo-random
    cond pattern with ``entered`` ones, effective-pair metric."""
    rs = np.random.RandomState(7)
    cond = np.zeros(n_conds, np.int32)
    cond[rs.choice(n_conds, entered, replace=False)] = 1
    if "C9" in name:
        # Same entered pattern, packed as per-cluster 8-bit row masks.
        masks = np.zeros(n_conds // 8, np.int32)
        for ci in range(n_conds):
            if cond[ci]:
                masks[ci // 8] |= 1 << (ci % 8)
        ins = [jnp.asarray(PACKED_SM), jnp.asarray(masks)]
    elif "C8" in name:
        ins = [jnp.asarray(PACKED_SM), jnp.asarray(cond)]
    else:
        ins = [jnp.asarray(cond)]
    ins += [jnp.asarray(x) for x in (ox0, oy0, oz0, dx0, dy0, dz0)]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    specs = ([full, smem] if ("C8" in name or "C9" in name)
             else [smem]) + [full] * 6
    fn = jax.jit(functools.partial(
        pl.pallas_call, kernel,
        in_specs=specs, out_specs=full,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32))())
    t0 = time.time()
    out = np.asarray(fn(*ins))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = np.asarray(fn(*ins))
        times.append(time.time() - t0)
    dt = min(times)
    print(f"{name}: {dt / REPS * 1e9:.0f} ns/iter "
          f"({pairs_per_rep * REPS / dt / 1e9:.1f} Gpairs/s eff, "
          f"compile {compile_s:.0f}s, checksum {out.sum():.3e})",
          flush=True)


def make_kernel_a2(decode: bool):
    """Baked sphere-major: block columns as trace-time (8,1) constants
    (hoisted to the constant pool — the baked twin of C6)."""
    nblk = S // 8
    tab = PACKED_SM

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, out_ref):
        # Pallas rejects captured vector constants; build each (8,1)
        # block column from float immediates via iota selects (loop-
        # invariant — hoisted out of the rep loop by the compiler).
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

        def rep(i, carry):
            acc, bump = carry
            bump = bump + 1e-6
            acc = acc + _sm_sweep_rows(get_block, nblk, ox_ref, oy_ref,
                                       oz_ref, dx_ref, dy_ref, dz_ref,
                                       bump, decode)
            return acc, bump

        acc, _ = jax.lax.fori_loop(
            0, REPS, rep, (jnp.zeros((ROWS, 128), jnp.float32),
                           jnp.float32(0.0)))
        out_ref[:] = acc

    return kernel


def make_kernel_c45(unroll: bool, nattrs: int):
    """C2 family with (a) the block loop optionally Python-unrolled
    (static trip count — isolates fori_loop overhead: no cross-block
    software pipelining inside lax loops) and (b) a configurable
    winner-attribute carry width (prod dynculled carries 10+)."""

    def kernel(scn_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               out_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        f32 = jnp.float32
        shape = ox.shape
        zeros = jnp.zeros(shape, f32)
        nblk = S // 8

        def rep(i, carry):
            acc, dxm = carry
            dxm = dxm + 1e-6

            def blk_step(k, c):
                best_t = c[0]
                attrs_c = list(c[1:])
                blk = scn_ref[pl.ds(k * 8, 8), :]
                for j in range(8):
                    cx, cy, cz, r = (blk[j, 0], blk[j, 1], blk[j, 2],
                                     blk[j, 3])
                    t, better = quadratic(ox, oy, oz, dxm, dy, dz,
                                          cx, cy, cz, r, best_t)
                    best_t = jnp.where(better, t, best_t)
                    attrs_c = [jnp.where(better, blk[j, 4 + ai], av)
                               for ai, av in enumerate(attrs_c)]
                return (best_t, *attrs_c)

            init = (jnp.full(shape, T_FAR, f32),) + (zeros,) * nattrs
            if unroll:
                c = init
                for k in range(nblk):
                    c = blk_step(k, c)
            else:
                c = jax.lax.fori_loop(0, nblk, blk_step, init)
            acc = acc + c[0] + c[1] + c[-1]
            return acc, dxm

        acc, _ = jax.lax.fori_loop(0, REPS, rep, (zeros, dx))
        out_ref[:] = acc

    return kernel


if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B", "C", "C2", "C3", "D"]
    print(f"backend={jax.default_backend()} S={S} REPS={REPS}", flush=True)
    if "A" in which:
        run_pairs("A  baked+11sel   ", kernel_a, False)
    if "B" in which:
        run_pairs("B  baked+idx+1hot", kernel_b, False)
    if "C" in which:
        run_pairs("C  sph-major dyn ", kernel_c, True)
    if "C2" in which:
        run_pairs("C2 ray-major dyn ", kernel_c2, True)
    if "C3" in which:
        run_pairs("C3 raydyn idx1hot", kernel_c3, True)
    if "Q" in which:
        run_pairs("Q  baked t-only  ", kernel_q, False)
    if "Q2" in which:
        run_pairs("Q2 baked no-sqrt ", kernel_q2, False)
    if "Q4" in which:
        run_pairs("Q4 4-chain ILP   ", make_kernel_qn(4), False)
    if "Q8" in which:
        run_pairs("Q8 8-chain ILP   ", make_kernel_qn(8), False)
    if "W" in which:
        run_pairs("W  25x16 when    ", make_kernel_when(25, 16, True), False)
        run_pairs("W0 25x16 no-when ", make_kernel_when(25, 16, False), False)
        run_pairs("W2 25x16 all-cull", make_kernel_when(25, 0, True), False)
    if "W5" in which:
        run_pairs("W5 25x16 pre-any ", make_kernel_when2(25, 16, "pre"), False)
    if "W6" in which:
        run_pairs("W6 25x16 or-pack ", make_kernel_when2(25, 16, "pack"), False)
    if "W7" in which:
        run_pairs("W7 dyncull smem  ", make_kernel_w7(25, 16), True)
    if "C4" in which:
        run_pairs("C4 dyn unroll 2at", make_kernel_c45(True, 2), True)
    if "C5" in which:
        run_pairs("C5 dyn fori 10at ", make_kernel_c45(False, 10), True)
    if "C45" in which:
        run_pairs("C45 dyn unrl 10at", make_kernel_c45(True, 10), True)
    if "C6" in which:
        run_pairs("C6 sphmaj dyn t/i", make_kernel_c6(False), "sm")
        run_pairs("C6d sphmaj dyn+de", make_kernel_c6(True), "sm")
    if "C8" in which:
        # Entry counts from exp/granularity_sim.py --persistent:
        # tile-gated enters ~12/25 clusters; row granularity needs
        # 0.39x the pairs -> ~37 of 200 (cluster, row) pairs.
        run_gated("W8 tile-gated RM ", make_kernel_w8(12), 25, 12,
                  12 * 16 * 1024)
        run_gated("C8 row-gated SM  ", make_kernel_c8(37), 200, 37,
                  37 * 16 * 128)
    if "C9" in which:
        run_gated("C9 worklist SM   ", make_kernel_c9(), 200, 37,
                  37 * 16 * 128)
    if "C7" in which:
        run_pairs("C7 sphmaj 10sel  ", make_kernel_c7(10), "sm")
    if "A2" in which:
        run_pairs("A2 sphmaj baked  ", make_kernel_a2(False), False)
        run_pairs("A2d sphmaj bak+de", make_kernel_a2(True), False)
    if "D" in which:
        matmul_bench()
