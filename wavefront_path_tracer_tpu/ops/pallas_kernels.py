"""Fused Pallas TPU megakernel: the whole path-tracing loop per ray tile.

This is the speed-of-light path (the reference's K1-K5 fused into one
kernel).  Design, driven by measured device characteristics (HBM
streaming ~2 orders below VPU throughput):

* The whole SoA scene lives in VMEM (``_intersect_tile``) or is unrolled
  as vector immediates (``baked_intersect`` — dynamic scalar loads
  measured ~10x the vector math); the sphere loop keeps a
  (rows, 128)-ray tile fully vectorized on the VPU — the transpose of
  the reference's thread-per-ray SIMT layout.
* The nearest-hit "argmin" carries the winning primitive's attributes
  through running ``where`` selects, so no gather ever touches HBM and
  no hit-payload queue exists at all — extend's output feeds shade in
  registers.
* Ray generation, shading (all three RTIOW BSDFs, branchless), and the
  integer-exact PCG RNG (ops/rng.py formulas) run inline on the tile.
* Lanes are *persistent* (``_persistent_impl``): a terminated path's
  lane immediately regenerates its pixel's next sample, so utilization
  stays ~100% with no atomics, no compaction, and no host syncs.  On
  hardware where a 128k-lane sort costs ~2 ms, that beats sort-based
  queue compaction outright.
* Hierarchical consensus culling (``baked_culled_intersect``) skips
  whole Morton clusters under ``pl.when`` when no live lane can improve
  its nearest hit inside the cluster's box (slab-exit-capped).

Rays per tile: ROWS x 128 (ROWS=8 default).  All per-ray fields are
separate (ROWS, 128) f32/u32 planes (pure SoA).
"""

from __future__ import annotations

import functools
import inspect

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_MIN = 0.001
T_FAR = 1e30

# PCG-RXS-M-XS constants (see ops/rng.py; bit-identical streams).
_PCG_MULT = 747796405
_PCG_INC = 2891336453
_RXS_M = 277803737
_U32_TO_F32 = 2.3283064365387e-10
_PI = 3.1415927
_SAMPLE_STRIDE = 0x9E3779B9
_BOUNCE_STRIDE = 0x85EBCA6B
_RR_SALT = 0x52455252  # ops/rng.py:rr_state — independent roulette stream


# Perf-probe flags (exp/iterprobe.py): trace-time duplication of one
# pipeline component to measure its share of the iteration cost.
# Always empty in production; duplicated components are idempotent so
# images are unchanged.
PROBE: frozenset = frozenset()

# Dynamic culled sweep: unroll the cluster loop statically up to this
# many clusters (see make_dynamic_culled_intersect); above it the
# compact fori_loop keeps compile time O(#clusters).
_DYN_UNROLL_CLUSTERS = 64

# Dynamic culled sweep above the unroll gate: clusters per supercluster
# (= per rolled batch).  One super's child clusters are swept inside a
# single pl.when gated on the super's AABB cond, so the whole batch —
# child cond pass included — is skipped when no live lane can enter it.
# Shared between pack_culled_scene (which sizes the super AABB table)
# and make_dynamic_culled_intersect (which sizes the rolled loop).
_DYN_SUPER = 16


def _u32(x):
    return jnp.uint32(x)


def _jenkins(x):
    x = x + (x << 10)
    x = x ^ (x >> 6)
    x = x + (x << 3)
    x = x ^ (x >> 11)
    x = x + (x << 15)
    return x


def _pcg_next(state):
    state = state * _u32(_PCG_MULT) + _u32(_PCG_INC)
    word = ((state >> ((state >> 28) + _u32(4))) ^ state) * _u32(_RXS_M)
    return state, (word >> 22) ^ word


def _next_f32(state):
    state, w = _pcg_next(state)
    # Mosaic has no uint32->f32 cast; split into two int32-safe parts.
    # f32(hi)*256 + f32(lo) rounds identically to f32(w) (hi < 2^24 and
    # 256*hi is exact, so the one rounding happens at the final add).
    hi = pltpu.bitcast(w >> 8, jnp.int32).astype(jnp.float32)
    lo = pltpu.bitcast(w & _u32(0xFF), jnp.int32).astype(jnp.float32)
    return state, (hi * 256.0 + lo) * jnp.float32(_U32_TO_F32)


def _intersect_tile(scn_ref, n_spheres, ox, oy, oz, dx, dy, dz):
    """Nearest hit for a ray tile against the VMEM scene.

    Block-vectorized dynamic loads: one (8, 16) VMEM vector load per 8
    spheres, then *static* scalar extracts from the loaded block
    (measured ~2x slower than baked constants — vs ~10x for the
    per-sphere dynamic scalar row loads this replaces).  Table padding
    rows are NaN (``pack_scene``), which can never win the nearest-hit
    select (NaN compares false), so the block loop needs no tail
    masking.  Returns (best_t, cx, cy, cz, 1/r, albedo rgb, fuzz, ior,
    mat_type) as tile-shaped arrays.
    """
    f32 = jnp.float32
    shape = ox.shape
    a_q = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a_q  # hoisted out of the sphere loop

    def block_step(k, carry):
        blk = scn_ref[pl.ds(k * 8, 8), :]   # one vector load, 8 spheres
        for j in range(8):
            (best_t, b_cx, b_cy, b_cz, b_inv_r, b_ar, b_ag, b_ab,
             b_fuzz, b_ior, b_mt) = carry
            cx, cy, cz, r = blk[j, 0], blk[j, 1], blk[j, 2], blk[j, 3]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b_q = dx * ocx + dy * ocy + dz * ocz
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b_q * b_q - a_q * c_q
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b_q - sq) * inv_a
            t2 = (-b_q + sq) * inv_a
            t = jnp.where(t1 > T_MIN, t1, jnp.where(t2 > T_MIN, t2, T_FAR))
            t = jnp.where(disc >= 0.0, t, T_FAR)
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            b_cx = jnp.where(better, cx, b_cx)
            b_cy = jnp.where(better, cy, b_cy)
            b_cz = jnp.where(better, cz, b_cz)
            b_inv_r = jnp.where(better, 1.0 / r, b_inv_r)
            b_ar = jnp.where(better, blk[j, 4], b_ar)
            b_ag = jnp.where(better, blk[j, 5], b_ag)
            b_ab = jnp.where(better, blk[j, 6], b_ab)
            b_fuzz = jnp.where(better, blk[j, 7], b_fuzz)
            b_ior = jnp.where(better, blk[j, 8], b_ior)
            b_mt = jnp.where(better, blk[j, 9], b_mt)
            carry = (best_t, b_cx, b_cy, b_cz, b_inv_r, b_ar, b_ag, b_ab,
                     b_fuzz, b_ior, b_mt)
        return carry

    init = (
        jnp.full(shape, T_FAR, f32),
        jnp.zeros(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        jnp.ones(shape, f32),
        jnp.zeros(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        jnp.zeros(shape, f32), jnp.ones(shape, f32), jnp.zeros(shape, f32),
    )
    n_blocks = (n_spheres + 7) // 8
    return jax.lax.fori_loop(0, n_blocks, block_step, init)


def _shade_tile(pix, frame, sample, bounce,
                ox, oy, oz, dx, dy, dz,
                best_t, b_cx, b_cy, b_cz, b_inv_r, b_fuzz, b_ior, b_mt,
                b_nx=None, b_ny=None, b_nz=None, b_is_tri=None):
    """Branchless RTIOW shading for a tile (the reference's K3+K4 math).

    Returns (p_x, p_y, p_z, ndx, ndy, ndz): hit point and unit
    scattered direction.  RNG draws are the shared per-event streams.
    Triangle winners (b_is_tri) use their constant geometric normal,
    flipped toward the ray for non-dielectrics (ops/hit.py convention).
    """
    base = _jenkins(pix ^ _jenkins(jnp.broadcast_to(frame, pix.shape)))
    state = _jenkins(base + sample * _u32(_SAMPLE_STRIDE)
                     + (bounce + _u32(1)) * _u32(_BOUNCE_STRIDE))
    state, _ = _pcg_next(state)   # ball-radius draw: consumed, unused —
    # every engine normalizes the sphere sample (ops/bsdf.py _draws), so
    # the cbrt radius cancels; only the stream position must advance.
    state, u2 = _next_f32(state)
    state, u3 = _next_f32(state)
    state, r_reflect = _next_f32(state)
    # Scatter draws are never stratified (ops/bsdf.py:_draws — a shared
    # per-sample stratum index across bounce dims biases the joint
    # measure); only the AA jitter in _raygen_tile is.

    # (cos phi, sin phi, cos theta) spherical coords: unit by
    # construction — no renormalization needed.
    cos_th = 1.0 - 2.0 * u2
    sin_th = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_th * cos_th))
    phi = jnp.float32(2.0 * _PI) * u3
    sx = sin_th * jnp.cos(phi)
    sy = sin_th * jnp.sin(phi)
    sz = cos_th

    p_x = ox + best_t * dx
    p_y = oy + best_t * dy
    p_z = oz + best_t * dz
    nx = (p_x - b_cx) * b_inv_r
    ny = (p_y - b_cy) * b_inv_r
    nz = (p_z - b_cz) * b_inv_r
    n_norm = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-37))
    nx, ny, nz = nx * n_norm, ny * n_norm, nz * n_norm

    if b_is_tri is not None:
        is_tri = b_is_tri > 0
        d_dot_tn = dx * b_nx + dy * b_ny + dz * b_nz
        flip = (d_dot_tn > 0.0) & (b_mt != 2.0)  # dielectrics self-flip
        tnx = jnp.where(flip, -b_nx, b_nx)
        tny = jnp.where(flip, -b_ny, b_ny)
        tnz = jnp.where(flip, -b_nz, b_nz)
        nx = jnp.where(is_tri, tnx, nx)
        ny = jnp.where(is_tri, tny, ny)
        nz = jnp.where(is_tri, tnz, nz)

    lx, ly, lz = nx + sx, ny + sy, nz + sz
    l_len2 = lx * lx + ly * ly + lz * lz
    degen = l_len2 < 1e-6
    lx = jnp.where(degen, nx, lx)
    ly = jnp.where(degen, ny, ly)
    lz = jnp.where(degen, nz, lz)

    d_dot_n = dx * nx + dy * ny + dz * nz
    rfx = dx - 2.0 * d_dot_n * nx
    rfy = dy - 2.0 * d_dot_n * ny
    rfz = dz - 2.0 * d_dot_n * nz
    mx = rfx + b_fuzz * sx
    my = rfy + b_fuzz * sy
    mz = rfz + b_fuzz * sz

    cos_theta = jnp.minimum(-(d_dot_n), 1.0)
    outside = cos_theta >= 0.0
    eta = jnp.where(outside, 1.0 / b_ior, b_ior)
    fnx = jnp.where(outside, nx, -nx)
    fny = jnp.where(outside, ny, -ny)
    fnz = jnp.where(outside, nz, -nz)
    cos_theta = jnp.abs(cos_theta)
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    one_m = 1.0 - cos_theta
    om2 = one_m * one_m
    reflectance = r0 + (1.0 - r0) * om2 * om2 * one_m
    cos_in = dx * fnx + dy * fny + dz * fnz
    kk = 1.0 - eta * eta * (1.0 - cos_in * cos_in)
    can_refract = kk >= 0.0
    coef = eta * cos_in + jnp.sqrt(jnp.maximum(kk, 0.0))
    refx = eta * dx - coef * fnx
    refy = eta * dy - coef * fny
    refz = eta * dz - coef * fnz
    rlx = dx - 2.0 * cos_in * fnx
    rly = dy - 2.0 * cos_in * fny
    rlz = dz - 2.0 * cos_in * fnz
    take_refract = can_refract & (reflectance <= r_reflect)
    gx = jnp.where(take_refract, refx, rlx)
    gy = jnp.where(take_refract, refy, rly)
    gz = jnp.where(take_refract, refz, rlz)

    is_metal = b_mt == 1.0
    is_glass = b_mt == 2.0
    ndx = jnp.where(is_glass, gx, jnp.where(is_metal, mx, lx))
    ndy = jnp.where(is_glass, gy, jnp.where(is_metal, my, ly))
    ndz = jnp.where(is_glass, gz, jnp.where(is_metal, mz, lz))
    inv_len = jax.lax.rsqrt(jnp.maximum(ndx * ndx + ndy * ndy + ndz * ndz, 1e-24))
    return p_x, p_y, p_z, ndx * inv_len, ndy * inv_len, ndz * inv_len


_HALF_PI = 1.5707963


def _acos_approx(x):
    """Branchless acos on [-1, 1] (A&S 4.4.45, |err| < 7e-5) — Mosaic
    has no acos primitive; texture lookups only need bin precision."""
    a = jnp.abs(x)
    base = jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) * (
        1.5707288 + a * (-0.2121144 + a * (0.0742610 - 0.0187293 * a)))
    return jnp.where(x < 0.0, jnp.float32(_PI) - base, base)


def _atan2_approx(y, x):
    """Branchless atan2 (A&S 4.4.49 core, |err| ~ 1e-5) — Mosaic has no
    atan2 primitive."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    z = jnp.minimum(ax, ay) / jnp.maximum(mx, 1e-30)
    z2 = z * z
    at = z * (0.9998660 + z2 * (-0.3302995 + z2 * (
        0.1801410 + z2 * (-0.0851330 + 0.0208351 * z2))))
    at = jnp.where(ay > ax, jnp.float32(_HALF_PI) - at, at)
    at = jnp.where(x < 0.0, jnp.float32(_PI) - at, at)
    return jnp.where(y < 0.0, -at, at)


def _apply_image_textures(img_texs, hit, b_cx, b_cy, b_cz, b_ir, b_it,
                          p_x, p_y, p_z, ar, ag, ab):
    """Baked image-texture albedo for winner lanes of image spheres.

    The fused kernel cannot gather texels per lane (pathological on
    this device), so each image-textured sphere's texture is baked as a
    bounded LUT (tex_lut_max texels) evaluated by ONE binary select
    tree over the texel index bits, RGB packed 10:10:10 per int32 leaf
    (a third the per-texel cost of three float trees; quantization
    <= 1/1023 per channel) — and the whole evaluation is gated on a
    per-tile ``pl.when(any(match))``, so tiles that never see the
    sphere pay one batched reduce only.  The winner is identified by its baked center
    (exact float equality with the carried winner fields).  UV is the
    RTIOW equirect parametrization (ops/texture.py:sphere_uv) with
    polynomial acos/atan2.
    """
    def scoped(r_ref, g_ref, b_ref):
        r_ref[:] = ar
        g_ref[:] = ag
        b_ref[:] = ab
        for cx, cy, cz, inv_r, lut in img_texs:
            # Winner identity = center AND radius (concentric hollow
            # pairs share centers), and never a triangle win (triangle
            # selects leave the sphere center fields stale).
            match = (hit & (b_cx == cx) & (b_cy == cy) & (b_cz == cz)
                     & (b_ir == inv_r))
            if b_it is not None:
                match = match & (b_it <= 0.0)

            @pl.when(jnp.any(match))
            def _(cx=cx, cy=cy, cz=cz, inv_r=inv_r, lut=lut, match=match):
                nx = (p_x - cx) * inv_r
                ny = (p_y - cy) * inv_r
                nz = (p_z - cz) * inv_r
                u = (_atan2_approx(-nz, nx) + jnp.float32(_PI)) \
                    * jnp.float32(1.0 / (2.0 * _PI))
                v = _acos_approx(jnp.clip(-ny, -1.0, 1.0)) \
                    * jnp.float32(1.0 / _PI)
                h, w = lut.shape[0], lut.shape[1]
                yi = jnp.clip(((1.0 - v) * h).astype(jnp.int32), 0, h - 1)
                xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
                idx = yi * w + xi
                nbits = max(1, (h * w - 1).bit_length())
                bits = [((idx >> k) & 1) == 1 for k in range(nbits)]
                # One select tree over RGB packed 10:10:10 into int32
                # immediates (quantization <= 1/1023 per channel on the
                # [0,1]-clipped albedo) instead of three float trees —
                # 3x the texel budget per vector op.
                q = np.clip(np.asarray(lut[..., :3], np.float64),
                            0.0, 1.0)
                q = np.round(q * 1023.0).astype(np.int64)
                packed = (q[..., 0] << 20) | (q[..., 1] << 10) | q[..., 2]
                vals = [int(t) for t in packed.ravel()]
                vals += [0] * ((1 << nbits) - len(vals))
                lvl = 0
                while len(vals) > 1:
                    vals = [jnp.where(bits[lvl], vals[2 * i + 1],
                                      vals[2 * i])
                            for i in range(len(vals) // 2)]
                    lvl += 1
                word = vals[0]
                inv = jnp.float32(1.0 / 1023.0)
                tex_r = ((word >> 20) & 1023).astype(jnp.float32) * inv
                tex_g = ((word >> 10) & 1023).astype(jnp.float32) * inv
                tex_b = (word & 1023).astype(jnp.float32) * inv
                r_ref[:] = jnp.where(match, tex_r, r_ref[:])
                g_ref[:] = jnp.where(match, tex_g, g_ref[:])
                b_ref[:] = jnp.where(match, tex_b, b_ref[:])
        return r_ref[:], g_ref[:], b_ref[:]

    return pl.run_scoped(
        scoped, pltpu.VMEM(hit.shape, jnp.float32),
        pltpu.VMEM(hit.shape, jnp.float32),
        pltpu.VMEM(hit.shape, jnp.float32))


# Default winner-attribute pack width (see _pack_albedo_mat):
# "16" = exact-to-7.6e-6 two-int pack, "10" = one-int 10:10:10 pack
# (3 selects saved instead of 2, but its <=1/2046-per-channel albedo
# quantization is visible against the 1e-3 golden gate), False = keep
# the four float selects.  Measured A/B in BENCHMARKS.md round 4.
PACK_ATTRS_DEFAULT = "16"


def _signed32(word):
    return word - (1 << 32) if word >= (1 << 31) else word


def _pack_albedo_mat(ar, ag, ab, mt, width):
    """Bake-time pack of the winner's (albedo rgb, material id) into
    int32 words.

    The winner-select chain is ~14% of the headline iteration cost
    (exp/iterprobe.py) and every op on the issue-bound VPU is wall
    time, so the four per-primitive attribute selects (albedo rgb +
    material id) collapse into one ("10") or two ("16") int32 selects,
    decoded once per iteration after the sweep — the texture-LUT leaf
    trick (_apply_image_textures) applied to the winner carry itself.
    It also drops 3 (or 2) VMEM carry refs, thinning every cluster
    entry's load/store restage.  "10": r:g:b on a 1/1023 grid + 2-bit
    mat in one word (error <= 1/2046 = 4.9e-4 per channel).  "16":
    (r:16|g:16) and (b:16|mat) on a 1/65535 grid (error <= 7.6e-6 —
    below f32 render noise, no observable change).  Material ids are
    exact in both.  Packing auto-disables when any albedo leaves
    [0, 1] (_pack_albedo_ok)."""
    if width == "10":
        q = [int(round(min(max(float(v), 0.0), 1.0) * 1023.0))
             for v in (ar, ag, ab)]
        return (_signed32((q[0] << 20) | (q[1] << 10) | q[2]
                          | (int(mt) << 30)),)
    q = [int(round(min(max(float(v), 0.0), 1.0) * 65535.0))
         for v in (ar, ag, ab)]
    return (_signed32((q[0] << 16) | q[1]),
            _signed32((q[2] << 16) | int(mt)))


def _unpack_albedo_mat(pks, width):
    """In-kernel decode of _pack_albedo_mat (int32 (8,128) plane(s) ->
    four float planes; ~13 vector ops once per iteration)."""
    if width == "10":
        (pk,) = pks
        inv = jnp.float32(1.0 / 1023.0)
        ar = ((pk >> 20) & 1023).astype(jnp.float32) * inv
        ag = ((pk >> 10) & 1023).astype(jnp.float32) * inv
        ab = (pk & 1023).astype(jnp.float32) * inv
        mt = ((pk >> 30) & 3).astype(jnp.float32)
        return ar, ag, ab, mt
    pk1, pk2 = pks
    inv = jnp.float32(1.0 / 65535.0)
    ar = ((pk1 >> 16) & 65535).astype(jnp.float32) * inv
    ag = (pk1 & 65535).astype(jnp.float32) * inv
    ab = ((pk2 >> 16) & 65535).astype(jnp.float32) * inv
    mt = (pk2 & 3).astype(jnp.float32)
    return ar, ag, ab, mt


def _resolve_pack(pack_attrs, albedo, triangles=None):
    """(width | None, n_packed_words) for a builder's pack_attrs arg."""
    if pack_attrs is True:
        pack_attrs = PACK_ATTRS_DEFAULT
    if not pack_attrs or not _pack_albedo_ok(albedo, triangles):
        return None, 0
    if pack_attrs not in ("10", "16"):
        raise ValueError(f"pack_attrs must be '10', '16' or falsy, "
                         f"got {pack_attrs!r}")
    return pack_attrs, 1 if pack_attrs == "10" else 2


def _pack_albedo_ok(albedo, triangles=None):
    """Packing precondition: every albedo on the [0,1] quantization
    grid's domain (scene files may carry emissive-style >1 albedos —
    those scenes silently keep the exact float chain)."""
    import numpy as np

    a = np.asarray(albedo, np.float64)
    ok = bool((a >= 0.0).all() and (a <= 1.0).all())
    if ok and triangles is not None and getattr(triangles,
                                                "num_triangles", 0):
        ta = np.asarray(triangles.albedo, np.float64)
        ok = bool((ta >= 0.0).all() and (ta <= 1.0).all())
    return ok


def _raygen_tile(xs, ys, pix, frame, sample, cam_ref,
                 sampler: str = "random"):
    """In-kernel primary-ray generation (the reference's K1,
    generate_rays.wgsl:42-91), elementwise over a tile.

    ``sample`` may vary per lane — this is what enables persistent
    lanes: a dead lane regenerates its own next sample without any
    cross-lane gather.  Math mirrors ops/raygen.py; only float ULPs may
    differ from the XLA version.

    cam_ref layout (1, 24) f32: [0:9] view rotation row-major, [9:12]
    camera position, [12] w_scale, [13] h_scale, [14] z_far,
    [15] defocus_radius, [16] focus_distance, [17] width, [18] height.
    """
    state = _jenkins(pix ^ _jenkins(jnp.broadcast_to(frame, pix.shape)))
    state = _jenkins(state + sample * _u32(_SAMPLE_STRIDE))  # bounce slot 0
    state, u1 = _next_f32(state)
    state, u2 = _next_f32(state)
    state, u3 = _next_f32(state)
    state, u4 = _next_f32(state)
    if sampler == "stratified":
        # 4x4 stratum remap of the AA-disk uniforms (ops/raygen.py):
        # same draw count/positions, so lens draws are untouched.
        f32c = jnp.float32
        # uint32->f32 casts don't lower in Mosaic; bitcast via int32.
        sx = pltpu.bitcast(sample & _u32(3), jnp.int32).astype(f32c)
        sy = pltpu.bitcast((sample >> _u32(2)) & _u32(3),
                           jnp.int32).astype(f32c)
        u1 = (sx + u1) * f32c(0.25)
        u2 = (sy + u2) * f32c(0.25)

    r_aa = jnp.sqrt(u1)
    a_aa = jnp.float32(2.0 * _PI) * u2
    ox_j = r_aa * jnp.cos(a_aa)
    oy_j = r_aa * jnp.sin(a_aa)

    width = cam_ref[0, 17]
    height = cam_ref[0, 18]
    ndc_x = 2.0 * ((xs + ox_j) / width) - 1.0
    ndc_y = 2.0 * (1.0 - (ys + oy_j) / height) - 1.0

    zf = cam_ref[0, 14]
    ppx = cam_ref[0, 12] * ndc_x * zf
    ppy = cam_ref[0, 13] * ndc_y * zf
    ppz = jnp.full_like(ppx, zf)

    # Thin lens (generate_rays.wgsl:73-82), branchless: radius 0 makes
    # the lens jitter vanish and tf rescales pp (direction-invariant).
    dr = cam_ref[0, 15]
    r_l = jnp.sqrt(u3)
    a_l = jnp.float32(2.0 * _PI) * u4
    plx = dr * (r_l * jnp.cos(a_l))
    ply = dr * (r_l * jnp.sin(a_l))
    tf = cam_ref[0, 16] / ppz
    ppx = tf * ppx - plx
    ppy = tf * ppy - ply
    ppz = tf * ppz

    r00, r01, r02 = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    r10, r11, r12 = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
    r20, r21, r22 = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
    ox = r00 * plx + r01 * ply + cam_ref[0, 9]
    oy = r10 * plx + r11 * ply + cam_ref[0, 10]
    oz = r20 * plx + r21 * ply + cam_ref[0, 11]
    dx = r00 * ppx + r01 * ppy + r02 * ppz
    dy = r10 * ppx + r11 * ppy + r12 * ppz
    dz = r20 * ppx + r21 * ppy + r22 * ppz
    inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-37))
    return ox, oy, oz, dx * inv, dy * inv, dz * inv


def _t2_elidable(centers, radii, mat_type, fuzz, triangles=None):
    """Per-sphere bake-time flag: the far-root (t2) select can be elided.

    The reference always evaluates both quadratic roots
    (extend.wgsl:185-210) because a ray may start inside a sphere.  But
    scatter origins lie ON primitive surfaces, so a tested ray can only
    need t2 (origin strictly inside the tested sphere, by more than the
    depth whose chord clears T_MIN) when either

    * the sphere is dielectric — refracted rays legitimately travel
      inside it,
    * the sphere is a FUZZY metal — ``reflect + fuzz*unit_sphere`` can
      dip below the surface, re-entering the sphere itself (the
      reference does not absorb below-horizon scatter, it finds the
      far-root self-hit; Lambertian ``n + unit_vector`` and fuzz=0
      reflection cannot go below the surface), or
    * some OTHER primitive's surface penetrates its interior (a scatter
      origin on that surface then sits inside).

    Externally tangent contacts — RTIOW's spheres resting on the ground
    — have penetration exactly 0 and stay elidable: the far root is a
    3-op/sphere saving on the issue-rate-bound sweep.  The tolerance
    accepts penetrations below max(chord bound T_MIN^2/8r, a few f32
    ulps of the pair geometry) as modeling noise.  Camera/lens origins
    inside an *opaque* sphere are out of contract (the scene API places
    cameras in free space).

    Known, accepted divergence: the generic select also takes t2 when
    the origin is *outside* but the near root lands in (0, T_MIN] — a
    ray fired from within T_MIN of the sphere's surface (the ~sqrt(2 r
    T_MIN) tangency ring around a resting contact).  There the
    reference tunnels to a far-side interior hit (its T_MIN acne guard
    acting on a real hit); the elided kernel lets the ray pass.
    Neither matches exact geometry; the affected scatter population is
    measure ~1e-5 and the full-spec golden gate is indifferent (4.1e-4
    pre-elision, 3.9e-4 post — within the sampling band).  So: elision is exact for the proven
    origin-inside cases, and statistically invisible — but not
    bit-exact — for the near-graze ring.
    """
    import numpy as np

    c = np.asarray(centers, np.float64)
    r = np.abs(np.asarray(radii, np.float64))
    mt = np.asarray(mat_type, np.float64)
    fz = np.asarray(fuzz, np.float64)
    n = c.shape[0]
    # Negative radius is the inside-out modeling trick (normals flip;
    # RTIOW's hollow bubble): such spheres are legitimately hit from
    # inside, so they keep the far root regardless of material.
    safe = ((mt != 2.0) & ~((mt == 1.0) & (fz > 0.0))
            & (np.asarray(radii, np.float64) > 0.0))
    eps8 = 8.0 * 1.1920929e-07
    for s in range(0, n, 256):
        e = min(n, s + 256)
        d = np.sqrt(((c[s:e, None, :] - c[None, :, :]) ** 2).sum(-1))
        pen = r[s:e, None] - np.abs(d - r[None, :])
        tol = np.maximum(T_MIN * T_MIN / (8.0 * np.maximum(r[s:e, None],
                                                           1e-30)),
                         eps8 * (d + r[None, :] + r[s:e, None]))
        safe[s:e] &= ~(pen > tol).any(axis=1)
    if triangles is not None and getattr(triangles, "num_triangles", 0):
        v0 = np.asarray(triangles.v0, np.float64)
        v1 = v0 + np.asarray(triangles.e1, np.float64)
        v2 = v0 + np.asarray(triangles.e2, np.float64)
        lo = np.minimum(np.minimum(v0, v1), v2)
        hi = np.maximum(np.maximum(v0, v1), v2)
        for s in range(0, n, 256):
            e = min(n, s + 256)
            near = np.clip(c[s:e, None, :], lo[None], hi[None])
            d = np.sqrt(((near - c[s:e, None, :]) ** 2).sum(-1))
            tol = np.maximum(T_MIN * T_MIN / (8.0 * np.maximum(r[s:e, None],
                                                               1e-30)),
                             eps8 * (d + r[s:e, None]))
            # Conservative: an AABB within reach of the interior
            # disables elision (tangent-resting on a mesh floor loses
            # the optimization rather than risk it).
            safe[s:e] &= ~(d < r[s:e, None] - tol).any(axis=1)
    return safe


def baked_intersect(centers, radii, albedo, fuzz, refract_idx, mat_type,
                    triangles=None, tex=None, full_inv_r=False,
                    pack_attrs=True):
    """Build an intersect function with the scene baked as immediates.

    Dynamic per-sphere scalar VMEM loads dominate the sphere loop's
    runtime (~10 loads/iteration, each tens of cycles and serializing).
    Scenes are constant across a whole render, so instead we unroll the
    loop at trace time with every sphere's data as compile-time
    constants — zero loads, pure vector ALU.  The (per-scene) compile is
    amortized by the persistent compilation cache.

    ``triangles`` (optional TriangleSoA numpy tables) are unrolled the
    same way (two-sided Moller-Trumbore with constant edges + normals).

    Takes *numpy* scene arrays; returns f(ox..dz) -> the _intersect_tile
    tuple extended with (b_nx, b_ny, b_nz, b_is_tri): triangle winners
    carry their constant geometric normal; sphere winners compute theirs
    from the center fields.
    """
    import numpy as np

    n = centers.shape[0]
    textured = tex is not None
    if textured:
        a2, ts = np.asarray(tex[0], np.float32), np.asarray(tex[1], np.float32)
    else:
        a2 = np.zeros((n, 3), np.float32)
        ts = np.zeros((n,), np.float32)
    # The winner's inv_r matters only through its SIGN: shade rsqrt-
    # normalizes the normal anyway (_shade_tile:207), so all-positive
    # scenes drop the select entirely and scenes with negative-radius
    # (inside-out) spheres carry a per-sphere +-1 flip.  Image-textured
    # scenes keep the true 1/r — it is part of the LUT winner-identity
    # key (_apply_image_textures:324) — via ``full_inv_r``.
    any_neg = bool((np.asarray(radii) < 0).any())
    pack_w, n_pk = _resolve_pack(pack_attrs, albedo, triangles)
    packed = pack_w is not None
    elide = _t2_elidable(centers, radii, mat_type, fuzz, triangles)
    sph = [
        (float(centers[i, 0]), float(centers[i, 1]), float(centers[i, 2]),
         float(radii[i]), float(albedo[i, 0]), float(albedo[i, 1]),
         float(albedo[i, 2]), float(fuzz[i]), float(refract_idx[i]),
         float(mat_type[i]),
         float(a2[i, 0]), float(a2[i, 1]), float(a2[i, 2]), float(ts[i]),
         bool(elide[i]))
        for i in range(n)
    ]
    tris = []
    if triangles is not None:
        nrm = np.cross(triangles.e1, triangles.e2)
        nrm = nrm / np.linalg.norm(nrm, axis=-1, keepdims=True)
        for i in range(triangles.num_triangles):
            tris.append((
                triangles.v0[i].tolist(), triangles.e1[i].tolist(),
                triangles.e2[i].tolist(), nrm[i].tolist(),
                triangles.albedo[i].tolist(), float(triangles.fuzz[i]),
                float(triangles.refract_idx[i]), float(triangles.mat_type[i]),
            ))

    def intersect(ox, oy, oz, dx, dy, dz):
        f32 = jnp.float32
        shape = ox.shape
        a_q = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a_q  # hoisted: two divides per sphere -> two mults
        best_t = jnp.full(shape, T_FAR, f32)
        b_cx = jnp.zeros(shape, f32)
        b_cy = jnp.zeros(shape, f32)
        b_cz = jnp.zeros(shape, f32)
        b_inv_r = jnp.ones(shape, f32)
        if packed:
            b_pks = [jnp.zeros(shape, jnp.int32) for _ in range(n_pk)]
        else:
            b_ar = jnp.zeros(shape, f32)
            b_ag = jnp.zeros(shape, f32)
            b_ab = jnp.zeros(shape, f32)
            b_mt = jnp.zeros(shape, f32)
        b_fuzz = jnp.zeros(shape, f32)
        b_ior = jnp.ones(shape, f32)
        b_a2r = jnp.zeros(shape, f32)
        b_a2g = jnp.zeros(shape, f32)
        b_a2b = jnp.zeros(shape, f32)
        b_ts = jnp.zeros(shape, f32)
        for (cx, cy, cz, r, ar, ag, ab, fz, ior, mt, a2r, a2g, a2b, tscale,
             el) in sph:
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b_q = dx * ocx + dy * ocy + dz * ocz
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b_q * b_q - a_q * c_q
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b_q - sq) * inv_a
            if el:
                # Far root elided: no reachable ray starts inside this
                # sphere (see _t2_elidable).
                t = jnp.where(t1 > T_MIN, t1, T_FAR)
            else:
                t2 = (-b_q + sq) * inv_a
                t = jnp.where(t1 > T_MIN, t1,
                              jnp.where(t2 > T_MIN, t2, T_FAR))
            t = jnp.where(disc >= 0.0, t, T_FAR)
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            b_cx = jnp.where(better, cx, b_cx)
            b_cy = jnp.where(better, cy, b_cy)
            b_cz = jnp.where(better, cz, b_cz)
            if full_inv_r:
                b_inv_r = jnp.where(better, 1.0 / r, b_inv_r)
            elif any_neg:
                b_inv_r = jnp.where(better, 1.0 if r > 0 else -1.0,
                                    b_inv_r)
            # else: stays the init 1.0 — no select (sign-only use).
            if packed:
                b_pks = [jnp.where(better, pv, bv) for pv, bv in
                         zip(_pack_albedo_mat(ar, ag, ab, mt, pack_w),
                             b_pks)]
            else:
                b_ar = jnp.where(better, ar, b_ar)
                b_ag = jnp.where(better, ag, b_ag)
                b_ab = jnp.where(better, ab, b_ab)
                b_mt = jnp.where(better, mt, b_mt)
            # Only the attribute the winner's own material consumes is
            # selected (shade ignores the others, so stale values are
            # unobservable).
            if mt == 1.0:
                b_fuzz = jnp.where(better, fz, b_fuzz)
            if mt == 2.0:
                b_ior = jnp.where(better, ior, b_ior)
            if textured:
                b_a2r = jnp.where(better, a2r, b_a2r)
                b_a2g = jnp.where(better, a2g, b_a2g)
                b_a2b = jnp.where(better, a2b, b_a2b)
                b_ts = jnp.where(better, tscale, b_ts)

        b_nx = jnp.zeros(shape, f32)
        b_ny = jnp.zeros(shape, f32)
        b_nz = jnp.zeros(shape, f32)
        b_is_tri = jnp.zeros(shape, f32)
        for v0, e1, e2, nrm, alb, fz, ior, mt in tris:
            # Two-sided Moller-Trumbore, everything constant but the ray.
            pvx = dy * e2[2] - dz * e2[1]
            pvy = dz * e2[0] - dx * e2[2]
            pvz = dx * e2[1] - dy * e2[0]
            det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
            safe = jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / safe, 0.0)
            tvx = ox - v0[0]
            tvy = oy - v0[1]
            tvz = oz - v0[2]
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1[2] - tvz * e1[1]
            qvy = tvz * e1[0] - tvx * e1[2]
            qvz = tvx * e1[1] - tvy * e1[0]
            v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
            valid = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (tt > T_MIN))
            tt = jnp.where(valid, tt, T_FAR)
            better = tt < best_t
            best_t = jnp.where(better, tt, best_t)
            b_nx = jnp.where(better, nrm[0], b_nx)
            b_ny = jnp.where(better, nrm[1], b_ny)
            b_nz = jnp.where(better, nrm[2], b_nz)
            b_is_tri = jnp.where(better, 1.0, b_is_tri)
            if packed:
                b_pks = [jnp.where(better, pv, bv) for pv, bv in
                         zip(_pack_albedo_mat(alb[0], alb[1], alb[2], mt,
                                              pack_w),
                             b_pks)]
            else:
                b_ar = jnp.where(better, alb[0], b_ar)
                b_ag = jnp.where(better, alb[1], b_ag)
                b_ab = jnp.where(better, alb[2], b_ab)
                b_mt = jnp.where(better, mt, b_mt)
            if mt == 1.0:
                b_fuzz = jnp.where(better, fz, b_fuzz)
            if mt == 2.0:
                b_ior = jnp.where(better, ior, b_ior)
            if textured:
                # Triangles are untextured (v1): a triangle win clears
                # the checker (scale 0 disables the select).
                b_a2r = jnp.where(better, 0.0, b_a2r)
                b_a2g = jnp.where(better, 0.0, b_a2g)
                b_a2b = jnp.where(better, 0.0, b_a2b)
                b_ts = jnp.where(better, 0.0, b_ts)

        if packed:
            b_ar, b_ag, b_ab, b_mt = _unpack_albedo_mat(b_pks, pack_w)
        out = (best_t, b_cx, b_cy, b_cz, b_inv_r, b_ar, b_ag, b_ab,
               b_fuzz, b_ior, b_mt, b_nx, b_ny, b_nz, b_is_tri)
        if textured:
            out = out + (b_a2r, b_a2g, b_a2b, b_ts)
        return out

    intersect.has_textures = textured
    return intersect


def _morton_order(centers):
    """Morton (Z-curve) ordering of sphere centers — groups spatial
    neighbors so cluster AABBs stay tight."""
    import numpy as np

    lo = centers.min(axis=0)
    span = np.maximum(centers.max(axis=0) - lo, 1e-6)
    q = np.clip(((centers - lo) / span * 1023.0).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def baked_culled_intersect(centers, radii, albedo, fuzz, refract_idx,
                           mat_type, cluster_size: int = 16,
                           super_factor: int = 8,
                           global_radius_factor: float = 10.0,
                           triangles=None, tex=None,
                           camera_hint=None, refresh: int = 16,
                           super_gate: int = 48,
                           winner_hint: bool = False,
                           full_inv_r: bool = False,
                           pack_attrs: bool = True):
    """Hierarchically culled variant of :func:`baked_intersect`.

    The TPU-native analog of the reference's BVH traversal
    (``extend.wgsl:80-140``): instead of per-lane stack traversal (whose
    gathers are pathological on this device), spheres AND triangles are
    culled with *whole-tile consensus* skips.  The design is driven by
    three measured facts: the VPU is issue-rate-bound (~1 vector
    op/cycle), so saved primitive tests are saved wall time; masked
    per-lane work saves nothing (SIMD); and an interleaved
    ``pl.when(any(...))`` costs ~270 ns (a vector->scalar pipeline
    stall), so consensus reduces are batched ahead of the branches,
    where they pipeline to near-zero cost.

    What makes the skips fire on real scenes:

    * **Giant spheres are excluded from the hierarchy** and tested
      unconditionally first (radius > ``global_radius_factor`` x median
      — e.g. the book scene's r=1000 ground).  Their AABBs would
      otherwise inflate every ancestor box to "everything".
    * **Slab exit cap**: clustered primitives live in a tight world AABB
      (the book scene's sphere field is a thin slab).  A ray's exit
      distance ``t_exit`` from that box upper-bounds every in-hierarchy
      hit, so a sky-bound ray — whose ``best_t`` stays huge and would
      veto every consensus — stops blocking skips the moment it leaves
      the slab: clusters need ``enter < min(best_t, t_exit)``.
    * **Dead lanes abstain**: the persistent kernel passes its ``alive``
      mask; exhausted lanes never veto a skip, so the tile tail gets
      faster as lanes finish.
    * Primitives are Morton-ordered (triangles by centroid) so cluster
      AABBs are tight; clusters group ``super_factor``-at-a-time under
      an outer consensus skip when there are many (two-level hierarchy).
    * **Front-to-back sweep**: with ``camera_hint`` (a world-space eye
      position), clusters are visited nearest-first (supers likewise;
      cluster membership stays Morton so boxes stay tight) and the
      consensus cap is refreshed from the running ``best_t`` every
      ``refresh`` clusters — a primary ray's first hit then culls
      everything behind it, the TPU analog of the reference's
      near-child-first BVH descent (``extend.wgsl:107-125``).  The
      ordering is a pure perf heuristic: any order returns the same
      nearest hit, so a stale hint (camera moved since bake) only
      costs speed.

    Returns the 15-tuple interface of :func:`baked_intersect` plus two
    trailing cull-stat planes (supers/clusters entered).  Cull
    correctness: a cluster is skipped only when every live lane's
    current nearest hit provably cannot be improved inside the cluster's
    box (AABB entry distance lower-bounds any contained hit; rays
    starting inside a box get entry 0; in-slab hits are bounded by the
    slab exit), so results equal the brute-force kernel up to
    primitive-iteration order.

    **Winner-hint shortlist** (``winner_hint=True``): incoherent bounce
    rays defeat the front-to-back cap refresh (no shared "front"), so
    half the clusters get entered at the 1080p headline.  Paths are
    temporally coherent though: a lane's next segment usually hits the
    same neighborhood it just hit.  With the flag on, each winner
    carries its cluster id; the caller feeds the previous iteration's
    ids back as ``hint`` and the sweep *prepass-tests* exactly those
    clusters first, so the consensus cap is tight with the true nearest
    hits before the main sweep's conds are evaluated (prepassed
    clusters are excluded from the main sweep — each cluster is tested
    at most once, results unchanged up to iteration order).  The
    intersect then returns one extra plane (this iteration's winner
    ids) ahead of the cull stats.
    """
    import numpy as np

    centers = np.asarray(centers, np.float32)
    radii = np.asarray(radii, np.float32)
    albedo = np.asarray(albedo, np.float32)
    fuzz = np.asarray(fuzz, np.float32)
    refract_idx = np.asarray(refract_idx, np.float32)
    mat_type = np.asarray(mat_type, np.float32)
    textured = tex is not None
    if textured:
        t_a2 = np.asarray(tex[0], np.float32)
        t_ts = np.asarray(tex[1], np.float32)
    else:
        t_a2 = np.zeros((centers.shape[0], 3), np.float32)
        t_ts = np.zeros((centers.shape[0],), np.float32)
    # The shortlist prepass costs O(n_clusters) compares + any() reduces
    # + branches EVERY iteration; measured a 2x LOSS on the 10k-sphere
    # scene (625 clusters: 6.1 vs 12.2 Mrays/s) vs a wash at 25
    # clusters.  Gate it off where it cannot pay.
    n_tris = triangles.num_triangles if triangles is not None else 0
    est_clusters = -(-centers.shape[0] // cluster_size) \
        + -(-n_tris // cluster_size)
    winner_hint = winner_hint and est_clusters <= 64
    # Carried winner fields: 15 base (12/13 when albedo+mat ride one or
    # two packed int32 words — _pack_albedo_mat), +4 texture, +1
    # winner-cluster id.  Packing drops 3 (or 2) selects per primitive
    # test AND as many VMEM refs from every cluster entry's carry
    # restage.
    pack_w, n_pk = _resolve_pack(pack_attrs, albedo, triangles)
    packed = pack_w is not None
    base_nf = (11 + n_pk) if packed else 15
    nf = (base_nf + (4 if textured else 0)) + (1 if winner_hint else 0)
    _PK = 5  # first packed carry slot (int32; all other refs are f32)

    _elide = _t2_elidable(centers, radii, mat_type, fuzz, triangles)
    # See baked_intersect: inv_r is sign-only for shade; full 1/r is
    # carried only for image-textured scenes (LUT identity key).
    _any_neg = bool((np.asarray(radii) < 0).any())

    def rows(idx):
        return [
            (float(centers[i, 0]), float(centers[i, 1]), float(centers[i, 2]),
             float(radii[i]), float(albedo[i, 0]), float(albedo[i, 1]),
             float(albedo[i, 2]), float(fuzz[i]), float(refract_idx[i]),
             float(mat_type[i]), float(t_a2[i, 0]), float(t_a2[i, 1]),
             float(t_a2[i, 2]), float(t_ts[i]), bool(_elide[i]))
            for i in idx
        ]

    med_r = float(np.median(radii))
    is_global = radii > global_radius_factor * med_r
    global_rows = rows(np.nonzero(is_global)[0])
    rest = np.nonzero(~is_global)[0]
    if rest.size <= 2 * cluster_size:
        # Tiny scene: hierarchy can't pay — everything brute force.
        global_rows = rows(np.arange(centers.shape[0]))
        rest = np.zeros((0,), np.int64)

    # Conditioning shift: the slimmed quadratic expands |o-c|^2 around
    # the frame origin, and every addend's rounding error scales with
    # the largest term (~eps * max(|o'|^2, |kappa|, |o'||c'|)) — for a
    # scene far from the origin that error can rival c_q near a
    # surface (acne/speckle).  The frame must sit where rays travel:
    # the per-axis MEDIAN of sphere centers (robust to giant-sphere
    # outliers — a bbox center would land halfway into the ground
    # sphere, making |o'| ~ 50 and |kappa| ~ |c'|^2 - r^2 huge).  A
    # giant sphere's kappa then stays small because rays fly near its
    # surface: |c'| ~ r.  Winner constants stay in world space, and
    # box/triangle tests are Sterbenz-safe subtractions needing no
    # shift.
    _cc = centers[rest] if rest.size else centers
    if _cc.shape[0]:
        # f64 arithmetic, bit-identical to pack_culled_scene's shift so
        # the baked and dynamic kernels keep matching rounding.
        shift = tuple(np.median(_cc.astype(np.float64), axis=0))
    else:
        shift = (0.0, 0.0, 0.0)

    def hint_dist(lo, hi):
        # Squared distance from the camera hint to the nearest point of
        # the AABB: 0 when the eye is inside the box.
        p = np.minimum(np.maximum(np.asarray(camera_hint, np.float64),
                                  lo), hi)
        return float(np.sum((p - camera_hint) ** 2))

    def build_hierarchy(aabb_lo, aabb_hi, items, id_base=0):
        """Morton-ordered clusters + supers + slab over per-item AABBs.

        Cluster/super *membership* follows Morton order (tight boxes);
        with a camera hint, the *visit order* is nearest-box-first at
        both levels (clusters re-sorted within their super).  Each
        cluster carries a unique float id (``id_base`` offsets the
        namespace across hierarchies) for the winner-hint shortlist."""
        clusters = []
        for start in range(0, len(items), cluster_size):
            idx = slice(start, start + cluster_size)
            lo = aabb_lo[idx].min(axis=0)
            hi = aabb_hi[idx].max(axis=0)
            clusters.append((lo.tolist(), hi.tolist(),
                             items[start:start + cluster_size],
                             float(id_base + start // cluster_size),
                             hint_dist(lo, hi) if camera_hint is not None
                             else float(start)))
        supers = []
        for start in range(0, len(clusters), super_factor):
            grp = [c[:4] for c in
                   sorted(clusters[start:start + super_factor],
                          key=lambda c: c[4])]
            lo = np.min([c[0] for c in grp], axis=0)
            hi = np.max([c[1] for c in grp], axis=0)
            supers.append((lo.tolist(), hi.tolist(), grp,
                           hint_dist(lo, hi) if camera_hint is not None
                           else float(start)))
        supers.sort(key=lambda s: s[3])
        clusters.sort(key=lambda c: c[4])
        clusters = [c[:4] for c in clusters]
        supers = [s[:3] for s in supers]
        slab = (aabb_lo.min(axis=0).tolist(), aabb_hi.max(axis=0).tolist())
        return clusters, supers, slab

    if rest.size:
        order = rest[_morton_order(centers[rest])]
        # |r|: negative (inside-out) radii span the same box.
        sph_hier = build_hierarchy(
            centers[order] - np.abs(radii[order, None]),
            centers[order] + np.abs(radii[order, None]), rows(order))
    else:
        sph_hier = ([], [], None)

    tris = []
    tri_hier = ([], [], None)
    if triangles is not None and triangles.num_triangles > 0:
        v0 = np.asarray(triangles.v0, np.float32)
        e1 = np.asarray(triangles.e1, np.float32)
        e2 = np.asarray(triangles.e2, np.float32)
        nrm = np.cross(e1, e2)
        nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                               1e-20)
        t_alb = np.asarray(triangles.albedo, np.float32)
        t_fz = np.asarray(triangles.fuzz, np.float32)
        t_io = np.asarray(triangles.refract_idx, np.float32)
        t_mt = np.asarray(triangles.mat_type, np.float32)
        order = _morton_order(v0 + (e1 + e2) / 3.0)
        v0, e1, e2, nrm = v0[order], e1[order], e2[order], nrm[order]
        t_alb, t_fz, t_io, t_mt = t_alb[order], t_fz[order], t_io[order], t_mt[order]
        tris = [
            (v0[i].tolist(), e1[i].tolist(), e2[i].tolist(), nrm[i].tolist(),
             t_alb[i].tolist(), float(t_fz[i]), float(t_io[i]), float(t_mt[i]))
            for i in range(v0.shape[0])
        ]
        verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (T, 3, 3)
        tri_hier = build_hierarchy(
            verts.min(axis=1), verts.max(axis=1), tris,
            id_base=len(sph_hier[0]))

    any_tris = bool(tri_hier[0])

    def intersect(ox, oy, oz, dx, dy, dz, alive=None, hint=None):
        f32 = jnp.float32
        shape = ox.shape
        idx_ = 1.0 / dx
        idy_ = 1.0 / dy
        idz_ = 1.0 / dz

        def sphere_tests(sph, carry, ox=ox, oy=oy, oz=oz, cid=-1.0):
            # The ray-origin override args exist only for the perf
            # probe (a traced-zero shift defeats CSE so the quadratic
            # fully recomputes); production calls use the defaults.
            # Issue-rate-slimmed quadratic (the VPU executes ~1 vector
            # op/cycle, so every op is wall time): directions are unit
            # by construction in the fused kernel (raygen and shade both
            # normalize), so a == 1 and the inv_a multiplies vanish; a
            # negative discriminant propagates NaN through sqrt, and NaN
            # compares false in `better`, replacing the disc>=0 select.
            # The quadratic is expanded around baked per-sphere
            # constants, in the scene-centered frame (c' = c - shift,
            # o' = o - shift; t is translation invariant): kappa =
            # |c'|^2 - r^2 in exact f64 at bake time, and centering
            # bounds |c'| by the scene extent so the expansion's
            # cancellation (error ~ eps * |c'|^2) stays below f32
            # noise even for scenes far from the world origin.
            # dd_o/oo2 are per-ray invariants CSE collapses across
            # cluster entries:
            #   -b = d.c' - d.o' ;  c_q = (|o'|^2 + kappa) - o'.(2c')
            oxp = ox - shift[0]
            oyp = oy - shift[1]
            ozp = oz - shift[2]
            dd_o = dx * oxp + dy * oyp + dz * ozp
            oo2 = oxp * oxp + oyp * oyp + ozp * ozp
            if packed:
                (best_t, b_cx, b_cy, b_cz, b_ir) = carry[:5]
                b_pks = list(carry[5:5 + n_pk])
                (b_fz, b_io, b_nx, b_ny, b_nz,
                 b_it) = carry[5 + n_pk:base_nf]
            else:
                (best_t, b_cx, b_cy, b_cz, b_ir, b_ar, b_ag, b_ab,
                 b_fz, b_io, b_mt, b_nx, b_ny, b_nz, b_it) = carry[:15]
            texc = list(carry[base_nf:base_nf + 4]) if textured else []
            key = carry[nf - 1] if winner_hint else None
            for (cx, cy, cz, r, ar, ag, ab, fz, ior, mt, a2r, a2g, a2b, ts,
                 el) in sph:
                cxp = float(np.float64(cx) - shift[0])
                cyp = float(np.float64(cy) - shift[1])
                czp = float(np.float64(cz) - shift[2])
                kappa = float((np.float64(cx) - shift[0]) ** 2
                              + (np.float64(cy) - shift[1]) ** 2
                              + (np.float64(cz) - shift[2]) ** 2
                              - np.float64(r) * r)
                nb = (dx * cxp + dy * cyp + dz * czp) - dd_o
                c_q = (oo2 + kappa) - (oxp * (2.0 * cxp)
                                       + oyp * (2.0 * cyp)
                                       + ozp * (2.0 * czp))
                disc = nb * nb - c_q
                sq = jnp.sqrt(disc)          # NaN when disc < 0
                t1 = nb - sq
                # NaN roots fall through the selects to T_FAR.
                if el:
                    # Far root elided: no reachable ray starts inside
                    # this sphere (see _t2_elidable) — 3 fewer vector
                    # ops on the issue-bound sweep.
                    t = jnp.where(t1 > T_MIN, t1, T_FAR)
                else:
                    t2 = nb + sq
                    t = jnp.where(t1 > T_MIN, t1,
                                  jnp.where(t2 > T_MIN, t2, T_FAR))
                better = t < best_t
                best_t = jnp.where(better, t, best_t)
                b_cx = jnp.where(better, cx, b_cx)
                b_cy = jnp.where(better, cy, b_cy)
                b_cz = jnp.where(better, cz, b_cz)
                if full_inv_r:
                    b_ir = jnp.where(better, 1.0 / r, b_ir)
                elif _any_neg:
                    b_ir = jnp.where(better, 1.0 if r > 0 else -1.0,
                                     b_ir)
                # else: stays the init 1.0 — shade only uses the sign
                # (the normal is rsqrt-normalized; _shade_tile:207).
                if packed:
                    b_pks = [jnp.where(better, pv, bv) for pv, bv in
                             zip(_pack_albedo_mat(ar, ag, ab, mt,
                                                  pack_w),
                                 b_pks)]
                else:
                    b_ar = jnp.where(better, ar, b_ar)
                    b_ag = jnp.where(better, ag, b_ag)
                    b_ab = jnp.where(better, ab, b_ab)
                    b_mt = jnp.where(better, mt, b_mt)
                # A sphere selects only the attributes its own material
                # can consume on a win: fuzz feeds the metal path, ior
                # the dielectric path; shade ignores the others, so
                # stale values are unobservable.
                if mt == 1.0:
                    b_fz = jnp.where(better, fz, b_fz)
                if mt == 2.0:
                    b_io = jnp.where(better, ior, b_io)
                if any_tris:
                    b_it = jnp.where(better, 0.0, b_it)
                if textured:
                    if ts != 0.0:
                        texc = [jnp.where(better, c, v) for c, v in
                                zip((a2r, a2g, a2b, ts), texc)]
                    else:
                        # A solid win must still disable the checker.
                        texc = texc[:3] + [jnp.where(better, 0.0, texc[3])]
                if winner_hint:
                    key = jnp.where(better, f32(cid), key)
            if packed:
                return (best_t, b_cx, b_cy, b_cz, b_ir, *b_pks, b_fz,
                        b_io, b_nx, b_ny, b_nz, b_it, *texc) + (
                            (key,) if winner_hint else ())
            return (best_t, b_cx, b_cy, b_cz, b_ir, b_ar, b_ag, b_ab,
                    b_fz, b_io, b_mt, b_nx, b_ny, b_nz, b_it, *texc) + (
                        (key,) if winner_hint else ())

        def tri_tests(items, carry, cid=-1.0):
            if packed:
                (best_t, b_cx, b_cy, b_cz, b_ir) = carry[:5]
                b_pks = list(carry[5:5 + n_pk])
                (b_fz, b_io, b_nx, b_ny, b_nz,
                 b_it) = carry[5 + n_pk:base_nf]
            else:
                (best_t, b_cx, b_cy, b_cz, b_ir, b_ar, b_ag, b_ab,
                 b_fz, b_io, b_mt, b_nx, b_ny, b_nz, b_it) = carry[:15]
            texc = list(carry[base_nf:base_nf + 4]) if textured else []
            key = carry[nf - 1] if winner_hint else None
            for v0, e1, e2, nrm, alb, fz, ior, mt in items:
                # Two-sided Moller-Trumbore, everything constant but the ray.
                pvx = dy * e2[2] - dz * e2[1]
                pvy = dz * e2[0] - dx * e2[2]
                pvz = dx * e2[1] - dy * e2[0]
                det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
                safe = jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
                inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / safe, 0.0)
                tvx = ox - v0[0]
                tvy = oy - v0[1]
                tvz = oz - v0[2]
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1[2] - tvz * e1[1]
                qvy = tvz * e1[0] - tvx * e1[2]
                qvz = tvx * e1[1] - tvy * e1[0]
                v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                tt = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
                valid = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
                         & (u + v <= 1.0) & (tt > T_MIN))
                tt = jnp.where(valid, tt, T_FAR)
                better = tt < best_t
                best_t = jnp.where(better, tt, best_t)
                b_nx = jnp.where(better, nrm[0], b_nx)
                b_ny = jnp.where(better, nrm[1], b_ny)
                b_nz = jnp.where(better, nrm[2], b_nz)
                b_it = jnp.where(better, 1.0, b_it)
                if packed:
                    b_pks = [jnp.where(better, pv, bv) for pv, bv in
                             zip(_pack_albedo_mat(alb[0], alb[1], alb[2],
                                                  mt, pack_w),
                                 b_pks)]
                else:
                    b_ar = jnp.where(better, alb[0], b_ar)
                    b_ag = jnp.where(better, alb[1], b_ag)
                    b_ab = jnp.where(better, alb[2], b_ab)
                    b_mt = jnp.where(better, mt, b_mt)
                if mt == 1.0:
                    b_fz = jnp.where(better, fz, b_fz)
                if mt == 2.0:
                    b_io = jnp.where(better, ior, b_io)
                if textured:
                    # Triangles are untextured (v1): a win disables the
                    # checker (scale 0).
                    texc = [jnp.where(better, 0.0, v) for v in texc]
                if winner_hint:
                    key = jnp.where(better, jnp.float32(cid), key)
            if packed:
                return (best_t, b_cx, b_cy, b_cz, b_ir, *b_pks, b_fz,
                        b_io, b_nx, b_ny, b_nz, b_it, *texc) + (
                            (key,) if winner_hint else ())
            return (best_t, b_cx, b_cy, b_cz, b_ir, b_ar, b_ag, b_ab,
                    b_fz, b_io, b_mt, b_nx, b_ny, b_nz, b_it, *texc) + (
                        (key,) if winner_hint else ())

        def box_range(lo, hi):
            """(entry, exit) of the ray against an AABB (slab method)."""
            tx0 = (lo[0] - ox) * idx_
            tx1 = (hi[0] - ox) * idx_
            tmin = jnp.minimum(tx0, tx1)
            tmax = jnp.maximum(tx0, tx1)
            ty0 = (lo[1] - oy) * idy_
            ty1 = (hi[1] - oy) * idy_
            tmin = jnp.maximum(tmin, jnp.minimum(ty0, ty1))
            tmax = jnp.minimum(tmax, jnp.maximum(ty0, ty1))
            tz0 = (lo[2] - oz) * idz_
            tz1 = (hi[2] - oz) * idz_
            tmin = jnp.maximum(tmin, jnp.minimum(tz0, tz1))
            tmax = jnp.minimum(tmax, jnp.maximum(tz0, tz1))
            return tmin, tmax

        def slab_exit(slab):
            s_min, s_max = box_range(slab[0], slab[1])
            t_exit = jnp.where((s_min <= s_max) & (s_max > T_MIN), s_max,
                               jnp.float32(-1.0))
            if alive is not None:
                t_exit = jnp.where(alive, t_exit, -1.0)
            return t_exit

        def cluster_cond(box_lo, box_hi, cap):
            c_min, c_max = box_range(box_lo, box_hi)
            return ((c_min <= c_max) & (c_max > T_MIN)
                    & (jnp.maximum(c_min, 0.0) < cap))

        f0 = jnp.zeros(shape, f32)
        if packed:
            init = (
                jnp.full(shape, T_FAR, f32),
                f0, f0, f0, jnp.ones(shape, f32),
                *[jnp.zeros(shape, jnp.int32) for _ in range(n_pk)],
                f0, jnp.ones(shape, f32),
                f0, f0, f0, f0,
            )
        else:
            init = (
                jnp.full(shape, T_FAR, f32),
                f0, f0, f0, jnp.ones(shape, f32),
                f0, f0, f0, f0,
                jnp.ones(shape, f32), f0,
                f0, f0, f0, f0,
            )
        if textured:
            init = init + (f0, f0, f0, f0)
        if winner_hint:
            # This iteration's winner-cluster ids (-1 = global/none).
            init = init + (jnp.full(shape, -1.0, f32),)

        def unpack_carry(vals):
            """Restore the legacy 15-field-base tuple order consumed by
            _persistent_impl / _shade_tile: decode the packed int32
            word(s) once per iteration (after the whole sweep)."""
            if not packed:
                return tuple(vals)
            ar, ag, ab, mt = _unpack_albedo_mat(
                vals[_PK:_PK + n_pk], pack_w)
            fz, io = vals[5 + n_pk], vals[6 + n_pk]
            return (tuple(vals[:5]) + (ar, ag, ab, fz, io, mt)
                    + tuple(vals[7 + n_pk:]))

        carry = sphere_tests(global_rows, init)
        hierarchies = [(sph_hier, sphere_tests), (tri_hier, tri_tests)]
        hierarchies = [(h, fn) for h, fn in hierarchies if h[0]]
        if not hierarchies:
            return unpack_carry(carry) + (f0, f0)

        def body(*refs):
            for ref, val in zip(refs, carry):
                ref[:] = val
            if "dbl_scope" in PROBE:  # perf probe: re-stage the scope
                for ref in refs[:nf]:
                    if ref.dtype == jnp.int32:
                        ref[:] = ref[:] + (refs[0][0, 0] * 0.0).astype(
                            jnp.int32)
                    else:
                        ref[:] = ref[:] * 1.0 + (refs[0][0, 0] * 0.0)
            t_ref = refs[0]
            sup_ref, clu_ref = refs[nf], refs[nf + 1]
            sup_ref[:] = f0
            clu_ref[:] = f0

            # Winner-hint prepass (see docstring): test the clusters
            # that won for some live lane LAST iteration, before any
            # main-sweep cond is evaluated — their true nearest hits
            # tighten t_ref so the main sweep consensus-skips most of
            # the rest.  The any() reduces are batched (they pipeline;
            # an interleaved reduce+when stalls ~270 ns).
            excludes = [None] * len(hierarchies)
            if winner_hint and hint is not None:
                excludes = []
                for (clusters, _sup, _slab), tests in hierarchies:
                    pres = []
                    for _lo, _hi, _items, cid in clusters:
                        m = hint == f32(cid)
                        if alive is not None:
                            m = m & alive
                        pres.append(jnp.any(m))
                    ex = {}
                    for pc, (_lo, _hi, items, cid) in zip(pres, clusters):
                        ex[cid] = pc

                        @pl.when(pc)
                        def _(items=items, cid=cid, tests=tests):
                            clu_ref[:] = clu_ref[:] + 1.0
                            if "hint_count" in PROBE:  # probe: prepass
                                sup_ref[:] = sup_ref[:] + 1.0
                            vals = tests(items,
                                         tuple(r[:] for r in refs[:nf]),
                                         cid=cid)
                            for ref, val in zip(refs, vals):
                                ref[:] = val
                    excludes.append(ex)

            for ((clusters, supers, slab), tests), exclude in zip(
                    hierarchies, excludes):
                t_exit = slab_exit(slab)

                def run_clusters(grp, cap=None, tests=tests,
                                 exclude=exclude):
                    # Software-pipelined consensus, ``refresh`` clusters
                    # per batch.  An any()+pl.when whose reduce was just
                    # issued stalls ~270 ns (vector->scalar pipeline);
                    # so batch k+1's reduces are issued BEFORE batch k's
                    # cluster tests run — by the time its branches
                    # execute, the scalars have long retired.  The cap
                    # each batch sees is therefore one batch stale
                    # (tightened by hits up to batch k-1); with
                    # front-to-back ordering a primary hit in an early
                    # batch still culls everything behind it.
                    def conds_raw(batch, bcap):
                        if "dbl_cond" in PROBE:   # perf probe only
                            bcap = bcap + (t_ref[0, 0] * 0.0)
                            return [jnp.any(cluster_cond(c_lo, c_hi, bcap))
                                    & jnp.any(cluster_cond(
                                        c_lo, c_hi, bcap + 1e-30))
                                    for c_lo, c_hi, *_ in batch]
                        if "dbl_cond2" in PROBE:  # perf probe: full box
                            # math recomputed (CSE-proof traced-zero
                            # shift of the box corners).
                            z = t_ref[0, 0] * 0.0
                            return [jnp.any(cluster_cond(c_lo, c_hi, bcap))
                                    & jnp.any(cluster_cond(
                                        [l + z for l in c_lo],
                                        [h + z for h in c_hi], bcap))
                                    for c_lo, c_hi, *_ in batch]
                        return [jnp.any(cluster_cond(c_lo, c_hi, bcap))
                                for c_lo, c_hi, *_ in batch]

                    def conds_of(batch, bcap):
                        cs = conds_raw(batch, bcap)
                        if exclude:
                            # Prepassed clusters are already fully
                            # tested against these rays: never re-enter.
                            cs = [c & ~exclude[b[3]]
                                  for c, b in zip(cs, batch)]
                        return cs

                    batches = [grp[b0:b0 + refresh]
                               for b0 in range(0, len(grp), refresh)]
                    cap0 = (jnp.minimum(t_ref[:], t_exit)
                            if cap is None else cap)
                    conds = conds_of(batches[0], cap0)
                    for k, batch in enumerate(batches):
                        if k + 1 < len(batches):
                            nxt = conds_of(batches[k + 1],
                                           jnp.minimum(t_ref[:], t_exit))
                        for cond, (c_lo, c_hi, items, cid) in zip(conds,
                                                                  batch):
                            @pl.when(cond)
                            def _(items=items, tests=tests, cid=cid):
                                clu_ref[:] = clu_ref[:] + 1.0
                                vals = tests(items,
                                             tuple(r[:] for r in refs[:nf]),
                                             cid=cid)
                                if "dbl_entry" in PROBE:  # perf probe:
                                    # idempotent re-test (same winners)
                                    vals = tests(items, vals, cid=cid)
                                if ("dbl_entry2" in PROBE
                                        and tests is sphere_tests):
                                    # CSE-proof re-test: traced-zero ray
                                    # shift, full quadratic recompute;
                                    # equal t never wins (strict <).
                                    z = t_ref[0, 0] * 0.0
                                    vals = tests(items, vals, ox=ox + z,
                                                 oy=oy + z, oz=oz + z,
                                                 cid=cid)
                                for ref, val in zip(refs, vals):
                                    ref[:] = val
                        if k + 1 < len(batches):
                            conds = nxt

                # Two-level only above the gate: with few clusters the
                # super conds cost more than the leaf conds they save.
                if len(clusters) > super_gate:
                    cap0 = jnp.minimum(t_ref[:], t_exit)
                    sup_conds = [
                        jnp.any(cluster_cond(s_lo, s_hi, cap0))
                        for s_lo, s_hi, _ in supers
                    ]
                    for cond, (s_lo, s_hi, grp) in zip(sup_conds, supers):
                        @pl.when(cond)
                        def _(grp=grp, t_exit=t_exit):
                            sup_ref[:] = sup_ref[:] + 1.0
                            # Refresh: earlier supers' hits tighten the cap.
                            run_clusters(grp, jnp.minimum(t_ref[:], t_exit))
                else:
                    run_clusters(clusters, jnp.minimum(t_ref[:], t_exit))

            return tuple(r[:] for r in refs)

        out = pl.run_scoped(
            body, *[pltpu.VMEM(shape,
                               jnp.int32
                               if packed and _PK <= i < _PK + n_pk
                               else jnp.float32)
                    for i in range(nf + 2)]
        )
        return unpack_carry(out[:nf]) + tuple(out[nf:])

    intersect.returns_cull_stats = True
    intersect.has_textures = textured
    intersect.returns_winner_key = winner_hint
    intersect.pack_attrs = pack_w
    intersect.n_supers = len(sph_hier[1]) + len(tri_hier[1])
    intersect.n_clusters = len(sph_hier[0]) + len(tri_hier[0])
    # Roofline metadata (bench.py device_utilization): primitives swept
    # unconditionally every iteration, and total clustered primitives
    # (pairs per cluster entry = n_clustered_items / n_clusters on
    # average — Morton clusters are full except the last).
    intersect.n_globals = len(global_rows)
    intersect.n_clustered_items = (
        sum(len(c[2]) for c in sph_hier[0])
        + sum(len(c[2]) for c in tri_hier[0]))
    # Cluster AABBs in visit order (lo, hi per cluster) — measurement
    # hook for exp/bounce0.py's frustum-shortlist comparison.
    intersect.cluster_aabbs = (
        [(c[0], c[1]) for c in sph_hier[0]]
        + [(c[0], c[1]) for c in tri_hier[0]])
    return intersect


def _super_group(clu_tabs, aabbs, cluster_size, ncols, hint_order):
    """Order clusters for the dynamic sweep and build its super level.

    At or below _DYN_UNROLL_CLUSTERS clusters the camera hint orders
    individual clusters (the statically unrolled sweep) and no supers
    are built.  Above it, clusters stay Morton-consecutive (spatially
    tight) inside superclusters of _DYN_SUPER, the camera hint orders
    the SUPERS front-to-back, and the cluster list is NaN-padded to a
    super multiple so the rolled sweep's dynamic indexing never leaves
    the tables (NaN AABBs compare false -> padded clusters are never
    entered).  Returns (clu_tabs, aabbs, sup_aabbs, n_supers).
    """
    import numpy as np

    n = len(clu_tabs)
    if n == 0:
        return clu_tabs, aabbs, [], 0
    if n <= _DYN_UNROLL_CLUSTERS:
        visit = hint_order(aabbs)
        return ([clu_tabs[i] for i in visit],
                [aabbs[i] for i in visit], [], 0)
    pad_tab = np.full((cluster_size, ncols), np.nan, np.float32)
    pad_box = np.full((8,), np.nan, np.float32)
    clu_tabs = list(clu_tabs)
    aabbs = list(aabbs)
    while len(clu_tabs) % _DYN_SUPER:
        clu_tabs.append(pad_tab)
        aabbs.append(pad_box)
    groups = [(clu_tabs[s:s + _DYN_SUPER], aabbs[s:s + _DYN_SUPER])
              for s in range(0, len(clu_tabs), _DYN_SUPER)]
    sup_aabbs = []
    for _tabs, boxes in groups:
        real = np.stack([b for b in boxes if not np.isnan(b[0])])
        sup_aabbs.append(np.concatenate([
            real[:, 0:3].min(axis=0), real[:, 3:6].max(axis=0),
            [0.0, 0.0]]).astype(np.float32))
    visit = hint_order(sup_aabbs)
    clu_tabs, aabbs = [], []
    for i in visit:
        clu_tabs.extend(groups[i][0])
        aabbs.extend(groups[i][1])
    return clu_tabs, aabbs, [sup_aabbs[i] for i in visit], len(groups)


def pack_culled_scene(scene_arrays, cluster_size: int = 16,
                      global_radius_factor: float = 10.0,
                      camera_hint=None, pack_attrs: bool = True):
    """Host-side tables for the *dynamic* culled intersector.

    Unlike the baked path (scene as compile-time constants, per-scene
    compile), here the scene lives in VMEM tables and only the
    *structure* (global-block count, cluster count, cluster size) is
    static — so a new scene with the same structure reuses the compiled
    kernel and even structure changes compile in O(#clusters), not
    O(#spheres).

    With ``camera_hint`` (world-space eye), clusters are ordered
    nearest-first — and since the order lives in the *tables*, not the
    code, re-sorting for a new camera never recompiles (unlike the
    baked path).

    Returns (scn (N_pad, 16) f32 NaN-padded reordered sphere table —
    (N_pad, 24) when the scene has textures, cols 16-18 checker
    albedo2 rgb and 19 checker scale (0 = untextured sphere); the
    wider table IS the structure signal, so textured scenes compile a
    textured kernel and plain scenes pay nothing,
    clu (C, 8) f32 cluster AABBs [lo xyz, hi xyz, 0, 0],
    sup (S, 8) f32 supercluster AABBs (unions of _DYN_SUPER
    consecutive clusters; built only above _DYN_UNROLL_CLUSTERS, where
    the kernel switches to the rolled super-gated sweep — NaN
    placeholder otherwise),
    slab (1, 8) f32 [lo xyz, hi xyz, 0, 0],
    tri (T_pad, 24) f32 NaN-padded triangle table (cols: v0 xyz, e1
    xyz, e2 xyz, unit normal xyz, albedo rgb, fuzz, ior, mat_type),
    tri_clu (TC, 8), tri_sup (TS, 8), tri_slab (1, 8),
    n_global_blocks, n_clusters, n_supers, n_tri_clusters,
    n_tri_supers, attrs_packed) — the five counts are python ints
    (static kernel structure).  With supers, n_clusters counts NaN
    padding up to a super multiple.

    ``attrs_packed`` (bool, static): with ``pack_attrs`` and every
    albedo in [0, 1] (same precondition as the baked path's
    _pack_albedo_ok), the winner (albedo rgb, material id) is packed
    16:16 into two int32 words whose BITS ride the f32 table — sphere
    cols 4-5 and triangle cols 12-13 (replacing albedo r/g; b and mat
    stay in their columns for debugging but the packed kernel never
    reads them).  The kernel bitcasts the loaded block back to int32
    (measured bit-exact through the numpy->VMEM path incl. NaN-pattern
    payloads) and the winner carry shrinks by 2 selects per primitive
    pair and 2 VMEM refs per cluster-entry restage — the baked path's
    pack_attrs (+106% on the 50k-tri knot) applied to the dynamic
    tables (exp/tripair.py: +19.5% pair rate before the restage win).
    make_dynamic_culled_intersect must be built with the matching
    ``packed_attrs`` flag.
    """
    import numpy as np

    centers = np.asarray(scene_arrays["centers"], np.float32)
    radii = np.asarray(scene_arrays["radii"], np.float32)
    albedo = np.asarray(scene_arrays["albedo"], np.float32)
    fuzz = np.asarray(scene_arrays["fuzz"], np.float32)
    refract = np.asarray(scene_arrays["refract_idx"], np.float32)
    mat = np.asarray(scene_arrays["mat_type"], np.float32)
    textured = "tex_kind" in scene_arrays
    ncols = 24 if textured else 16
    if textured:
        tex_a2 = np.asarray(scene_arrays["tex_albedo2"], np.float32)
        tex_sc = np.asarray(scene_arrays["tex_scale"], np.float32)

    def _pk_words(alb, mt_col):
        """16:16 albedo+mat words as f32 BIT patterns (see docstring)."""
        q = np.clip(np.round(alb.astype(np.float64) * 65535.0),
                    0, 65535).astype(np.int64)
        pk1 = (q[:, 0] << 16) | q[:, 1]
        pk2 = (q[:, 2] << 16) | mt_col.astype(np.int64)
        pk = np.stack([pk1, pk2], axis=1)
        pk = np.where(pk >= (1 << 31), pk - (1 << 32), pk)
        return pk.astype(np.int32).view(np.float32)

    attrs_packed = bool(pack_attrs) and bool(
        (albedo >= 0.0).all() and (albedo <= 1.0).all())
    if attrs_packed and "tri_v0" in scene_arrays \
            and scene_arrays["tri_v0"].shape[0] > 0:
        _ta = np.asarray(scene_arrays["tri_albedo"], np.float64)
        attrs_packed = bool((_ta >= 0.0).all() and (_ta <= 1.0).all())

    med_r = float(np.median(radii))
    is_global = radii > global_radius_factor * med_r
    g_idx = np.nonzero(is_global)[0]
    rest = np.nonzero(~is_global)[0]
    if rest.size <= 2 * cluster_size:
        g_idx = np.arange(centers.shape[0])
        rest = np.zeros((0,), np.int64)
    order = rest[_morton_order(centers[rest])] if rest.size else rest

    # Conditioning shift for the expanded quadratic (same reasoning and
    # bit-identical rule as baked_culled_intersect): the per-axis
    # median of sphere centers keeps the frame where rays travel and is
    # robust to giant-sphere outliers.
    _cc = centers[rest] if rest.size else centers
    if _cc.shape[0]:
        sh = np.median(_cc.astype(np.float64), axis=0)
    else:
        sh = np.zeros(3, np.float64)

    def rows(idx, pad_to):
        n = idx.size
        out = np.full((max(pad_to, ((n + 7) // 8) * 8), ncols), np.nan,
                      np.float32)
        out[:n, 0:3] = centers[idx]
        out[:n, 3] = radii[idx]
        out[:n, 4:7] = albedo[idx]
        out[:n, 7] = fuzz[idx]
        out[:n, 8] = refract[idx]
        out[:n, 9] = mat[idx]
        # Quadratic-slimming columns (see sphere_block), all in the
        # scene-centered frame c' = c - shift: kappa = |c'|^2 - r^2 in
        # exact f64, 1/r (replaces a per-sphere divide), 2c' (the
        # kernel reconstructs d.c' with a pre-halved direction).
        # Padding rows stay NaN, which can never win the nearest-hit
        # select.
        c64 = centers[idx].astype(np.float64) - sh
        out[:n, 10] = (np.sum(c64 * c64, axis=1)
                       - radii[idx].astype(np.float64) ** 2)
        out[:n, 11] = 1.0 / radii[idx]
        out[:n, 12:15] = 2.0 * c64
        if textured:
            out[:n, 16:19] = tex_a2[idx]
            out[:n, 19] = tex_sc[idx]
        if attrs_packed:
            out[:n, 4:6] = _pk_words(albedo[idx], mat[idx])
        return out

    g_tab = rows(g_idx, 8)
    n_global_blocks = g_tab.shape[0] // 8

    def hint_order(aabbs_list):
        if camera_hint is None or not aabbs_list:
            return list(range(len(aabbs_list)))
        eye = np.asarray(camera_hint, np.float64).reshape(3)
        d = [float(np.sum((np.minimum(np.maximum(eye, a[0:3]), a[3:6])
                           - eye) ** 2)) for a in aabbs_list]
        return list(np.argsort(d))

    clu_tabs = []
    aabbs = []
    for start in range(0, order.size, cluster_size):
        idx = order[start:start + cluster_size]
        clu_tabs.append(rows(idx, cluster_size))
        # |r|: a negative (inside-out) radius spans the same box.
        lo = (centers[idx] - np.abs(radii[idx, None])).min(axis=0)
        hi = (centers[idx] + np.abs(radii[idx, None])).max(axis=0)
        aabbs.append(np.concatenate([lo, hi, [0.0, 0.0]]).astype(np.float32))
    clu_tabs, aabbs, sup_aabbs, n_supers = _super_group(
        clu_tabs, aabbs, cluster_size, ncols, hint_order)
    n_clusters = len(clu_tabs)
    scn = np.concatenate([g_tab] + clu_tabs) if clu_tabs else g_tab

    def pad8(tab):
        # The batched cluster-major cond pass loads AABBs in (8, 8)
        # blocks; NaN padding rows compare false -> never live.
        n = tab.shape[0]
        out = np.full((max(8, ((n + 7) // 8) * 8), tab.shape[1]),
                      np.nan, np.float32)
        out[:n] = tab
        return out

    clu = pad8(np.stack(aabbs) if aabbs
               else np.zeros((0, 8), np.float32))
    sup = pad8(np.stack(sup_aabbs)) if n_supers else np.full(
        (8, 8), np.nan, np.float32)
    # Row 0: cluster-slab AABB (exit cap).  Row 1: the conditioning
    # shift, read by the kernel to move ray origins into the
    # scene-centered frame.
    slab = np.zeros((2, 8), np.float32)
    slab[1, 0:3] = sh
    if order.size:
        slab[0, 0:3] = (centers[order]
                        - np.abs(radii[order, None])).min(axis=0)
        slab[0, 3:6] = (centers[order]
                        + np.abs(radii[order, None])).max(axis=0)

    # Triangles: Morton-clustered by centroid into their own tables.
    tri = np.full((8, 24), np.nan, np.float32)
    tri_clu = np.zeros((1, 8), np.float32)
    tri_sup = np.full((8, 8), np.nan, np.float32)
    tri_slab = np.zeros((1, 8), np.float32)
    n_tri_clusters = 0
    n_tri_supers = 0
    if "tri_v0" in scene_arrays and scene_arrays["tri_v0"].shape[0] > 0:
        v0 = np.asarray(scene_arrays["tri_v0"], np.float32)
        e1 = np.asarray(scene_arrays["tri_e1"], np.float32)
        e2 = np.asarray(scene_arrays["tri_e2"], np.float32)
        t_alb = np.asarray(scene_arrays["tri_albedo"], np.float32)
        t_fz = np.asarray(scene_arrays["tri_fuzz"], np.float32)
        t_io = np.asarray(scene_arrays["tri_refract"], np.float32)
        t_mt = np.asarray(scene_arrays["tri_mat_type"], np.float32)
        t_ord = _morton_order(v0 + (e1 + e2) / 3.0)
        v0, e1, e2 = v0[t_ord], e1[t_ord], e2[t_ord]
        t_alb, t_fz = t_alb[t_ord], t_fz[t_ord]
        t_io, t_mt = t_io[t_ord], t_mt[t_ord]
        nrm = np.cross(e1, e2)
        nrm = nrm / np.maximum(
            np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
        verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)   # (T, 3, 3)
        t_tabs, t_aabbs = [], []
        n_t = v0.shape[0]
        for start in range(0, n_t, cluster_size):
            idx = slice(start, min(start + cluster_size, n_t))
            tab = np.full((cluster_size, 24), np.nan, np.float32)
            m = verts[idx].shape[0]
            tab[:m, 0:3] = v0[idx]
            tab[:m, 3:6] = e1[idx]
            tab[:m, 6:9] = e2[idx]
            tab[:m, 9:12] = nrm[idx]
            tab[:m, 12:15] = t_alb[idx]
            tab[:m, 15] = t_fz[idx]
            tab[:m, 16] = t_io[idx]
            tab[:m, 17] = t_mt[idx]
            if attrs_packed:
                tab[:m, 12:14] = _pk_words(t_alb[idx], t_mt[idx])
            t_tabs.append(tab)
            lo = verts[idx].min(axis=(0, 1))
            hi = verts[idx].max(axis=(0, 1))
            t_aabbs.append(np.concatenate([lo, hi, [0.0, 0.0]])
                           .astype(np.float32))
        t_tabs, t_aabbs, t_sup_aabbs, n_tri_supers = _super_group(
            t_tabs, t_aabbs, cluster_size, 24, hint_order)
        n_tri_clusters = len(t_tabs)
        tri = np.concatenate(t_tabs)
        tri_clu = pad8(np.stack(t_aabbs))
        if n_tri_supers:
            tri_sup = pad8(np.stack(t_sup_aabbs))
        tri_slab = np.zeros((1, 8), np.float32)
        tri_slab[0, 0:3] = verts.min(axis=(0, 1))
        tri_slab[0, 3:6] = verts.max(axis=(0, 1))

    return (scn, clu, sup, slab, tri, tri_clu, tri_sup, tri_slab,
            n_global_blocks, n_clusters, n_supers,
            n_tri_clusters, n_tri_supers, attrs_packed)


def make_dynamic_culled_intersect(scn_ref, clu_ref, slab_ref,
                                  n_global_blocks: int, n_clusters: int,
                                  cluster_size: int,
                                  tri_ref=None, tri_clu_ref=None,
                                  tri_slab_ref=None,
                                  n_tri_clusters: int = 0,
                                  sup_ref=None, n_supers: int = 0,
                                  tri_sup_ref=None,
                                  n_tri_supers: int = 0,
                                  packed_attrs: bool = False):
    """Dynamic-table consensus-culled intersect (see pack_culled_scene).

    Same cull semantics as :func:`baked_culled_intersect` (Morton leaf
    clusters, giant-sphere globals, slab-exit cap, dead-lane
    abstention), different machinery: the per-cluster consensus
    conditions are computed in one *batched* pass (any() reduces
    pipeline; ~270 ns each when interleaved) and parked in SMEM, then a
    ``fori_loop`` walks the clusters gating dynamic 8-sphere block
    loads on the cheap SMEM scalars — measured 31 Gpairs/s nominal in
    exp/micro_r2.py (W7), i.e. the when-on-SMEM-scalar pattern carries
    no vector->scalar stall.

    Triangles (``tri_ref`` tables, see pack_culled_scene) get the same
    treatment in a second phase; with any triangles the winner carry
    grows to 15 fields (triangle normal + is-triangle flag, the
    :func:`baked_intersect` interface).

    Above ``_DYN_UNROLL_CLUSTERS`` clusters (``n_supers > 0``) the
    sweep is ROLLED: a ``fori_loop`` over superclusters of
    ``_DYN_SUPER`` clusters, the whole batch — child cond pass included
    — inside one ``pl.when`` on the super's prologue-computed AABB
    cond.  Trace/compile time becomes O(1) in scene size (the flat
    batch pipeline was Python-unrolled: 50k triangles took >400 s to
    compile and re-traced per process) and the per-iteration cond cost
    drops from O(n_clusters) to O(n_supers) + entered supers.  The
    TPU-native analog of the reference BVH's upper levels
    (gpu_wavefront_pt/src/bvh.rs) on top of the cluster leaves.
    """
    blocks_per_cluster = cluster_size // 8
    assert cluster_size % 8 == 0
    has_tris = n_tri_clusters > 0
    # A 24-column sphere table signals checker-texture columns (16-19,
    # pack_culled_scene); the winner carry then grows to the full
    # 19-field baked interface (tri fields included even without
    # triangles — interface positions are fixed).
    textured = scn_ref.shape[1] >= 20
    nfld = 19 if textured else (15 if has_tris else 11)
    # Winner-attribute packing (pack_culled_scene attrs_packed): the
    # four (albedo rgb, mat) float selects collapse into two int32
    # selects on words bit-punned into table cols 4-5 / 12-13; the
    # carry drops 2 fields (layout: t, cx, cy, cz, ir, pk1, pk2, fz,
    # io, [nx, ny, nz, it], [tex4]) and is decoded back to the legacy
    # 11/15/19-field interface once per call, after the whole sweep.
    if packed_attrs:
        nfld -= 2
    _PKD = 5  # first packed carry slot when packed_attrs (int32)

    def sphere_block(blk, carry, quad):
        # Issue-rate-slimmed quadratic on table columns (see
        # pack_culled_scene.rows), evaluated in the scene-centered
        # frame the table was packed in (cols 10/12-14 are kappa and
        # 2c' around the shift in slab row 1): ``quad`` carries the
        # caller-hoisted per-ray invariants (o' = o - shift, d/2,
        # d.o', |o'|^2) and is REQUIRED — the table columns are in the
        # shifted frame, so world-frame invariants would silently mix
        # frames.  d.c' comes from the 2c' column with the pre-halved
        # direction, so the shift costs nothing per sphere.
        # Directions are unit (a == 1) and a negative discriminant
        # propagates NaN, which never wins a compare.
        oxp, oyp, ozp, hdx, hdy, hdz, dd_o, oo2 = quad
        blki = (jax.lax.bitcast_convert_type(blk, jnp.int32)
                if packed_attrs else None)
        for j in range(8):
            if packed_attrs:
                (best_t, b_cx, b_cy, b_cz, b_ir, b_pk1, b_pk2,
                 b_fz, b_io) = carry[:9]
                rest = carry[9:]
            else:
                (best_t, b_cx, b_cy, b_cz, b_ir, b_ar, b_ag, b_ab,
                 b_fz, b_io, b_mt) = carry[:11]
                rest = carry[11:]
            cx, cy, cz = blk[j, 0], blk[j, 1], blk[j, 2]
            nb = (hdx * blk[j, 12] + hdy * blk[j, 13]
                  + hdz * blk[j, 14]) - dd_o
            c_q = (oo2 + blk[j, 10]) - (oxp * blk[j, 12]
                                        + oyp * blk[j, 13]
                                        + ozp * blk[j, 14])
            disc = nb * nb - c_q
            sq = jnp.sqrt(disc)          # NaN when disc < 0
            t1 = nb - sq
            t2 = nb + sq
            # NaN roots fall through both selects to T_FAR.
            t = jnp.where(t1 > T_MIN, t1, jnp.where(t2 > T_MIN, t2, T_FAR))
            better = t < best_t
            if rest:
                # Triangle normals stay stale (shade ignores them for
                # sphere winners); only the is-triangle flag clears.
                upd = rest[:3] + (jnp.where(better, 0.0, rest[3]),)
                if len(rest) > 4:
                    # Checker-texture winner fields (albedo2 rgb +
                    # scale; scale 0 = plain sphere, never selects).
                    upd = upd + (
                        jnp.where(better, blk[j, 16], rest[4]),
                        jnp.where(better, blk[j, 17], rest[5]),
                        jnp.where(better, blk[j, 18], rest[6]),
                        jnp.where(better, blk[j, 19], rest[7]),
                    )
                rest = upd
            if packed_attrs:
                carry = (
                    jnp.where(better, t, best_t),
                    jnp.where(better, cx, b_cx),
                    jnp.where(better, cy, b_cy),
                    jnp.where(better, cz, b_cz),
                    jnp.where(better, blk[j, 11], b_ir),
                    jnp.where(better, blki[j, 4], b_pk1),
                    jnp.where(better, blki[j, 5], b_pk2),
                    jnp.where(better, blk[j, 7], b_fz),
                    jnp.where(better, blk[j, 8], b_io),
                ) + rest
            else:
                carry = (
                    jnp.where(better, t, best_t),
                    jnp.where(better, cx, b_cx),
                    jnp.where(better, cy, b_cy),
                    jnp.where(better, cz, b_cz),
                    jnp.where(better, blk[j, 11], b_ir),
                    jnp.where(better, blk[j, 4], b_ar),
                    jnp.where(better, blk[j, 5], b_ag),
                    jnp.where(better, blk[j, 6], b_ab),
                    jnp.where(better, blk[j, 7], b_fz),
                    jnp.where(better, blk[j, 8], b_io),
                    jnp.where(better, blk[j, 9], b_mt),
                ) + rest
        return carry

    def tri_block(blk, carry, ox, oy, oz, dx, dy, dz):
        # Two-sided Moller-Trumbore over one 8-triangle block (the
        # dynamic twin of baked_culled_intersect's tri_tests).  NaN
        # padding rows can never win (all compares false).
        blki = (jax.lax.bitcast_convert_type(blk, jnp.int32)
                if packed_attrs else None)
        for j in range(8):
            if packed_attrs:
                (best_t, b_cx, b_cy, b_cz, b_ir, b_pk1, b_pk2,
                 b_fz, b_io, b_nx, b_ny, b_nz, b_it) = carry[:13]
                tex_rest = carry[13:]
            else:
                (best_t, b_cx, b_cy, b_cz, b_ir, b_ar, b_ag, b_ab,
                 b_fz, b_io, b_mt, b_nx, b_ny, b_nz, b_it) = carry[:15]
                tex_rest = carry[15:]
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
            if packed_attrs:
                carry = (
                    jnp.where(better, tt, best_t),
                    b_cx, b_cy, b_cz, b_ir,   # sphere fields stay stale
                    jnp.where(better, blki[j, 12], b_pk1),
                    jnp.where(better, blki[j, 13], b_pk2),
                    jnp.where(better, blk[j, 15], b_fz),
                    jnp.where(better, blk[j, 16], b_io),
                    jnp.where(better, blk[j, 9], b_nx),
                    jnp.where(better, blk[j, 10], b_ny),
                    jnp.where(better, blk[j, 11], b_nz),
                    jnp.where(better, 1.0, b_it),
                )
            else:
                carry = (
                    jnp.where(better, tt, best_t),
                    b_cx, b_cy, b_cz, b_ir,   # sphere fields stay stale
                    jnp.where(better, blk[j, 12], b_ar),
                    jnp.where(better, blk[j, 13], b_ag),
                    jnp.where(better, blk[j, 14], b_ab),
                    jnp.where(better, blk[j, 15], b_fz),
                    jnp.where(better, blk[j, 16], b_io),
                    jnp.where(better, blk[j, 17], b_mt),
                    jnp.where(better, blk[j, 9], b_nx),
                    jnp.where(better, blk[j, 10], b_ny),
                    jnp.where(better, blk[j, 11], b_nz),
                    jnp.where(better, 1.0, b_it),
                )
            if tex_rest:
                # Triangles carry no checker texture: a triangle win
                # must zero the winner's checker scale or a stale
                # sphere scale would modulate the triangle's albedo.
                carry = carry + (
                    tex_rest[0], tex_rest[1], tex_rest[2],
                    jnp.where(better, 0.0, tex_rest[3]),
                )
        return carry

    def intersect(ox, oy, oz, dx, dy, dz, alive=None):
        f32 = jnp.float32
        shape = ox.shape
        idx_ = 1.0 / dx
        idy_ = 1.0 / dy
        idz_ = 1.0 / dz
        # Per-ray quadratic invariants in the scene-centered frame
        # (shift in slab row 1; see pack_culled_scene).
        srow = slab_ref[1]
        oxp = ox - srow[0]
        oyp = oy - srow[1]
        ozp = oz - srow[2]
        quad = (oxp, oyp, ozp, 0.5 * dx, 0.5 * dy, 0.5 * dz,
                dx * oxp + dy * oyp + dz * ozp,
                oxp * oxp + oyp * oyp + ozp * ozp)

        def sphere_block_h(blk, carry, ox, oy, oz, dx, dy, dz):
            return sphere_block(blk, carry, quad)

        def box_range(lo, hi):
            tx0 = (lo[0] - ox) * idx_
            tx1 = (hi[0] - ox) * idx_
            tmin = jnp.minimum(tx0, tx1)
            tmax = jnp.maximum(tx0, tx1)
            ty0 = (lo[1] - oy) * idy_
            ty1 = (hi[1] - oy) * idy_
            tmin = jnp.maximum(tmin, jnp.minimum(ty0, ty1))
            tmax = jnp.minimum(tmax, jnp.maximum(ty0, ty1))
            tz0 = (lo[2] - oz) * idz_
            tz1 = (hi[2] - oz) * idz_
            tmin = jnp.maximum(tmin, jnp.minimum(tz0, tz1))
            tmax = jnp.minimum(tmax, jnp.maximum(tz0, tz1))
            return tmin, tmax

        def slab_cap(sref):
            srow = sref[0]
            s_min, s_max = box_range((srow[0], srow[1], srow[2]),
                                     (srow[3], srow[4], srow[5]))
            t_exit = jnp.where((s_min <= s_max) & (s_max > T_MIN), s_max,
                               jnp.float32(-1.0))
            if alive is not None:
                t_exit = jnp.where(alive, t_exit, -1.0)
            return t_exit

        zero = jnp.zeros(shape, f32)
        if packed_attrs:
            # Packed words 0 decode to (albedo 0,0,0, mat 0) — the
            # same miss attributes as the unpacked init.
            izero = jnp.zeros(shape, jnp.int32)
            init = (
                jnp.full(shape, T_FAR, f32),
                zero, zero, zero, jnp.ones(shape, f32),
                izero, izero, zero, jnp.ones(shape, f32),
            )
        else:
            init = (
                jnp.full(shape, T_FAR, f32),
                zero, zero, zero, jnp.ones(shape, f32),
                zero, zero, zero, zero,
                jnp.ones(shape, f32), zero,
            )
        if has_tris or textured:
            init = init + (zero, zero, jnp.ones(shape, f32), zero)
        if textured:
            init = init + (zero, zero, zero, zero)

        def unpack_carry(vals):
            """Decode the packed int32 words back to the legacy
            11/15/19-field interface order (once per intersect call,
            after the whole sweep — see baked_culled_intersect)."""
            if not packed_attrs:
                return tuple(vals)
            ar, ag, ab, mt = _unpack_albedo_mat(
                (vals[_PKD], vals[_PKD + 1]), "16")
            return (tuple(vals[:5]) + (ar, ag, ab, vals[7], vals[8], mt)
                    + tuple(vals[9:]))

        # Globals (giant spheres): always tested, establishes best_t.
        def g_step(k, carry):
            blk = scn_ref[pl.ds(k * 8, 8), :]
            return sphere_block_h(blk, carry, ox, oy, oz, dx, dy, dz)

        # Unrolled globals pipeline ~1.7x better than a lax loop
        # (exp/micro_r2.py C2 vs C4); the gate bounds code size on
        # giant-global scenes.
        if n_global_blocks <= 2 * _DYN_UNROLL_CLUSTERS:
            carry = init
            for k in range(n_global_blocks):
                carry = g_step(k, carry)
        else:
            carry = jax.lax.fori_loop(0, n_global_blocks, g_step, init)
        if "dyn_dbl_global" in PROBE:  # perf probe: idempotent re-test
            def g_step2(k, c):
                blk = scn_ref[pl.ds(k * 8, 8), :]
                return sphere_block_h(blk + c[0][0, 0] * 0.0, c,
                                      ox, oy, oz, dx, dy, dz)

            carry = jax.lax.fori_loop(0, n_global_blocks, g_step2, carry)
        if n_clusters == 0 and not has_tris:
            return unpack_carry(carry) + (zero, zero)

        n_conds = n_clusters + n_tri_clusters

        def pad8i(n):
            return ((n + 7) // 8) * 8

        n_sup_conds = max(1, pad8i(n_supers) + pad8i(n_tri_supers))

        def body(*refs):
            cond_ref = refs[nfld + 2]
            supcond_ref = refs[nfld + 3]
            for ref, val in zip(refs[:nfld], carry):
                ref[:] = val
            t_ref = refs[0]
            clu_cnt = refs[nfld]
            sup_cnt = refs[nfld + 1]
            clu_cnt[:] = zero
            sup_cnt[:] = zero
            # Traced zero for the perf probes below: defeats CSE on a
            # duplicated component without changing any value.
            zz = t_ref[0, 0] * 0.0

            def cond_batch(base, start, count, aabb_ref, cap):
                # Batched cond pass -> SMEM, CLUSTER-major: 8 clusters
                # on sublanes x 128 rays on lanes, one ray row at a
                # time.  vs the per-cluster ray-major form this
                # replaces 6 scalar extracts per cluster with (8,1)
                # column slices of one block load, and 8 full-tile
                # any() reduces with a single lane-reduce per group
                # (dynprobe measured conds at 26% of iteration time,
                # 2.6x the baked share — the extract/reduce overhead).
                # aabb tables are NaN-padded to a multiple of 8 rows
                # (NaN corners compare false -> never live).  Dynamic
                # tables, so cluster order stays camera-resortable
                # without recompiling.
                nrows = ox.shape[0]
                rows_b = []
                for r in range(nrows):
                    rows_b.append(tuple(
                        jnp.broadcast_to(v[r:r + 1, :], (8, v.shape[1]))
                        for v in (ox, oy, oz, idx_, idy_, idz_, cap)))
                # Groups are aligned down to 8: a re-store into the
                # in-flight previous batch's range uses a *fresher*
                # (tighter) cap, which only culls more and is always
                # conservative-safe; stores never run past the batch.
                reps = 2 if "dyn_dbl_cond" in PROBE else 1
                for g0 in range(start - start % 8, start + count, 8):
                    gn = min(8, start + count - g0)
                    for rep in range(reps):
                        blk = aabb_ref[pl.ds(g0, 8), :]
                        if rep:   # perf probe: CSE-proof recompute
                            blk = blk + zz
                        lo = (blk[:, 0:1], blk[:, 1:2], blk[:, 2:3])
                        hi = (blk[:, 3:4], blk[:, 4:5], blk[:, 5:6])
                        live = None
                        for (ox_r, oy_r, oz_r, ix_r, iy_r, iz_r,
                             cap_r) in rows_b:
                            tx0 = (lo[0] - ox_r) * ix_r
                            tx1 = (hi[0] - ox_r) * ix_r
                            tmin = jnp.minimum(tx0, tx1)
                            tmax = jnp.maximum(tx0, tx1)
                            ty0 = (lo[1] - oy_r) * iy_r
                            ty1 = (hi[1] - oy_r) * iy_r
                            tmin = jnp.maximum(tmin,
                                               jnp.minimum(ty0, ty1))
                            tmax = jnp.minimum(tmax,
                                               jnp.maximum(ty0, ty1))
                            tz0 = (lo[2] - oz_r) * iz_r
                            tz1 = (hi[2] - oz_r) * iz_r
                            tmin = jnp.maximum(tmin,
                                               jnp.minimum(tz0, tz1))
                            tmax = jnp.minimum(tmax,
                                               jnp.maximum(tz0, tz1))
                            lv = ((tmin <= tmax) & (tmax > T_MIN)
                                  & (jnp.maximum(tmin, 0.0) < cap_r))
                            live = lv if live is None else (live | lv)
                        any8 = jnp.max(
                            jnp.where(live, 1, 0).astype(jnp.int32),
                            axis=1, keepdims=True)          # (8, 1)
                        for j in range(gn):
                            cond_ref[base + g0 + j] = any8[j, 0]

            def sweep(n, base, table_ref, row0, block_fn, bpc,
                      aabb_ref, sref, refresh: int = 16):
                # Pipelined consensus with cap refresh, as in the baked
                # sweep: batch k+1's conds are recomputed from the
                # RUNNING best_t (tightened by batches <= k-1) and their
                # reduces issued before batch k's cluster tests run, so
                # the scalars have retired by the time they gate.  With
                # the tables' front-to-back order a primary hit in an
                # early batch culls everything behind it — without this
                # the dynamic path tested every cluster the *initial*
                # cap allowed, which is most of them.
                t_exit = slab_cap(sref)
                batches = [(s, min(refresh, n - s))
                           for s in range(0, n, refresh)]
                cond_batch(base, 0, batches[0][1], aabb_ref,
                           jnp.minimum(t_ref[:], t_exit))
                for bi, (s, ln) in enumerate(batches):
                    if bi + 1 < len(batches):
                        s2, ln2 = batches[bi + 1]
                        cond_batch(base, s2, ln2, aabb_ref,
                                   jnp.minimum(t_ref[:], t_exit))

                    def cluster_step(k, x=None):
                        if "dyn_split_entry" in PROBE and bpc > 1:
                            # perf probe: one extra pl.when boundary
                            # (plus its ref restage) per entered
                            # cluster — the blocks split across two
                            # whens with the same cond.
                            for b0, b1 in ((0, 1), (1, bpc)):
                                @pl.when(cond_ref[base + k] > 0)
                                def _(b0=b0, b1=b1):
                                    if b0 == 0:
                                        clu_cnt[:] = clu_cnt[:] + 1.0
                                    vals = tuple(r[:] for r in refs[:nfld])
                                    for b in range(b0, b1):
                                        blk = table_ref[
                                            pl.ds(row0 + k * cluster_size
                                                  + b * 8, 8), :]
                                        vals = block_fn(blk, vals, ox, oy,
                                                        oz, dx, dy, dz)
                                    for ref, val in zip(refs, vals):
                                        ref[:] = val
                            return x

                        @pl.when(cond_ref[base + k] > 0)
                        def _():
                            clu_cnt[:] = clu_cnt[:] + 1.0
                            vals = tuple(r[:] for r in refs[:nfld])
                            for b in range(bpc):
                                blk = table_ref[
                                    pl.ds(row0 + k * cluster_size
                                          + b * 8, 8), :]
                                vals = block_fn(blk, vals, ox, oy, oz,
                                                dx, dy, dz)
                            if "dyn_dbl_entry" in PROBE:  # perf probe:
                                # idempotent re-test (table shifted by a
                                # traced zero defeats CSE; equal t never
                                # wins the strict < select)
                                for b in range(bpc):
                                    blk = table_ref[
                                        pl.ds(row0 + k * cluster_size
                                              + b * 8, 8), :]
                                    vals = block_fn(blk + zz, vals, ox,
                                                    oy, oz, dx, dy, dz)
                            for ref, val in zip(refs, vals):
                                ref[:] = val
                            if "dyn_dbl_refs" in PROBE:  # perf probe:
                                # double the per-cluster ref restage
                                for ref in refs[:nfld]:
                                    if ref.dtype == jnp.int32:
                                        ref[:] = ref[:] + (
                                            zz).astype(jnp.int32)
                                    else:
                                        ref[:] = ref[:] * 1.0 + zz
                        return x

                    # A lax cluster loop costs ~1.7x in pair rate (no
                    # cross-iteration software pipelining: micro C2 22.6
                    # vs C4 38.3 Gpairs/s, exp/micro_r2.py) — unroll it
                    # statically where code size allows.  The table
                    # VALUES stay runtime inputs either way, so scene
                    # edits of the same structure never recompile; only
                    # above the gate does the kernel fall back to the
                    # compact-code fori_loop (10k spheres would unroll
                    # to baked-scale compile times).
                    if n <= _DYN_UNROLL_CLUSTERS:
                        for k in range(s, s + ln):
                            cluster_step(k)
                    else:
                        jax.lax.fori_loop(s, s + ln, cluster_step,
                                          jnp.float32(0))

            def cap_rows(cap):
                # Per-tile-row broadcasts of the ray/cap planes for the
                # cluster-major cond passes: sublanes carry 8 AABBs,
                # lanes carry the 128 rays of one tile row at a time.
                return [tuple(
                    jnp.broadcast_to(v[r:r + 1, :], (8, v.shape[1]))
                    for v in (ox, oy, oz, idx_, idy_, idz_, cap))
                    for r in range(ox.shape[0])]

            def cond_group(aabb_ref, g0, rows_bc, shift=None):
                # Consensus conds for the 8 AABBs at rows [g0, g0+8)
                # (g0 may be traced) -> (8, 1) int32.  NaN padding rows
                # compare false on every lane.  ``shift`` is the
                # dyn_dbl_cond probe's CSE-defeating traced zero.
                blk = aabb_ref[pl.ds(g0, 8), :]
                if shift is not None:
                    blk = blk + shift
                lo = (blk[:, 0:1], blk[:, 1:2], blk[:, 2:3])
                hi = (blk[:, 3:4], blk[:, 4:5], blk[:, 5:6])
                live = None
                for (ox_r, oy_r, oz_r, ix_r, iy_r, iz_r,
                     cap_r) in rows_bc:
                    tx0 = (lo[0] - ox_r) * ix_r
                    tx1 = (hi[0] - ox_r) * ix_r
                    tmin = jnp.minimum(tx0, tx1)
                    tmax = jnp.maximum(tx0, tx1)
                    ty0 = (lo[1] - oy_r) * iy_r
                    ty1 = (hi[1] - oy_r) * iy_r
                    tmin = jnp.maximum(tmin, jnp.minimum(ty0, ty1))
                    tmax = jnp.minimum(tmax, jnp.maximum(ty0, ty1))
                    tz0 = (lo[2] - oz_r) * iz_r
                    tz1 = (hi[2] - oz_r) * iz_r
                    tmin = jnp.maximum(tmin, jnp.minimum(tz0, tz1))
                    tmax = jnp.minimum(tmax, jnp.maximum(tz0, tz1))
                    lv = ((tmin <= tmax) & (tmax > T_MIN)
                          & (jnp.maximum(tmin, 0.0) < cap_r))
                    live = lv if live is None else (live | lv)
                return jnp.max(jnp.where(live, 1, 0).astype(jnp.int32),
                               axis=1, keepdims=True)

            def sweep_super(n_sup, cond_base, sup_base, table_ref,
                            row0, block_fn, bpc, aabb_ref, sup_aabb_ref,
                            sref):
                # Rolled super-gated sweep (see docstring): trace size
                # O(_DYN_SUPER), iteration cost O(n_supers) + entered.
                # Super conds are computed in 8-super batches *inside*
                # the walk, each batch from the RUNNING cap (round-3
                # advisor finding: a cap0 prologue left supers behind
                # an early hit entered; this refresh costs the same
                # number of batched cond_group calls).  NaN padding
                # AABBs in the last group compare false -> never live.
                t_exit = slab_cap(sref)

                cond_reps = 2 if "dyn_dbl_cond" in PROBE else 1

                def grp_step(gi, x):
                    cap = jnp.minimum(t_ref[:], t_exit)
                    rc = cap_rows(cap)
                    for rep in range(cond_reps):
                        any8 = cond_group(sup_aabb_ref, gi * 8, rc,
                                          shift=zz if rep else None)
                        for j in range(8):
                            supcond_ref[sup_base + gi * 8 + j] = any8[j, 0]
                    for j in range(8):
                        batch_step(gi * 8 + j)
                    return x

                def batch_step(bi):
                    @pl.when(supcond_ref[sup_base + bi] > 0)
                    def _():
                        sup_cnt[:] = sup_cnt[:] + 1.0
                        # Child conds from the RUNNING cap (tightened
                        # by every earlier entered super): with supers
                        # in front-to-back order an early hit still
                        # culls the clusters behind it.
                        cap = jnp.minimum(t_ref[:], t_exit)
                        rb = cap_rows(cap)
                        k0 = bi * _DYN_SUPER
                        for rep in range(cond_reps):
                            for gi in range(_DYN_SUPER // 8):
                                any8 = cond_group(
                                    aabb_ref, k0 + gi * 8, rb,
                                    shift=zz if rep else None)
                                for j in range(8):
                                    cond_ref[cond_base + k0
                                             + gi * 8 + j] = any8[j, 0]
                        for j in range(_DYN_SUPER):
                            @pl.when(cond_ref[cond_base + k0 + j] > 0)
                            def _(j=j):
                                clu_cnt[:] = clu_cnt[:] + 1.0
                                vals = tuple(r[:] for r in refs[:nfld])
                                for b in range(bpc):
                                    blk = table_ref[
                                        pl.ds(row0
                                              + (k0 + j) * cluster_size
                                              + b * 8, 8), :]
                                    vals = block_fn(blk, vals, ox, oy,
                                                    oz, dx, dy, dz)
                                if "dyn_dbl_entry" in PROBE:
                                    # perf probe: idempotent re-test
                                    # (traced-zero shift defeats CSE;
                                    # equal t never wins the strict <)
                                    for b in range(bpc):
                                        blk = table_ref[
                                            pl.ds(row0
                                                  + (k0 + j)
                                                  * cluster_size
                                                  + b * 8, 8), :]
                                        vals = block_fn(blk + zz, vals,
                                                        ox, oy, oz,
                                                        dx, dy, dz)
                                for ref, val in zip(refs, vals):
                                    ref[:] = val

                jax.lax.fori_loop(0, (n_sup + 7) // 8, grp_step,
                                  jnp.float32(0))

            if n_clusters:
                if n_supers:
                    sweep_super(n_supers, 0, 0, scn_ref,
                                n_global_blocks * 8, sphere_block_h,
                                blocks_per_cluster, clu_ref, sup_ref,
                                slab_ref)
                else:
                    sweep(n_clusters, 0, scn_ref, n_global_blocks * 8,
                          sphere_block_h, blocks_per_cluster, clu_ref,
                          slab_ref)
            if has_tris:
                if n_tri_supers:
                    sweep_super(n_tri_supers, n_clusters,
                                pad8i(n_supers), tri_ref, 0, tri_block,
                                blocks_per_cluster, tri_clu_ref,
                                tri_sup_ref, tri_slab_ref)
                else:
                    sweep(n_tri_clusters, n_clusters, tri_ref, 0,
                          tri_block, blocks_per_cluster, tri_clu_ref,
                          tri_slab_ref)
            return tuple(r[:] for r in refs[:nfld + 2])

        out = pl.run_scoped(
            body,
            *[pltpu.VMEM(shape,
                         jnp.int32
                         if packed_attrs and _PKD <= i < _PKD + 2
                         else jnp.float32)
              for i in range(nfld + 2)],
            pltpu.SMEM((n_conds,), jnp.int32),
            pltpu.SMEM((n_sup_conds,), jnp.int32),
        )
        # (nfld fields, clusters_entered, supers_entered) -> interface
        # order (..., supers_entered, clusters_entered).
        return unpack_carry(out[:nfld]) + (out[nfld + 1], out[nfld])

    intersect.returns_cull_stats = True
    intersect.has_textures = textured
    intersect.n_supers = n_supers + n_tri_supers
    intersect.n_clusters = n_clusters
    return intersect


def make_persistent_tile(intersect_fn=None, rotate: bool = True,
                         rotate_cols: int = 1, rr_start: int = 0,
                         rr_floor: float = 0.05, clamp: float = 0.0,
                         sampler: str = "random"):
    """Build the persistent-lane kernel.

    With ``intersect_fn=None`` the kernel takes (scn_ref, nsph_ref)
    inputs and runs the dynamic sphere loop; with a baked intersect
    function those inputs are dropped and the scene is in the code.
    """
    baked = intersect_fn is not None

    def kernel(*refs):
        if baked:
            (salt_ref, cam_ref, px_ref, xs_ref, ys_ref, valid_ref, soff_ref,
             rad_r_o, rad_g_o, rad_b_o, rays_o) = refs
            intersect = intersect_fn
        else:
            (scn_ref, nsph_ref, salt_ref, cam_ref, px_ref, xs_ref, ys_ref,
             valid_ref, soff_ref, rad_r_o, rad_g_o, rad_b_o, rays_o) = refs
            n_spheres = nsph_ref[0, 0]

            def intersect(ox, oy, oz, dx, dy, dz):
                return _intersect_tile(scn_ref, n_spheres, ox, oy, oz, dx, dy, dz)

        _persistent_impl(intersect, salt_ref, cam_ref, px_ref, xs_ref,
                         ys_ref, valid_ref, soff_ref,
                         rad_r_o, rad_g_o, rad_b_o, rays_o, rotate=rotate,
                         rotate_cols=rotate_cols, rr_start=rr_start,
                         rr_floor=rr_floor, clamp=clamp, sampler=sampler)

    return kernel


def _persistent_impl(
    intersect_fn,
    salt_ref,      # (1, 4) u32 SMEM: frame, sample_base, max_bounces,
                   # n_samples *per lane* (see lane_split)
    cam_ref,       # (1, 24) f32 VMEM camera params (see _raygen_tile)
    px_ref,        # (rows, 128) u32
    xs_ref, ys_ref,  # (rows, 128) f32 pixel coordinates
    valid_ref,     # (rows, 128) f32: 1 for real pixels, 0 for padding
    soff_ref,      # (rows, 128) u32 per-lane sample offset (lane_split)
    rad_r_o, rad_g_o, rad_b_o, rays_o,  # (rows, 128) f32
    rotate: bool = True,
    rotate_cols: int = 1,
    rr_start: int = 0,
    rr_floor: float = 0.05,
    clamp: float = 0.0,
    sampler: str = "random",
):
    """Persistent-lane megakernel body: renders ALL samples of a tile.

    Unlike a lockstep per-sample bounce loop — where one straggler path
    keeps 1023 dead lanes paying for the scene loop — every lane here
    starts its own next sample the moment its path terminates (in-kernel
    raygen; RNG streams are per (pixel, sample, bounce), so lanes are
    independent by construction).

    **Sample rotation** (``rotate``): a lane bound to one pixel does
    that pixel's whole sample budget — so a tile's makespan is its
    heaviest *pixel* (long glass paths), measured as 1.75x idle lane
    time at the 1080p headline.  Instead, lane (r, c)'s k-th sample
    traces the pixel of lane ((r+k) % rows, c): each lane's work
    averages over ``rows`` pixels of the same coherent block (culling
    consensus is unaffected).  The rotated pixel planes are static
    sublane rolls selected by ``s_lane & (rows-1)`` — no gathers — and
    radiance lands in offset-indexed accumulators that a final static
    roll-sum maps back to pixel order.  Every (pixel, sample) RNG
    stream is identical either way; only summation order changes.
    Rotation needs a full tile (padding lanes would trace garbage), so
    it degrades to the static binding when any lane is invalid.

    ``rotate_cols`` > 1 extends the offsets to the lane (column)
    dimension: a tile row holds 4 image rows x 32 columns, so row
    rotation alone never varies a lane's image *column* and a
    vertically coherent hotspot (a sphere silhouette) keeps its column
    lanes hot.  With n_c column phases the k-th sample also rolls lanes
    by ``(k // rows) % n_c * (32 // n_c)`` — shifting the image column
    by 16 (n_c=2), 8 (n_c=4), ... — at the cost of n_c x more
    accumulator planes and selects.
    """
    frame = salt_ref[0, 0]
    sample_base = salt_ref[0, 1]
    max_bounces = salt_ref[0, 2]
    n_samples = salt_ref[0, 3]
    pix = px_ref[:]
    xs = xs_ref[:]
    ys = ys_ref[:]
    soff = soff_ref[:]
    valid = valid_ref[:] > 0
    shape = pix.shape
    has_stats = getattr(intersect_fn, "returns_cull_stats", False)
    has_tex = getattr(intersect_fn, "has_textures", False)
    has_key = getattr(intersect_fn, "returns_winner_key", False)
    # Rotation depth: tile rows (power of two required by the & mask)
    # times the column phases.
    n_r = shape[0] if (rotate and shape[0] & (shape[0] - 1) == 0) else 1
    n_c = rotate_cols if (n_r > 1 and rotate_cols > 1
                          and rotate_cols & (rotate_cols - 1) == 0
                          and 32 % rotate_cols == 0) else 1
    offsets = [(dr, mc * (32 // n_c))
               for mc in range(n_c) for dr in range(n_r)]
    n_off = len(offsets)
    # Whole-tile validity gate, resolved once (scalar).
    rot_on = jnp.min(valid_ref[:]) > 0 if n_off > 1 else False

    zeros = jnp.zeros(shape, jnp.float32)
    u0 = jnp.zeros(shape, jnp.uint32)
    # s_lane: per-lane sample counter; padding lanes start exhausted.
    s0 = jnp.where(valid, u0, jnp.broadcast_to(n_samples, shape))
    state0 = (
        s0, u0,                       # s_lane, bounce_lane
        zeros, zeros, zeros,          # origin
        zeros, zeros, jnp.ones(shape, jnp.float32),  # direction (unit-ish)
        zeros, zeros, zeros,          # throughput
        zeros,                        # alive (f32; all start dead -> raygen)
    ) + (zeros,) * (3 * n_off) + (   # radiance accum, per offset
        jnp.float32(0.0),             # live-ray count
        jnp.float32(0.0),             # bounce-loop iterations
        zeros, zeros,                 # cull stats: supers/clusters entered
    ) + (
        # Winner-hint feedback plane: last winner-cluster id per lane
        # (-1 = none); persists across sample restarts — the previous
        # sample's primary winner is a strong hint for the same pixel.
        (jnp.full(shape, -1.0, jnp.float32),) if has_key else ()
    )
    NRAYS = 12 + 3 * n_off

    def cond(c):
        s_lane, alive_f = c[0], c[11]
        pending = jnp.where(s_lane < n_samples, 1.0, 0.0)
        tot = jnp.sum(pending) + jnp.sum(alive_f)
        if "dbl_loopcond" in PROBE:  # perf probe: CSE-proof recompute
            niter = c[NRAYS + 1]
            tot = 0.5 * (tot + jnp.sum(pending + niter * 0.0)
                         + jnp.sum(alive_f + niter * 0.0))
        return tot > 0.0

    def body(c):
        (s_lane, bounce, ox, oy, oz, dx, dy, dz, tr, tg, tb, alive_f) = c[:12]
        accs = list(c[12:NRAYS])
        nrays, niter, sup_acc, clu_acc = c[NRAYS:NRAYS + 4]
        hint = c[NRAYS + 4] if has_key else None
        alive = alive_f > 0

        # Offset masks + rotated pixel identity (see docstring).
        if n_off > 1:
            s7 = jnp.where(rot_on, s_lane & _u32(n_r - 1), u0)
            mrow = [s7 == _u32(m) for m in range(n_r)]
            if n_c > 1:
                shift_r = n_r.bit_length() - 1
                sc = jnp.where(rot_on,
                               (s_lane >> _u32(shift_r)) & _u32(n_c - 1),
                               u0)
                mcol = [sc == _u32(m) for m in range(n_c)]
                masks = [mrow[dr] & mcol[o // n_r]
                         for o, (dr, _dc) in enumerate(offsets)]
            else:
                masks = mrow

            def pick(p):
                # out[lane] = p[lane + offset] for the lane's (dr, dc).
                out = p
                for o in range(1, n_off):
                    dr, dc = offsets[o]
                    q = jnp.roll(p, -dr, axis=0) if dr else p
                    if dc:
                        q = jnp.roll(q, -dc, axis=1)
                    out = jnp.where(masks[o], q, out)
                return out

            # soff rotates WITH the pixel identity: under lane_split a
            # tile can straddle a split-replica boundary (soff varies
            # within a fully-valid tile), and the (pixel, sample)
            # stream being traced belongs to the source lane slot —
            # rotating pix but not soff would trace some streams twice
            # and others never.
            pix_c, xs_c, ys_c, soff_c = (pick(pix), pick(xs), pick(ys),
                                         pick(soff))
            if "dbl_rotpick" in PROBE:  # perf probe: CSE-proof recompute
                z = (s_lane - s_lane).astype(pix.dtype)
                p2 = (pick(pix + z), pick(xs), pick(ys), pick(soff))
                pix_c = jnp.maximum(pix_c, p2[0])
                xs_c, ys_c, soff_c = p2[1], p2[2], p2[3]
        else:
            masks = [None]
            pix_c, xs_c, ys_c, soff_c = pix, xs, ys, soff

        # Restart finished lanes on their next sample.
        start = (~alive) & (s_lane < n_samples)
        sample = sample_base + soff_c + s_lane
        gox, goy, goz, gdx, gdy, gdz = _raygen_tile(
            xs_c, ys_c, pix_c, frame, sample, cam_ref, sampler=sampler)
        if "dbl_raygen" in PROBE:  # perf probe: CSE-proof recompute
            g2 = _raygen_tile(xs_c + (niter * 0.0), ys_c, pix_c, frame,
                              sample, cam_ref)
            gox, goy, goz, gdx, gdy, gdz = [
                0.5 * (a + b)
                for a, b in zip((gox, goy, goz, gdx, gdy, gdz), g2)]
        ox = jnp.where(start, gox, ox)
        oy = jnp.where(start, goy, oy)
        oz = jnp.where(start, goz, oz)
        dx = jnp.where(start, gdx, dx)
        dy = jnp.where(start, gdy, dy)
        dz = jnp.where(start, gdz, dz)
        tr = jnp.where(start, 1.0, tr)
        tg = jnp.where(start, 1.0, tg)
        tb = jnp.where(start, 1.0, tb)
        bounce = jnp.where(start, u0, bounce)
        alive = alive | start
        nrays = nrays + jnp.sum(jnp.where(alive, 1.0, 0.0))

        # Culling intersectors take the alive mask so dead lanes don't
        # veto whole-tile cluster skips (and the tile tail speeds up).
        if has_key:
            res = intersect_fn(ox, oy, oz, dx, dy, dz, alive=alive,
                               hint=hint)
        elif "alive" in inspect.signature(intersect_fn).parameters:
            res = intersect_fn(ox, oy, oz, dx, dy, dz, alive=alive)
        else:
            res = intersect_fn(ox, oy, oz, dx, dy, dz)
        (best_t, b_cx, b_cy, b_cz, b_inv_r, b_ar, b_ag, b_ab,
         b_fuzz, b_ior, b_mt) = res[:11]
        if has_stats:
            sup_acc = sup_acc + res[-2]
            clu_acc = clu_acc + res[-1]
            res = res[:-2]
        if has_key:
            hint = res[-1]
            res = res[:-1]
        tri_fields = res[11:15] if len(res) > 11 else (None, None, None, None)
        tex_fields = res[15:19] if has_tex else None
        niter = niter + 1.0

        hit = (best_t < T_FAR) & alive
        missed = alive & ~hit
        sky_a = 0.5 * (dy + 1.0)
        con_r = tr * ((1.0 - sky_a) + sky_a * 0.5)
        con_g = tg * ((1.0 - sky_a) + sky_a * 0.7)
        con_b = tb * ((1.0 - sky_a) + sky_a * 1.0)
        if clamp > 0.0:
            # Firefly clamp: the miss event carries the sample's whole
            # radiance, so this is a per-sample componentwise clamp
            # (biased, standard production control; off by default).
            con_r = jnp.minimum(con_r, clamp)
            con_g = jnp.minimum(con_g, clamp)
            con_b = jnp.minimum(con_b, clamp)
        def accumulate_miss(cr, cg, cb):
            for m in range(n_off):
                mm = missed if masks[m] is None else (missed & masks[m])
                accs[m] = accs[m] + jnp.where(mm, cr, 0.0)
                accs[n_off + m] = accs[n_off + m] + jnp.where(mm, cg, 0.0)
                accs[2 * n_off + m] = (accs[2 * n_off + m]
                                       + jnp.where(mm, cb, 0.0))

        if "dbl_accum" in PROBE:  # perf probe: CSE-proof half+half
            z = niter * 0.0
            accumulate_miss(con_r * 0.5, con_g * 0.5, con_b * 0.5)
            accumulate_miss(con_r * 0.5 + z, con_g * 0.5 + z,
                            con_b * 0.5 + z)
        else:
            accumulate_miss(con_r, con_g, con_b)

        p_x, p_y, p_z, ndx, ndy, ndz = _shade_tile(
            pix_c, frame, sample, bounce, ox, oy, oz, dx, dy, dz,
            best_t, b_cx, b_cy, b_cz, b_inv_r, b_fuzz, b_ior, b_mt,
            *tri_fields)
        if "dbl_shade" in PROBE:  # perf probe: CSE-proof recompute
            s2 = _shade_tile(
                pix_c, frame, sample, bounce, ox + (niter * 0.0), oy, oz,
                dx, dy, dz, best_t, b_cx, b_cy, b_cz, b_inv_r, b_fuzz,
                b_ior, b_mt, *tri_fields)
            (p_x, p_y, p_z, ndx, ndy, ndz) = [
                0.5 * (a + b)
                for a, b in zip((p_x, p_y, p_z, ndx, ndy, ndz), s2)]

        if tex_fields is not None:
            # Checker texture at the hit point (ops/texture.py formula;
            # scale 0 — solid or non-checker winners — never selects).
            a2r, a2g, a2b, t_s = tex_fields
            sel = (jnp.sin(t_s * p_x) * jnp.sin(t_s * p_y)
                   * jnp.sin(t_s * p_z)) < 0.0
            b_ar = jnp.where(sel, a2r, b_ar)
            b_ag = jnp.where(sel, a2g, b_ag)
            b_ab = jnp.where(sel, a2b, b_ab)
        img_texs = getattr(intersect_fn, "image_textures", ())
        if img_texs:
            b_ar, b_ag, b_ab = _apply_image_textures(
                img_texs, hit, b_cx, b_cy, b_cz, b_inv_r, tri_fields[3],
                p_x, p_y, p_z, b_ar, b_ag, b_ab)

        ox = jnp.where(hit, p_x, ox)
        oy = jnp.where(hit, p_y, oy)
        oz = jnp.where(hit, p_z, oz)
        dx = jnp.where(hit, ndx, dx)
        dy = jnp.where(hit, ndy, dy)
        dz = jnp.where(hit, ndz, dz)
        tr = jnp.where(hit, tr * b_ar, tr)
        tg = jnp.where(hit, tg * b_ag, tg)
        tb = jnp.where(hit, tb * b_ab, tb)
        bounce = bounce + _u32(1)
        if rr_start:
            # Russian roulette from surface event rr_start on
            # (unbiased; same independently salted stream as the XLA
            # engines — ops/rng.py:rr_state — so rr-off renders are
            # bit-identical with or without this code).
            rrb = _jenkins(pix_c ^ _jenkins(jnp.broadcast_to(frame, shape)))
            st = _jenkins((rrb + sample * _u32(_SAMPLE_STRIDE)
                           + bounce * _u32(_BOUNCE_STRIDE))
                          ^ _u32(_RR_SALT))
            st, u_rr = _next_f32(st)
            keep_p = jnp.clip(jnp.maximum(tr, jnp.maximum(tg, tb)),
                              jnp.float32(rr_floor), 1.0)
            active = hit & (bounce >= _u32(rr_start))
            survive = (~active) | (u_rr < keep_p)
            comp = active & survive
            inv_p = 1.0 / keep_p
            tr = jnp.where(comp, tr * inv_p, tr)
            tg = jnp.where(comp, tg * inv_p, tg)
            tb = jnp.where(comp, tb * inv_p, tb)
            hit = hit & survive
        # A path dies on miss or at the bounce cap; its lane moves on.
        still_alive = hit & (bounce < max_bounces)
        died = alive & ~still_alive
        s_lane = jnp.where(died, s_lane + _u32(1), s_lane)
        return (s_lane, bounce, ox, oy, oz, dx, dy, dz, tr, tg, tb,
                jnp.where(still_alive, 1.0, 0.0),
                *accs, nrays, niter, sup_acc, clu_acc) + (
                    (hint,) if has_key else ())

    final = jax.lax.while_loop(cond, body, state0)
    accs = final[12:NRAYS]
    if n_off > 1:
        # Offset o of a lane holds the pixel at roll(-dr, -dc): a
        # static roll-sum restores pixel order (rotation-off tiles put
        # everything in offset 0, where the roll is the identity).
        def _roll(x, o):
            # Mosaic rejects the zero-size slice jnp.roll(x, 0) emits.
            dr, dc = offsets[o]
            if dr:
                x = jnp.roll(x, dr, axis=0)
            if dc:
                x = jnp.roll(x, dc, axis=1)
            return x

        rad_r_o[:] = sum(_roll(accs[o], o) for o in range(n_off))
        rad_g_o[:] = sum(_roll(accs[n_off + o], o) for o in range(n_off))
        rad_b_o[:] = sum(_roll(accs[2 * n_off + o], o)
                         for o in range(n_off))
    else:
        rad_r_o[:] = accs[0]
        rad_g_o[:] = accs[1]
        rad_b_o[:] = accs[2]
    # Aux stats plane, row 0 of the tile: col 0 = live rays traced,
    # col 1 = bounce-loop iterations, col 2/3 = superclusters/clusters
    # entered (consensus-cull observability; zeros without culling).
    row_id = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    stats = jnp.where(col_id == 0, final[NRAYS],
                      jnp.where(col_id == 1, final[NRAYS + 1],
                                jnp.where(col_id == 2, final[NRAYS + 2],
                                          jnp.where(col_id == 3,
                                                    final[NRAYS + 3],
                                                    0.0))))
    rays_o[:] = jnp.where(row_id == 0, stats, 0.0)


def _segment_impl(
    intersect_fn,
    salt_ref,      # (1, 4) u32 SMEM: frame, max_bounces, k_iters, unused
    pix_ref,       # (rows, 128) u32 pixel id (RNG stream identity)
    samp_ref,      # (rows, 128) u32 sample index
    bnc_ref,       # (rows, 128) f32 bounce counter (f32: u32 planes
                   # round-trip through jnp.take in the host-side sort)
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tr_ref, tg_ref, tb_ref,
    ar_ref, ag_ref, ab_ref,   # per-ray accumulated radiance (in)
    alive_ref,     # (rows, 128) f32
    o_bnc, o_ox, o_oy, o_oz, o_dx, o_dy, o_dz,
    o_tr, o_tg, o_tb, o_ar, o_ag, o_ab, o_alive,
    rays_o,        # (rows, 128) f32 aux stats plane (see _persistent_impl)
    rr_start: int = 0,
    rr_floor: float = 0.05,
    clamp: float = 0.0,
    sampler: str = "random",
):
    """One re-clustering *segment*: advance every live ray by up to
    ``k_iters`` bounces, then hand the state back to the host-side sort.

    The persistent kernel (:func:`_persistent_impl`) binds a lane to a
    pixel forever, so after the first diffuse bounce a tile's rays
    decohere and whole-tile consensus culling stops skipping anything —
    the measured collapse on large scenes (50k-tri knot: 0.31 Mrays/s,
    most clusters entered every iteration).  The segmented engine
    (models/fused.py ``recluster``) re-sorts live rays by direction
    octant x origin Morton cell between segments, so lanes entering a
    tile again share a frustum.  This kernel is the in-between: the
    same intersect/shade/miss math as _persistent_impl (identical
    per-(pixel,sample,bounce) RNG streams), but state-in/state-out with
    NO in-kernel raygen or sample restart, and a whole-tile early exit
    the moment every lane is dead (a sorted-dead tile costs one loop
    cond).  The reference analog is the extend/shade wavefront with its
    queue compaction (path_tracer.rs:279-371) — here the queue is the
    global ray state and compaction doubles as coherence recovery.
    """
    frame = salt_ref[0, 0]
    max_bounces = salt_ref[0, 1]
    k_iters = salt_ref[0, 2]
    pix = pix_ref[:]
    sample = samp_ref[:]
    shape = pix.shape
    has_stats = getattr(intersect_fn, "returns_cull_stats", False)
    has_tex = getattr(intersect_fn, "has_textures", False)
    u0 = jnp.zeros(shape, jnp.uint32)

    state0 = (
        _u32(0),                                # segment iteration
        # Mosaic has no f32<->u32 casts; round-trip through int32
        # (bounce < 2^31 always, same trick as _next_f32).
        pltpu.bitcast(bnc_ref[:].astype(jnp.int32), jnp.uint32),
        ox_ref[:], oy_ref[:], oz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        tr_ref[:], tg_ref[:], tb_ref[:],
        ar_ref[:], ag_ref[:], ab_ref[:],
        alive_ref[:],
        jnp.float32(0.0),                       # live rays advanced
        jnp.float32(0.0),                       # loop iterations
        jnp.zeros(shape, jnp.float32),          # supers entered
        jnp.zeros(shape, jnp.float32),          # clusters entered
    )

    def cond(c):
        it, alive_f = c[0], c[14]
        return (it < k_iters) & (jnp.sum(alive_f) > 0.0)

    def body(c):
        (it, bounce, ox, oy, oz, dx, dy, dz, tr, tg, tb,
         acc_r, acc_g, acc_b, alive_f, nrays, niter, sup_acc, clu_acc) = c
        alive = alive_f > 0
        nrays = nrays + jnp.sum(jnp.where(alive, 1.0, 0.0))

        if "alive" in inspect.signature(intersect_fn).parameters:
            res = intersect_fn(ox, oy, oz, dx, dy, dz, alive=alive)
        else:
            res = intersect_fn(ox, oy, oz, dx, dy, dz)
        (best_t, b_cx, b_cy, b_cz, b_inv_r, b_ar, b_ag, b_ab,
         b_fuzz, b_ior, b_mt) = res[:11]
        if has_stats:
            sup_acc = sup_acc + res[-2]
            clu_acc = clu_acc + res[-1]
            res = res[:-2]
        tri_fields = res[11:15] if len(res) > 11 else (None, None, None, None)
        tex_fields = res[15:19] if has_tex else None
        niter = niter + 1.0

        hit = (best_t < T_FAR) & alive
        missed = alive & ~hit
        sky_a = 0.5 * (dy + 1.0)
        con_r = tr * ((1.0 - sky_a) + sky_a * 0.5)
        con_g = tg * ((1.0 - sky_a) + sky_a * 0.7)
        con_b = tb * ((1.0 - sky_a) + sky_a * 1.0)
        if clamp > 0.0:
            con_r = jnp.minimum(con_r, clamp)
            con_g = jnp.minimum(con_g, clamp)
            con_b = jnp.minimum(con_b, clamp)
        acc_r = acc_r + jnp.where(missed, con_r, 0.0)
        acc_g = acc_g + jnp.where(missed, con_g, 0.0)
        acc_b = acc_b + jnp.where(missed, con_b, 0.0)

        p_x, p_y, p_z, ndx, ndy, ndz = _shade_tile(
            pix, frame, sample, bounce, ox, oy, oz, dx, dy, dz,
            best_t, b_cx, b_cy, b_cz, b_inv_r, b_fuzz, b_ior, b_mt,
            *tri_fields)

        if tex_fields is not None:
            a2r, a2g, a2b, t_s = tex_fields
            sel = (jnp.sin(t_s * p_x) * jnp.sin(t_s * p_y)
                   * jnp.sin(t_s * p_z)) < 0.0
            b_ar = jnp.where(sel, a2r, b_ar)
            b_ag = jnp.where(sel, a2g, b_ag)
            b_ab = jnp.where(sel, a2b, b_ab)
        img_texs = getattr(intersect_fn, "image_textures", ())
        if img_texs:
            b_ar, b_ag, b_ab = _apply_image_textures(
                img_texs, hit, b_cx, b_cy, b_cz, b_inv_r, tri_fields[3],
                p_x, p_y, p_z, b_ar, b_ag, b_ab)

        ox = jnp.where(hit, p_x, ox)
        oy = jnp.where(hit, p_y, oy)
        oz = jnp.where(hit, p_z, oz)
        dx = jnp.where(hit, ndx, dx)
        dy = jnp.where(hit, ndy, dy)
        dz = jnp.where(hit, ndz, dz)
        tr = jnp.where(hit, tr * b_ar, tr)
        tg = jnp.where(hit, tg * b_ag, tg)
        tb = jnp.where(hit, tb * b_ab, tb)
        bounce = bounce + _u32(1)
        if rr_start:
            rrb = _jenkins(pix ^ _jenkins(jnp.broadcast_to(frame, shape)))
            st = _jenkins((rrb + sample * _u32(_SAMPLE_STRIDE)
                           + bounce * _u32(_BOUNCE_STRIDE))
                          ^ _u32(_RR_SALT))
            st, u_rr = _next_f32(st)
            keep_p = jnp.clip(jnp.maximum(tr, jnp.maximum(tg, tb)),
                              jnp.float32(rr_floor), 1.0)
            active = hit & (bounce >= _u32(rr_start))
            survive = (~active) | (u_rr < keep_p)
            comp = active & survive
            inv_p = 1.0 / keep_p
            tr = jnp.where(comp, tr * inv_p, tr)
            tg = jnp.where(comp, tg * inv_p, tg)
            tb = jnp.where(comp, tb * inv_p, tb)
            hit = hit & survive
        still_alive = hit & (bounce < max_bounces)
        return (it + _u32(1), bounce, ox, oy, oz, dx, dy, dz, tr, tg, tb,
                acc_r, acc_g, acc_b,
                jnp.where(still_alive, 1.0, 0.0),
                nrays, niter, sup_acc, clu_acc)

    final = jax.lax.while_loop(cond, body, state0)
    (_, bounce, ox, oy, oz, dx, dy, dz, tr, tg, tb,
     acc_r, acc_g, acc_b, alive_f, nrays, niter, sup_acc, clu_acc) = final
    o_bnc[:] = pltpu.bitcast(bounce, jnp.int32).astype(jnp.float32)
    o_ox[:] = ox
    o_oy[:] = oy
    o_oz[:] = oz
    o_dx[:] = dx
    o_dy[:] = dy
    o_dz[:] = dz
    o_tr[:] = tr
    o_tg[:] = tg
    o_tb[:] = tb
    o_ar[:] = acc_r
    o_ag[:] = acc_g
    o_ab[:] = acc_b
    o_alive[:] = alive_f
    row_id = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    stats = jnp.where(col_id == 0, nrays,
                      jnp.where(col_id == 1, niter,
                                jnp.where(col_id == 2, sup_acc,
                                          jnp.where(col_id == 3,
                                                    clu_acc, 0.0))))
    rays_o[:] = jnp.where(row_id == 0, stats, 0.0)


_SEG_STATE = 14  # bounce, o xyz, d xyz, throughput rgb, radiance rgb, alive


def _segment_call(kernel, pix, samp, state, rows, interpret):
    total_rows = pix.shape[0]
    assert total_rows % rows == 0
    grid = (total_rows // rows,)
    tile_spec = pl.BlockSpec((rows, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    smem_i = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_i] + [tile_spec] * (2 + _SEG_STATE),
        out_specs=[tile_spec] * (_SEG_STATE + 1),
        out_shape=[jax.ShapeDtypeStruct((total_rows, 128), f32)]
        * (_SEG_STATE + 1),
        interpret=interpret,
        # 29 tiled state planes + whole scene tables: XLA additionally
        # parks small inter-segment state arrays in VMEM around the
        # call, overflowing the default 16 MB scoped budget (v5e has
        # 128 MB).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


@functools.partial(
    jax.jit,
    static_argnames=("baked_fn", "rows", "interpret", "rr_start",
                     "rr_floor", "clamp", "sampler"))
def fused_segment_baked(
    baked_fn,
    salts,          # (4,) u32: frame, max_bounces, k_iters, 0
    pix, samp,      # (rows_total, 128) u32
    state,          # tuple of _SEG_STATE (rows_total, 128) f32 planes
    rows: int = 8,
    interpret: bool = False,
    rr_start: int = 0,
    rr_floor: float = 0.05,
    clamp: float = 0.0,
    sampler: str = "random",
):
    """One segment with the scene baked into the kernel.  Returns
    (state', rays_aux)."""

    def kernel(*refs):
        _segment_impl(baked_fn, *refs, rr_start=rr_start,
                      rr_floor=rr_floor, clamp=clamp, sampler=sampler)

    outs = _segment_call(kernel, pix, samp, state, rows, interpret)(
        jnp.reshape(salts.astype(jnp.uint32), (1, 4)), pix, samp, *state)
    return tuple(outs[:_SEG_STATE]), outs[_SEG_STATE]


@functools.partial(
    jax.jit,
    static_argnames=("n_global_blocks", "n_clusters", "n_supers",
                     "n_tri_clusters", "n_tri_supers", "cluster_size",
                     "rows", "interpret", "rr_start", "rr_floor", "clamp",
                     "sampler", "image_luts", "probe", "packed_attrs"))
def fused_segment_dynculled(
    scn, clu, sup, slab, tri, tri_clu, tri_sup, tri_slab,
    salts, pix, samp, state,
    n_global_blocks: int = 1,
    n_clusters: int = 0,
    n_supers: int = 0,
    n_tri_clusters: int = 0,
    n_tri_supers: int = 0,
    cluster_size: int = 16,
    rows: int = 8,
    interpret: bool = False,
    rr_start: int = 0,
    rr_floor: float = 0.05,
    clamp: float = 0.0,
    sampler: str = "random",
    image_luts: tuple = (),
    probe: frozenset = frozenset(),
    packed_attrs: bool = False,
):
    """One segment with the dynamic consensus-culled intersector.

    ``probe`` must equal the module-global PROBE at call time: the
    kernel reads PROBE at trace time, and this static arg is what keys
    the jit cache so stage-timing variants can't collide (the baked
    path gets this for free from its per-variant closure identity)."""

    def kernel(scn_ref, clu_ref, sup_ref, slab_ref, tri_ref, tri_clu_ref,
               tri_sup_ref, tri_slab_ref, *refs):
        intersect = make_dynamic_culled_intersect(
            scn_ref, clu_ref, slab_ref, n_global_blocks, n_clusters,
            cluster_size, tri_ref=tri_ref, tri_clu_ref=tri_clu_ref,
            tri_slab_ref=tri_slab_ref, n_tri_clusters=n_tri_clusters,
            sup_ref=sup_ref, n_supers=n_supers,
            tri_sup_ref=tri_sup_ref, n_tri_supers=n_tri_supers,
            packed_attrs=packed_attrs)
        if image_luts:
            intersect.image_textures = tuple(
                (cx, cy, cz, inv_r,
                 np.frombuffer(raw, np.float32).reshape(h, w, 3))
                for cx, cy, cz, inv_r, h, w, raw in image_luts)
        _segment_impl(intersect, *refs, rr_start=rr_start,
                      rr_floor=rr_floor, clamp=clamp, sampler=sampler)

    total_rows = pix.shape[0]
    assert total_rows % rows == 0
    grid = (total_rows // rows,)
    tile_spec = pl.BlockSpec((rows, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_i = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full] * 8 + [smem_i] + [tile_spec] * (2 + _SEG_STATE),
        out_specs=[tile_spec] * (_SEG_STATE + 1),
        out_shape=[jax.ShapeDtypeStruct((total_rows, 128), f32)]
        * (_SEG_STATE + 1),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(  # see _segment_call
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        scn, clu, sup, slab, tri, tri_clu, tri_sup, tri_slab,
        jnp.reshape(salts.astype(jnp.uint32), (1, 4)), pix, samp, *state)
    return tuple(outs[:_SEG_STATE]), outs[_SEG_STATE]


@functools.partial(
    jax.jit,
    static_argnames=("rows", "interpret", "rotate", "rotate_cols",
                     "rr_start", "rr_floor", "clamp", "sampler"))
def fused_render_persistent(
    scene_packed,   # (S, 16) f32
    n_spheres,      # i32 scalar
    salts,          # (4,) u32: frame, sample_base, max_bounces, n_samples/lane
    cam_params,     # (24,) f32
    pix, xs, ys, valid, soff,  # (rows_total, 128)
    rows: int = 8,
    interpret: bool = False,
    rotate: bool = True,
    rotate_cols: int = 1,
    rr_start: int = 0,
    rr_floor: float = 0.05,
    clamp: float = 0.0,
    sampler: str = "random",
):
    """All samples x all bounces, persistent lanes, one Pallas call.

    Returns (rad_r, rad_g, rad_b, rays_aux), each (rows_total, 128);
    rays_aux row 0 of each tile holds [rays, iterations, supers_entered,
    clusters_entered] in cols 0-3 (see _persistent_impl).
    """
    total_rows = pix.shape[0]
    assert total_rows % rows == 0
    grid = (total_rows // rows,)

    tile_spec = pl.BlockSpec((rows, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_i = pl.BlockSpec(memory_space=pltpu.SMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        make_persistent_tile(rotate=rotate, rotate_cols=rotate_cols,
                             rr_start=rr_start, rr_floor=rr_floor,
                             clamp=clamp, sampler=sampler),
        grid=grid,
        in_specs=[full, smem_i, smem_i, full,
                  tile_spec, tile_spec, tile_spec, tile_spec, tile_spec],
        out_specs=[tile_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((total_rows, 128), f32)] * 4,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(  # large baked scenes /
            vmem_limit_bytes=100 * 1024 * 1024),  # image LUTs > 16M stack
    )(
        scene_packed,
        jnp.reshape(n_spheres.astype(jnp.int32), (1, 1)),
        jnp.reshape(salts.astype(jnp.uint32), (1, 4)),
        jnp.reshape(cam_params.astype(f32), (1, 24)),
        pix, xs, ys, valid, soff,
    )
    return outs


@functools.partial(
    jax.jit,
    static_argnames=("baked_fn", "rows", "interpret", "rotate",
                     "rotate_cols", "rr_start", "rr_floor", "clamp",
                     "sampler"),
)
def fused_render_baked(
    baked_fn,       # hashable intersect closure from baked_intersect()
    salts,          # (4,) u32
    cam_params,     # (24,) f32
    pix, xs, ys, valid, soff,  # (rows_total, 128)
    rows: int = 8,
    interpret: bool = False,
    rotate: bool = True,
    rotate_cols: int = 1,
    rr_start: int = 0,
    rr_floor: float = 0.05,
    clamp: float = 0.0,
    sampler: str = "random",
):
    """Persistent-lane render with the scene baked into the kernel."""
    total_rows = pix.shape[0]
    assert total_rows % rows == 0
    grid = (total_rows // rows,)

    tile_spec = pl.BlockSpec((rows, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_i = pl.BlockSpec(memory_space=pltpu.SMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        make_persistent_tile(baked_fn, rotate=rotate,
                             rotate_cols=rotate_cols, rr_start=rr_start,
                             rr_floor=rr_floor, clamp=clamp,
                             sampler=sampler),
        grid=grid,
        in_specs=[smem_i, full,
                  tile_spec, tile_spec, tile_spec, tile_spec, tile_spec],
        out_specs=[tile_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((total_rows, 128), f32)] * 4,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(  # large baked scenes /
            vmem_limit_bytes=100 * 1024 * 1024),  # image LUTs > 16M stack
    )(
        jnp.reshape(salts.astype(jnp.uint32), (1, 4)),
        jnp.reshape(cam_params.astype(f32), (1, 24)),
        pix, xs, ys, valid, soff,
    )
    return outs


@functools.partial(
    jax.jit,
    static_argnames=("n_global_blocks", "n_clusters", "n_supers",
                     "n_tri_clusters", "n_tri_supers",
                     "cluster_size", "rows", "interpret", "rotate",
                     "rotate_cols", "rr_start", "rr_floor", "clamp",
                     "sampler", "image_luts", "probe", "packed_attrs"),
)
def fused_render_dynculled(
    scn, clu, sup, slab,  # pack_culled_scene sphere tables (VMEM inputs)
    tri, tri_clu, tri_sup, tri_slab,  # pack_culled_scene triangle tables
    salts,              # (4,) u32
    cam_params,         # (24,) f32
    pix, xs, ys, valid, soff,  # (rows_total, 128)
    n_global_blocks: int = 1,
    n_clusters: int = 0,
    n_supers: int = 0,
    n_tri_clusters: int = 0,
    n_tri_supers: int = 0,
    cluster_size: int = 16,
    rows: int = 8,
    interpret: bool = False,
    rotate: bool = True,
    rotate_cols: int = 1,
    rr_start: int = 0,
    rr_floor: float = 0.05,
    clamp: float = 0.0,
    sampler: str = "random",
    image_luts: tuple = (),
    probe: frozenset = frozenset(),
    packed_attrs: bool = False,
):
    """Persistent-lane render with the dynamic consensus-culled
    intersector: scene/cluster tables are runtime inputs, so new scenes
    of the same structure reuse this compilation.

    Checker textures ride the (runtime) 24-column sphere table; image
    textures arrive as ``image_luts`` — a hashable static tuple of
    (cx, cy, cz, inv_r, h, w, f32_bytes) baked into select-tree
    immediates (see _apply_image_textures), so changing an image
    texture recompiles (O(texels), unlike the baked path's O(scene))."""
    total_rows = pix.shape[0]
    assert total_rows % rows == 0
    grid = (total_rows // rows,)

    tile_spec = pl.BlockSpec((rows, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_i = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32

    def kernel(scn_ref, clu_ref, sup_ref, slab_ref, tri_ref, tri_clu_ref,
               tri_sup_ref, tri_slab_ref, salt_ref, cam_ref,
               px_ref, xs_ref, ys_ref, valid_ref, soff_ref,
               rad_r_o, rad_g_o, rad_b_o, rays_o):
        intersect = make_dynamic_culled_intersect(
            scn_ref, clu_ref, slab_ref, n_global_blocks, n_clusters,
            cluster_size, tri_ref=tri_ref, tri_clu_ref=tri_clu_ref,
            tri_slab_ref=tri_slab_ref, n_tri_clusters=n_tri_clusters,
            sup_ref=sup_ref, n_supers=n_supers,
            tri_sup_ref=tri_sup_ref, n_tri_supers=n_tri_supers,
            packed_attrs=packed_attrs)
        if image_luts:
            intersect.image_textures = tuple(
                (cx, cy, cz, inv_r,
                 np.frombuffer(raw, np.float32).reshape(h, w, 3))
                for cx, cy, cz, inv_r, h, w, raw in image_luts)
        _persistent_impl(intersect, salt_ref, cam_ref, px_ref, xs_ref,
                         ys_ref, valid_ref, soff_ref,
                         rad_r_o, rad_g_o, rad_b_o, rays_o, rotate=rotate,
                         rotate_cols=rotate_cols, rr_start=rr_start,
                         rr_floor=rr_floor, clamp=clamp, sampler=sampler)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full, full, full, full, full, full, full, full,
                  smem_i, full,
                  tile_spec, tile_spec, tile_spec, tile_spec, tile_spec],
        out_specs=[tile_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((total_rows, 128), f32)] * 4,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(  # large baked scenes /
            vmem_limit_bytes=100 * 1024 * 1024),  # image LUTs > 16M stack
    )(
        scn, clu, sup, slab, tri, tri_clu, tri_sup, tri_slab,
        jnp.reshape(salts.astype(jnp.uint32), (1, 4)),
        jnp.reshape(cam_params.astype(f32), (1, 24)),
        pix, xs, ys, valid, soff,
    )
    return outs


def pack_scene(scene_arrays, pad_to: int = 8) -> jnp.ndarray:
    """Scene SoA tables -> one (S, 16) f32 VMEM plane.

    Columns: 0-2 center xyz, 3 radius, 4-6 albedo rgb, 7 fuzz, 8 ior,
    9 mat_type (as f32), 10-15 reserved.  Row-major so the kernel's
    block loads slice the sublane dimension dynamically.  Padding rows
    are NaN: the kernel's 8-sphere blocks may cover them, and NaN
    propagates to a nearest-hit compare that is always false.
    """
    centers = scene_arrays["centers"]
    n = centers.shape[0]
    s = ((n + pad_to - 1) // pad_to) * pad_to
    packed = jnp.full((s, 16), jnp.nan, jnp.float32)
    packed = packed.at[:n, 0:3].set(centers)
    packed = packed.at[:n, 3].set(scene_arrays["radii"])
    packed = packed.at[:n, 4:7].set(scene_arrays["albedo"])
    packed = packed.at[:n, 7].set(scene_arrays["fuzz"])
    packed = packed.at[:n, 8].set(scene_arrays["refract_idx"])
    packed = packed.at[:n, 9].set(scene_arrays["mat_type"].astype(jnp.float32))
    return packed


