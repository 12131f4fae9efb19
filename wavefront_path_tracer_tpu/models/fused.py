"""Fused-Pallas integrator: the flagship TPU engine.

Same integrator semantics as the wavefront engine (generate / extend /
shade / miss / accumulate; reference ``path_tracer.rs:279-371``) but the
entire render runs as ONE Pallas call with *persistent lanes*
(``ops/pallas_kernels.persistent_tile``): the grid walks 1024-ray image
tiles; within a tile every lane traces its pixel's samples back to back,
regenerating its next primary ray in-kernel the moment its current path
terminates.  Rationale (measured on the target device):

* HBM streaming is ~2 orders slower than VPU compute here, so the XLA
  engines — which materialize (rays x spheres) intermediates and sort
  queues in HBM — are bandwidth-bound.  This kernel's HBM traffic is
  four small input planes and four output planes per tile; scene and all
  path state live in VMEM/registers.
* Queue compaction (a ~2 ms device sort per bounce) costs more than the
  dead lanes it removes; persistent lanes solve the utilization problem
  the opposite way — there *are* no dead lanes until the final tail,
  because a terminated lane immediately starts its next sample (lanes
  are independent: RNG streams are keyed per (pixel, sample, bounce)).

The RNG is integer-exact with the other engines; camera and shading
float math runs through Mosaic's lowering, which may differ by ULPs
from XLA's, so cross-engine image parity is statistical (RMSE), not
bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from collections import OrderedDict

from wavefront_path_tracer_tpu.ops import pallas_kernels as _pk
from wavefront_path_tracer_tpu.ops.pallas_kernels import (
    baked_culled_intersect,
    baked_intersect,
    fused_render_baked,
    fused_render_dynculled,
    fused_render_persistent,
    fused_segment_baked,
    fused_segment_dynculled,
    pack_culled_scene,
    pack_scene,
)
from wavefront_path_tracer_tpu.ops.raygen import generate_rays
from wavefront_path_tracer_tpu.utils.config import RenderConfig

_LANES = 128
_TILE_ROWS = 8

# Scene-baked intersect closures, keyed by scene fingerprint: the same
# function object must be reused so jit's static-arg cache (and the
# persistent compile cache) hit.  Bounded LRU — each entry closes over a
# whole unrolled scene, so unbounded growth would leak memory in long
# interactive sessions that mutate scenes.
_BAKED_CACHE_MAX = 8
_BAKED_CACHE: OrderedDict = OrderedDict()

# Packed tables for the dynamic culled intersector, keyed by scene
# fingerprint (cheap to rebuild; cached so device uploads amortize).
_DYN_CACHE: OrderedDict = OrderedDict()


def _dyn_tables(scene_arrays, cluster_size: int, camera_pos=None):
    # The visit order lives in the tables (cheap to re-pack, no
    # recompile), so the camera hint is quantized only to keep this
    # cache from thrashing on tiny moves.
    hint_key = None
    if camera_pos is not None:
        centers = np.asarray(scene_arrays["centers"])
        diag = float(np.linalg.norm(
            centers.max(axis=0) - centers.min(axis=0))) if len(centers) else 1.0
        quant = max(diag, 1e-6) / 8.0
        hint_key = tuple(np.round(
            np.asarray(camera_pos, np.float64).reshape(3) / quant
        ).astype(np.int64).tolist())
        camera_pos = np.asarray(hint_key, np.float64) * quant
    key = (hash(b"".join(
        np.asarray(scene_arrays[k]).tobytes()
        for k in ("centers", "radii", "albedo", "fuzz", "refract_idx",
                  "mat_type", "tri_v0", "tri_e1", "tri_e2", "tri_albedo",
                  "tri_fuzz", "tri_refract", "tri_mat_type",
                  "tex_kind", "tex_id", "tex_albedo2", "tex_scale",
                  "tex_data")
        if k in scene_arrays)), cluster_size, hint_key)
    hit = _DYN_CACHE.get(key)
    if hit is None:
        (scn, clu, sup, slab, tri, tri_clu, tri_sup, tri_slab,
         ngb, ncl, nsup, ntc, ntsup, pkd) = pack_culled_scene(
            scene_arrays, cluster_size=cluster_size, camera_hint=camera_pos)
        hit = ((jnp.asarray(scn), jnp.asarray(clu), jnp.asarray(sup),
                jnp.asarray(slab), jnp.asarray(tri),
                jnp.asarray(tri_clu), jnp.asarray(tri_sup),
                jnp.asarray(tri_slab)), (ngb, ncl, nsup, ntc, ntsup, pkd))
        _DYN_CACHE[key] = hit
        while len(_DYN_CACHE) > _BAKED_CACHE_MAX:
            _DYN_CACHE.popitem(last=False)
    else:
        _DYN_CACHE.move_to_end(key)
    return hit


@functools.lru_cache(maxsize=32)
def _block_perm(width: int, height: int, block: int):
    """Pixel permutation grouping pixels into block x block image tiles.

    The fused kernel's cluster culling skips work only on whole-tile
    consensus (8x128-lane vector registers), so lanes must hold
    *spatially coherent* rays.  A linear pixel layout makes one tile a
    1x1024-pixel strip (half an image row at 1080p); with block=32 a
    tile is exactly one 32x32 image block, whose primary rays share a
    tight frustum.  Returns (perm, inv) uint32 arrays: perm[i] = pixel
    id of lane i, inv = argsort(perm) for unscattering radiance.
    """
    ys, xs = np.mgrid[0:height, 0:width]
    nbx = -(-width // block)
    bidx = (ys // block) * nbx + (xs // block)
    within = (ys % block) * block + (xs % block)
    key = bidx.ravel().astype(np.int64) * (block * block) + within.ravel()
    perm = np.argsort(key, kind="stable").astype(np.uint32)
    inv = np.argsort(perm, kind="stable").astype(np.uint32)
    return perm, inv


def _plane(x, rows_total):
    n = x.shape[0]
    pad = rows_total * _LANES - n
    x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(rows_total, _LANES)


def _bake_image_luts(scene_arrays, centers, lut_max: int = 2048):
    """LUTs for image-textured spheres in the fused baked path.

    Per-lane texel gathers are pathological on this device, so each
    image sphere's texture is baked as a <=``lut_max``-texel LUT
    (mean-pool downsampled, halving only dimensions > 1) evaluated by a
    when-gated select tree in-kernel
    (pallas_kernels._apply_image_textures).  Full-resolution image
    textures live on the XLA engines.  Called only on a bake-cache miss
    — the downsample is pure host numpy.
    """
    if "tex_data" not in scene_arrays:
        return ()
    kind = np.asarray(scene_arrays["tex_kind"])
    tid = np.asarray(scene_arrays["tex_id"])
    data = np.asarray(scene_arrays["tex_data"], np.float32)
    radii = np.asarray(scene_arrays["radii"])
    imgs = []
    for i in np.nonzero(kind == 2)[0]:
        lut = data[int(tid[i])]
        while lut.shape[0] * lut.shape[1] > lut_max:
            h, w = lut.shape[:2]
            if w > 1 and (w >= h or h == 1):
                lut = lut[:, : w // 2 * 2].reshape(
                    h, w // 2, 2, 3).mean(axis=2)
            else:
                lut = lut[: h // 2 * 2].reshape(
                    h // 2, 2, w, 3).mean(axis=1)
        imgs.append((float(centers[i, 0]), float(centers[i, 1]),
                     float(centers[i, 2]), 1.0 / float(radii[i]), lut))
    return tuple(imgs)


def _static_image_luts(scene_arrays, lut_max: int) -> tuple:
    """Hashable image-LUT tuple for the dynamic kernel's static args:
    ((cx, cy, cz, inv_r, h, w, f32_bytes), ...) — bytes are hashable,
    arrays are not, and jit keys on the value so equal scenes share the
    compilation."""
    if "tex_data" not in scene_arrays:
        return ()
    luts = _bake_image_luts(scene_arrays,
                            np.asarray(scene_arrays["centers"]),
                            lut_max=lut_max)
    return tuple(
        (cx, cy, cz, inv_r, lut.shape[0], lut.shape[1],
         np.asarray(lut, np.float32).tobytes())
        for cx, cy, cz, inv_r, lut in luts)


def _baked_fn(scene_arrays, clusters: int = 0, camera_pos=None,
              winner_hint: bool = False, lut_max: int = 2048):
    centers = np.asarray(scene_arrays["centers"])
    # Front-to-back cluster ordering hint (perf only — a stale order is
    # still correct).  Quantized to 1/8 of the scene extent for the
    # cache key, so small camera moves reuse the baked kernel instead
    # of paying a rebake.
    hint_key = None
    if camera_pos is not None and clusters > 0:
        camera_pos = np.asarray(camera_pos, np.float64).reshape(3)
        diag = float(np.linalg.norm(
            centers.max(axis=0) - centers.min(axis=0))) if len(centers) else 1.0
        quant = max(diag, 1e-6) / 8.0
        hint_key = tuple(np.round(camera_pos / quant).astype(np.int64).tolist())
        camera_pos = np.asarray(hint_key, np.float64) * quant
    triangles = None
    tri_key = 0
    if "tri_v0" in scene_arrays:
        from wavefront_path_tracer_tpu.scene.mesh import TriangleSoA

        triangles = TriangleSoA(
            v0=np.asarray(scene_arrays["tri_v0"]),
            e1=np.asarray(scene_arrays["tri_e1"]),
            e2=np.asarray(scene_arrays["tri_e2"]),
            albedo=np.asarray(scene_arrays["tri_albedo"]),
            fuzz=np.asarray(scene_arrays["tri_fuzz"]),
            refract_idx=np.asarray(scene_arrays["tri_refract"]),
            mat_type=np.asarray(scene_arrays["tri_mat_type"]),
        )
        tri_key = 1  # replaced with the full fingerprint below
    if triangles is not None:
        tri_key = hash(b"".join(np.asarray(t).tobytes() for t in triangles))
    tex = None
    if "tex_kind" in scene_arrays:
        # Checker: (albedo2, scale) baked per sphere; scale 0 disables.
        tex = (np.asarray(scene_arrays["tex_albedo2"]),
               np.asarray(scene_arrays["tex_scale"]))
    # Fingerprint EVERY baked table — scenes differing only in radii or
    # materials must not reuse a stale kernel.
    sphere_key = hash(b"".join(
        np.asarray(scene_arrays[k]).tobytes()
        for k in ("centers", "radii", "albedo", "fuzz", "refract_idx",
                  "mat_type", "tex_kind", "tex_id", "tex_data")
        if k in scene_arrays
    ) + b"".join(np.asarray(t).tobytes() for t in (tex or ())))
    # Image-textured scenes carry the true per-sphere 1/r (the LUT
    # winner-identity key); others get the sign-only fast path.
    full_inv_r = bool("tex_kind" in scene_arrays
                      and (np.asarray(scene_arrays["tex_kind"]) == 2).any())
    key = (centers.shape[0], sphere_key, tri_key, clusters, hint_key,
           winner_hint, lut_max, full_inv_r)
    fn = _BAKED_CACHE.get(key)
    if fn is None:
        args = (
            centers,
            np.asarray(scene_arrays["radii"]),
            np.asarray(scene_arrays["albedo"]),
            np.asarray(scene_arrays["fuzz"]),
            np.asarray(scene_arrays["refract_idx"]),
            np.asarray(scene_arrays["mat_type"]),
        )
        if clusters > 0:
            fn = baked_culled_intersect(*args, cluster_size=clusters,
                                        triangles=triangles, tex=tex,
                                        camera_hint=camera_pos,
                                        winner_hint=winner_hint,
                                        full_inv_r=full_inv_r)
        else:
            fn = baked_intersect(*args, triangles=triangles, tex=tex,
                                 full_inv_r=full_inv_r)
        fn.image_textures = _bake_image_luts(scene_arrays, centers,
                                             lut_max=lut_max)
        _BAKED_CACHE[key] = fn
        while len(_BAKED_CACHE) > _BAKED_CACHE_MAX:
            _BAKED_CACHE.popitem(last=False)
    else:
        _BAKED_CACHE.move_to_end(key)
    return fn


def _concrete_eye(view):
    """World-space eye position from the view matrix, or None when the
    matrix is a tracer (e.g. under shard_map) and no concrete value
    exists at bake time."""
    if isinstance(view, jax.core.Tracer):
        return None
    try:
        return np.asarray(view)[:3, 3]
    except Exception:  # e.g. a non-addressable multi-host global array
        return None


def _resolve_clusters(config: RenderConfig, scene_arrays) -> int:
    """Effective leaf cluster size: -1 (auto) picks the measured optimum
    by primitive count — 16 below 2000 (390-sphere headline sweep), 32
    above (10k-sphere sweep, exp/sweep10k.py: 13.1 vs 12.2 Mrays/s)."""
    if config.baked_clusters >= 0:
        return config.baked_clusters
    n = np.asarray(scene_arrays["centers"]).shape[0]
    if "tri_v0" in scene_arrays:
        n += np.asarray(scene_arrays["tri_v0"]).shape[0]
    return 16 if n < 2000 else 32


def _effective_split(requested: int, n_samples: int) -> int:
    """Largest divisor of n_samples not exceeding the requested split
    (resolved where n_samples is a concrete python int)."""
    split = max(1, requested)
    while split > 1 and n_samples % split:
        split -= 1
    return split


def render_samples(scene_arrays, cam, view, inv_proj, config: RenderConfig,
                   frame, sample_base, n_samples: int):
    """Sum of ``n_samples`` radiance samples; ((P, 3), rays_traced).

    With ``config.intersector == "baked"`` the sphere loop is unrolled
    with the scene as compile-time constants (fastest; per-scene compile,
    persistently cached).  Otherwise the scene stays a VMEM table.
    """
    split = _effective_split(config.lane_split, n_samples)
    clusters = _resolve_clusters(config, scene_arrays)
    if config.intersector == "baked":
        baked = _baked_fn(scene_arrays, clusters,
                          camera_pos=_concrete_eye(view),
                          winner_hint=config.winner_hint,
                          lut_max=config.tex_lut_max)
        if config.recluster > 0:
            return _render_recluster_impl(
                scene_arrays, cam, view, inv_proj, config, frame,
                sample_base, n_samples, baked_fn=baked)
        return _render_samples_impl(
            scene_arrays, cam, view, inv_proj, config, frame, sample_base,
            n_samples, baked_fn=baked, lane_split=split,
        )
    if "tex_kind" in scene_arrays and clusters <= 0:
        raise NotImplementedError(
            "the fused engine evaluates textures with "
            "intersector='baked' or the dynamic culled path "
            "(baked_clusters > 0); the plain dynamic VMEM kernel "
            "carries no texture winner fields"
        )
    if config.winner_hint:
        # The dynamic culled intersector has no shortlist; refusing
        # beats a silent no-op measurement.
        raise NotImplementedError(
            "winner_hint is implemented only for intersector='baked' "
            "(the dynamic culled path has no shortlist prepass)")
    if config.intersector != "bruteforce":
        # Per-lane BVH gathers are pathological on TPU; refusing beats
        # silently running the brute-force loop the user didn't ask for.
        raise ValueError(
            f"the fused engine has no '{config.intersector}' intersector: "
            "use 'baked' (scene as kernel constants, with optional "
            "baked_clusters culling) or 'bruteforce' (dynamic VMEM table); "
            "'bvh' exists only on the wavefront/megakernel engines"
        )
    if "tri_v0" in scene_arrays and clusters <= 0:
        raise NotImplementedError(
            "the fused engine traces triangles with intersector='baked' "
            "or with the dynamic culled path (baked_clusters > 0); the "
            "plain dynamic VMEM kernel is spheres-only"
        )
    dyn = None
    dyn_static = None
    if clusters > 0:
        dyn, (ngb, ncl, nsup, ntc, ntsup, pkd) = _dyn_tables(
            scene_arrays, clusters,
            camera_pos=_concrete_eye(view))
        dyn_static = (ngb, ncl, nsup, ntc, ntsup, clusters,
                      _static_image_luts(scene_arrays, config.tex_lut_max),
                      pkd)
    if config.recluster > 0:
        if dyn is None:
            raise NotImplementedError(
                "recluster > 0 needs a culling intersector — the whole "
                "point is restoring whole-tile consensus skips; use "
                "intersector='baked' or baked_clusters > 0")
        return _render_recluster_impl(
            scene_arrays, cam, view, inv_proj, config, frame, sample_base,
            n_samples, dyn_tables=dyn, dyn_static=dyn_static)
    return _render_samples_impl(
        scene_arrays, cam, view, inv_proj, config, frame, sample_base,
        n_samples, baked_fn=None, lane_split=split,
        dyn_tables=dyn, dyn_static=dyn_static,
    )


def render_samples_with_stats(scene_arrays, cam, view, inv_proj,
                              config: RenderConfig, frame, sample_base,
                              n_samples: int):
    """Like render_samples but also returns the kernel's real per-frame
    counters {iterations, supers_entered, clusters_entered} summed over
    tiles — the fused analog of the reference's per-kernel observability
    (its five kernels are one Pallas call here, so stage wall-µs don't
    exist; these are the measured quantities that do)."""
    clusters = _resolve_clusters(config, scene_arrays)
    baked_fn = (_baked_fn(scene_arrays, clusters,
                          camera_pos=_concrete_eye(view),
                          winner_hint=config.winner_hint,
                          lut_max=config.tex_lut_max)
                if config.intersector == "baked" else None)
    dyn = None
    dyn_static = None
    if baked_fn is None and clusters > 0:
        dyn, (ngb, ncl, nsup, ntc, ntsup, pkd) = _dyn_tables(
            scene_arrays, clusters,
            camera_pos=_concrete_eye(view))
        dyn_static = (ngb, ncl, nsup, ntc, ntsup, clusters,
                      _static_image_luts(scene_arrays, config.tex_lut_max),
                      pkd)
    if config.recluster > 0:
        if baked_fn is None and dyn is None:
            raise NotImplementedError(
                "recluster > 0 needs a culling intersector; use "
                "intersector='baked' or baked_clusters > 0")
        return _render_recluster_impl(
            scene_arrays, cam, view, inv_proj, config, frame, sample_base,
            n_samples, baked_fn=baked_fn, with_stats=True,
            dyn_tables=dyn, dyn_static=dyn_static)
    return _render_samples_impl(
        scene_arrays, cam, view, inv_proj, config, frame, sample_base,
        n_samples, baked_fn=baked_fn, with_stats=True,
        lane_split=_effective_split(config.lane_split, n_samples),
        dyn_tables=dyn, dyn_static=dyn_static,
    )


def stage_timing(scene_arrays, cam, view, inv_proj, config: RenderConfig,
                 n_samples: int = 32, reps: int = 3):
    """Per-stage wall-time attribution for the fused engine — the
    production analog of the reference's per-kernel GPU timestamps
    (``path_tracer.rs:356-365``, ``query_gpu.rs:94-128``).

    The five reference kernels are ONE Pallas dispatch here and Mosaic
    exposes no in-kernel clock, so stage times are measured
    *differentially*: each stage's ops are idempotently duplicated at
    trace time (``ops/pallas_kernels.PROBE``, CSE-defeated with traced
    zeros — images unchanged) and the stage's share of iteration time
    is (t_duplicated - t_base) / t_base.  Each variant is a separate
    bake + compile (persistently cached), so the first run costs a few
    compiles; results are exact for THIS scene/config.

    Both production intersectors are supported.  Baked: the probed
    trace is keyed by the fresh bake closure per variant.  Dynamic
    (bruteforce + baked_clusters > 0): the kernel wrappers carry the
    PROBE set as a static jit arg (``probe=``), so variants can't
    collide in jit caches.

    Returns (base_seconds, [(stage, seconds, share), ...]) where the
    final row is the unprobed residual.
    """
    import time

    from wavefront_path_tracer_tpu.ops import pallas_kernels as pk

    clusters = _resolve_clusters(config, scene_arrays)
    culled = clusters > 0
    dynamic = config.intersector != "baked"
    if dynamic and config.intersector != "bruteforce":
        raise NotImplementedError(
            "fused stage timing probes cover intersector='baked' and "
            "'bruteforce' (the production paths)")
    if dynamic and not culled:
        raise NotImplementedError(
            "the plain dynamic VMEM kernel has no probe points; use "
            "baked_clusters > 0")
    stages = [("generate (raygen)", "dbl_raygen")]
    if dynamic:
        stages += [("extend: primitive tests", "dyn_dbl_entry"),
                   ("extend: cull conds", "dyn_dbl_cond"),
                   ("extend: global sweep", "dyn_dbl_global")]
    elif culled:
        stages += [("extend: primitive tests", "dbl_entry"),
                   ("extend: cull conds", "dbl_cond")]
    stages += [("shade (BSDF)", "dbl_shade"),
               ("miss (sky accumulate)", "dbl_accum"),
               ("loop bookkeeping", "dbl_loopcond")]

    sargs = (
        np.asarray(scene_arrays["centers"]),
        np.asarray(scene_arrays["radii"]),
        np.asarray(scene_arrays["albedo"]),
        np.asarray(scene_arrays["fuzz"]),
        np.asarray(scene_arrays["refract_idx"]),
        np.asarray(scene_arrays["mat_type"]),
    )
    eye = _concrete_eye(view)
    if config.block_tiles:
        perm, _ = _block_perm(config.width, config.height,
                              config.block_tiles)
        pix = jnp.asarray(perm)
    else:
        pix = jnp.arange(config.num_pixels, dtype=jnp.uint32)

    dyn = dyn_static = None
    if dynamic:
        dyn, (ngb, ncl, nsup, ntc, ntsup, pkd) = _dyn_tables(
            scene_arrays, clusters, camera_pos=eye)
        dyn_static = (ngb, ncl, nsup, ntc, ntsup, clusters,
                      _static_image_luts(scene_arrays, config.tex_lut_max),
                      pkd)

    def timed(variant: str) -> float:
        pk.PROBE = frozenset() if variant is None else frozenset([variant])
        try:
            baked = None
            if not dynamic:
                # Bypass _BAKED_CACHE: its key doesn't include PROBE,
                # and a fresh closure per variant keeps the jit caches
                # distinct (the dynamic path keys on probe= instead).
                if culled:
                    baked = pk.baked_culled_intersect(
                        *sargs, cluster_size=clusters, camera_hint=eye)
                else:
                    baked = pk.baked_intersect(*sargs)
                baked.image_textures = _bake_image_luts(
                    scene_arrays, sargs[0], lut_max=config.tex_lut_max)
            _, rays = render_pixels(
                pix, scene_arrays, cam, view, inv_proj, config,
                jnp.uint32(0), jnp.uint32(0), n_samples, baked,
                dyn_tables=dyn, dyn_static=dyn_static)
            float(rays)  # compile + tunnel-safe completion
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                _, rays = render_pixels(
                    pix, scene_arrays, cam, view, inv_proj, config,
                    jnp.uint32(1), jnp.uint32(0), n_samples, baked,
                    dyn_tables=dyn, dyn_static=dyn_static)
                float(rays)
                times.append(time.perf_counter() - t0)
            return min(times)
        finally:
            pk.PROBE = frozenset()

    base = timed(None)
    rows = []
    for label, probe in stages:
        dt = timed(probe)
        share = max(0.0, (dt - base) / base)
        rows.append((label, base * share, share))
    probed = sum(r[2] for r in rows)
    rows.append(("other (winner selects, unprobed)",
                 base * max(0.0, 1.0 - probed), max(0.0, 1.0 - probed)))
    return base, rows


def render_pixels(pixel_idx, scene_arrays, cam, view, inv_proj,
                  config: RenderConfig, frame, sample_base,
                  n_samples: int, baked_fn=None, with_stats: bool = False,
                  lane_split: int = 1, dyn_tables=None, dyn_static=None):
    """Trace any pixel-index subset (a shard tile or the whole image).

    Not jitted itself — callers jit (render_samples) or trace it inside
    shard_map (parallel/sharding.py).  Returns ((N, 3), rays_traced)
    (+ a stats dict when ``with_stats``).
    """
    interpret = jax.default_backend() == "cpu"
    tile_rows = config.tile_rows
    num_pixels = pixel_idx.shape[0]

    # Lane sample-splitting: the persistent loop's makespan per tile is
    # its slowest lane (all samples of one pixel, serial).  Splitting
    # each pixel's sample budget over K duplicate lanes cuts the tail
    # at the cost of K x input planes; radiance copies sum at the end.
    # ``lane_split`` is pre-resolved to a divisor of n_samples by the
    # caller (_effective_split) — n_samples itself may be traced.
    split = lane_split
    n_per_lane = n_samples // split if split > 1 else n_samples
    if split > 1:
        pixel_idx = jnp.tile(pixel_idx, split)
        soff_flat = jnp.repeat(
            jnp.arange(split, dtype=jnp.uint32) * n_per_lane.astype(jnp.uint32)
            if hasattr(n_per_lane, "astype")
            else jnp.arange(split, dtype=jnp.uint32) * jnp.uint32(n_per_lane),
            num_pixels)

    lanes_total = pixel_idx.shape[0]
    rows = -(-lanes_total // _LANES)
    rows_total = -(-rows // tile_rows) * tile_rows

    pix = _plane(pixel_idx, rows_total)
    xs = _plane((pixel_idx % config.width).astype(jnp.float32), rows_total)
    ys = _plane((pixel_idx // config.width).astype(jnp.float32), rows_total)
    lane = jnp.arange(rows_total * _LANES).reshape(rows_total, _LANES)
    valid = (lane < lanes_total).astype(jnp.float32)
    if split > 1:
        soff = _plane(soff_flat, rows_total)
    else:
        soff = jnp.zeros((rows_total, _LANES), jnp.uint32)

    # Camera scalars for in-kernel raygen (layout: _raygen_tile docstring).
    # Recover scales from the inverse projection we were handed, so the
    # kernel and the XLA raygen agree on the exact same camera model:
    # inv_proj[0,0] = w, [1,1] = h; the w-component of an unprojected
    # (ndc,1,1) is m[3,2] + m[3,3] = 1/z_far (see scene/camera.py).
    w_s = inv_proj[0, 0]
    h_s = inv_proj[1, 1]
    z_far = 1.0 / (inv_proj[3, 2] + inv_proj[3, 3])
    rot = view[:3, :3]
    cam_params = jnp.concatenate([
        rot.reshape(-1),
        view[:3, 3],
        jnp.stack([
            w_s, h_s, z_far,
            jnp.float32(cam.defocus_radius), jnp.float32(cam.focus_distance),
            jnp.float32(config.width), jnp.float32(config.height),
        ]),
        jnp.zeros((5,), jnp.float32),
    ]).astype(jnp.float32)

    salts = jnp.stack([
        jnp.uint32(frame), jnp.uint32(sample_base),
        jnp.uint32(config.max_bounces), jnp.uint32(n_per_lane),
    ])

    if baked_fn is not None:
        rad_r, rad_g, rad_b, rays = fused_render_baked(
            baked_fn, salts, cam_params, pix, xs, ys, valid, soff,
            rows=tile_rows, interpret=interpret,
            rotate=config.lane_rotate,
            rotate_cols=config.lane_rotate_cols,
            rr_start=config.rr_start_bounce,
            rr_floor=config.rr_floor,
            clamp=config.clamp,
            sampler=config.sampler,
        )
    elif dyn_tables is not None:
        (ngb, ncl, nsup, ntc, ntsup, csize, image_luts,
         pkd) = dyn_static
        rad_r, rad_g, rad_b, rays = fused_render_dynculled(
            *dyn_tables, salts, cam_params, pix, xs, ys, valid, soff,
            n_global_blocks=ngb, n_clusters=ncl, n_supers=nsup,
            n_tri_clusters=ntc, n_tri_supers=ntsup,
            cluster_size=csize, image_luts=image_luts,
            rows=tile_rows, interpret=interpret,
            rotate=config.lane_rotate,
            rotate_cols=config.lane_rotate_cols,
            rr_start=config.rr_start_bounce,
            rr_floor=config.rr_floor,
            clamp=config.clamp,
            sampler=config.sampler,
            # Keys the jit cache on the active stage-timing probe set
            # (the kernel reads pallas_kernels.PROBE at trace time).
            probe=frozenset(_pk.PROBE),
            packed_attrs=pkd,
        )
    else:
        scene_packed = pack_scene(scene_arrays)
        n_spheres = jnp.int32(scene_arrays["centers"].shape[0])
        rad_r, rad_g, rad_b, rays = fused_render_persistent(
            scene_packed, n_spheres, salts, cam_params,
            pix, xs, ys, valid, soff,
            rows=tile_rows, interpret=interpret,
            rotate=config.lane_rotate,
            rotate_cols=config.lane_rotate_cols,
            rr_start=config.rr_start_bounce,
            rr_floor=config.rr_floor,
            clamp=config.clamp,
            sampler=config.sampler,
        )
    radiance = jnp.stack(
        [rad_r.reshape(-1), rad_g.reshape(-1), rad_b.reshape(-1)], axis=-1
    )[:lanes_total]
    if split > 1:
        radiance = radiance.reshape(split, num_pixels, 3).sum(axis=0)
    # Aux plane: col 0 = per-tile live-ray counts; cols 1-3 are
    # iteration/cull stats (see _persistent_impl), not ray counts.
    if with_stats:
        stats = {
            "iterations": jnp.sum(rays[:, 1]),
            "supers_entered": jnp.sum(rays[:, 2]),
            "clusters_entered": jnp.sum(rays[:, 3]),
        }
        return radiance, jnp.sum(rays[:, 0]), stats
    return radiance, jnp.sum(rays[:, 0])


def _segment_schedule(k: int, max_bounces: int) -> tuple:
    """Segment lengths for the re-clustering engine: K, K, 2K, 4K, ...
    clipped so the total is exactly ``max_bounces`` (every ray is dead
    after the last segment).  Doubling caps the sort count at
    O(log(max_bounces / K)) per sample: coherence decays fastest in the
    early, fully-live bounces, while the long tail has few live rays
    (already compacted to the front) and gains little from re-sorting.
    """
    ks = [min(k, max_bounces)]
    tot = ks[0]
    step = k
    while tot < max_bounces:
        step_eff = min(step, max_bounces - tot)
        ks.append(step_eff)
        tot += step_eff
        step *= 2
    return tuple(ks)


def _coherence_key(ox, oy, oz, dx, dy, dz, alive, lo, inv_ext):
    """Sort key grouping live rays by origin Morton cell (128^3 grid
    over the scene box, 21 bits) then direction octant (3 low bits);
    dead rays key to int32 max so one ascending argsort compacts AND
    coheres.  Origin-major: under tight slab-exit caps a ray's entered
    clusters are dominated by its near field, so rays from one cell
    share entries even across octants (the octant then splits a cell's
    tiles by travel direction)."""
    i32 = jnp.int32

    def spread(v, l, ie):
        s = jnp.clip((v - l) * ie * 128.0, 0.0, 127.0).astype(i32)
        s = (s | (s << 16)) & 0x030000FF
        s = (s | (s << 8)) & 0x0300F00F
        s = (s | (s << 4)) & 0x030C30C3
        s = (s | (s << 2)) & 0x09249249
        return s

    m = ((spread(ox, lo[0], inv_ext[0]) << 2)
         | (spread(oy, lo[1], inv_ext[1]) << 1)
         | spread(oz, lo[2], inv_ext[2]))
    octant = ((dx < 0).astype(i32) * 4 + (dy < 0).astype(i32) * 2
              + (dz < 0).astype(i32))
    return jnp.where(alive > 0, (m << 3) | octant, i32(0x7FFFFFFF))


def render_pixels_recluster(pixel_idx, scene_arrays, cam, view, inv_proj,
                            config: RenderConfig, frame, sample_base,
                            n_samples, baked_fn=None,
                            with_stats: bool = False,
                            dyn_tables=None, dyn_static=None):
    """Segmented re-clustering render of any pixel-index subset
    (``config.recluster`` > 0); radiance is returned in pixel_idx order.

    Per sample: XLA raygen in the caller's pixel order (pass
    block-tile order for coherent primaries), then segments of the
    in-kernel bounce loop (ops/pallas_kernels._segment_impl) separated
    by a coherence sort (_coherence_key + one argsort + plane gathers).
    Radiance accumulates per ray and scatters back to the lane's
    origin slot once per sample.  RNG streams are the shared
    per-(pixel, sample, bounce) contract, so parity with every other
    engine holds unchanged.  Not jitted itself — callers jit
    (_render_recluster_impl) or trace it inside shard_map
    (parallel/sharding.py; each shard sorts its own rays locally, so no
    collectives are added).
    """
    interpret = jax.default_backend() == "cpu"
    n = pixel_idx.shape[0]
    rows = -(-n // _LANES)
    rows_total = -(-rows // config.tile_rows) * config.tile_rows
    n_pad = rows_total * _LANES

    def plane(x, fill=0.0):
        pad = n_pad - x.shape[0]
        return jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.full((pad,), fill, jnp.float32)]).reshape(
                 rows_total, _LANES)

    # Two lane identities ride the sorts: the *global* pixel id (RNG
    # streams) and the *local* slot (radiance scatter target).  Padding
    # lanes carry slot n: out of range, so the final scatter drops them
    # (mode="drop"); they start dead and stay dead.
    pix0 = jnp.concatenate(
        [pixel_idx.astype(jnp.uint32),
         jnp.zeros((n_pad - n,), jnp.uint32)]).reshape(rows_total, _LANES)
    slot0 = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.uint32),
         jnp.full((n_pad - n,), n, jnp.uint32)]).reshape(
             rows_total, _LANES)
    zeros = jnp.zeros((rows_total, _LANES), jnp.float32)
    alive0 = plane(jnp.ones((n,), jnp.float32))
    ones_t = plane(jnp.ones((n,), jnp.float32))

    # Morton grid bounds: the scene's primitive box.  Scatter origins
    # lie on primitive surfaces, so this box covers every live origin.
    centers = scene_arrays["centers"]
    absr = jnp.abs(scene_arrays["radii"])[:, None]
    lo = jnp.min(centers - absr, axis=0)
    hi = jnp.max(centers + absr, axis=0)
    if "tri_v0" in scene_arrays:
        v0 = scene_arrays["tri_v0"]
        v1 = v0 + scene_arrays["tri_e1"]
        v2 = v0 + scene_arrays["tri_e2"]
        lo = jnp.minimum(lo, jnp.minimum(v0, jnp.minimum(v1, v2)).min(0))
        hi = jnp.maximum(hi, jnp.maximum(v0, jnp.maximum(v1, v2)).max(0))
    inv_ext = 1.0 / jnp.maximum(hi - lo, 1e-6)

    ks = _segment_schedule(config.recluster, config.max_bounces)
    frame_u = jnp.asarray(frame, jnp.uint32)

    def run_segment(pix_t, samp_t, state, k):
        salts = jnp.stack([frame_u, jnp.uint32(config.max_bounces),
                           jnp.uint32(k), jnp.uint32(0)])
        common = dict(rows=config.tile_rows, interpret=interpret,
                      rr_start=config.rr_start_bounce,
                      rr_floor=config.rr_floor, clamp=config.clamp,
                      sampler=config.sampler)
        if baked_fn is not None:
            return fused_segment_baked(baked_fn, salts, pix_t, samp_t,
                                       state, **common)
        (ngb, ncl, nsup, ntc, ntsup, csize, image_luts,
         pkd) = dyn_static
        return fused_segment_dynculled(
            *dyn_tables, salts, pix_t, samp_t, state,
            n_global_blocks=ngb, n_clusters=ncl, n_supers=nsup,
            n_tri_clusters=ntc, n_tri_supers=ntsup, cluster_size=csize,
            image_luts=image_luts, probe=frozenset(_pk.PROBE),
            packed_attrs=pkd, **common)

    def one_sample(s, carry):
        acc, rays_tot, iters, sups, clus = carry
        sample = (jnp.asarray(sample_base, jnp.uint32)
                  + jnp.asarray(s, jnp.uint32))
        origin, direction = generate_rays(
            pixel_idx, config.width, config.height, frame_u, sample, cam,
            view, inv_proj, sampler=config.sampler)
        # State layout: pallas_kernels._SEG_STATE (bounce, o xyz, d xyz,
        # throughput rgb, radiance rgb, alive).  Padding directions are
        # +z so per-ray 1/d stays finite on dead lanes.
        state = (
            zeros,
            plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
            plane(direction[:, 0]), plane(direction[:, 1]),
            plane(direction[:, 2], fill=1.0),
            ones_t, ones_t, ones_t,
            zeros, zeros, zeros,
            alive0,
        )
        pix_t = pix0
        slot_t = slot0
        samp_t = jnp.full((rows_total, _LANES), sample, jnp.uint32)
        for i, k in enumerate(ks):
            if i > 0:
                key = _coherence_key(
                    state[1].ravel(), state[2].ravel(), state[3].ravel(),
                    state[4].ravel(), state[5].ravel(), state[6].ravel(),
                    state[13].ravel(), lo, inv_ext)
                order = jnp.argsort(key)

                def g(p):
                    return jnp.take(p.ravel(), order).reshape(
                        rows_total, _LANES)

                state = tuple(g(p) for p in state)
                pix_t = g(pix_t)
                slot_t = g(slot_t)
            state, aux = run_segment(pix_t, samp_t, state, k)
            rays_tot = rays_tot + jnp.sum(aux[:, 0])
            iters = iters + jnp.sum(aux[:, 1])
            sups = sups + jnp.sum(aux[:, 2])
            clus = clus + jnp.sum(aux[:, 3])
        rgb = jnp.stack([state[10].ravel(), state[11].ravel(),
                         state[12].ravel()], axis=-1)
        acc = acc.at[slot_t.ravel().astype(jnp.int32)].add(rgb,
                                                           mode="drop")
        return acc, rays_tot, iters, sups, clus

    init = (jnp.zeros((n, 3), jnp.float32), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    acc, rays_tot, iters, sups, clus = jax.lax.fori_loop(
        0, n_samples, one_sample, init)
    if with_stats:
        return acc, rays_tot, {"iterations": iters, "supers_entered": sups,
                               "clusters_entered": clus}
    return acc, rays_tot


@functools.partial(
    jax.jit,
    static_argnames=("cam", "config", "baked_fn", "with_stats",
                     "dyn_static"),
)
def _render_recluster_impl(scene_arrays, cam, view, inv_proj,
                           config: RenderConfig, frame, sample_base,
                           n_samples=1, baked_fn=None,
                           with_stats: bool = False,
                           dyn_tables=None, dyn_static=None):
    """Whole-image jit wrapper over render_pixels_recluster: block-tile
    pixel order in (coherent primaries), natural pixel order out."""
    if config.block_tiles:
        perm, inv = _block_perm(config.width, config.height,
                                config.block_tiles)
        pixel_idx = jnp.asarray(perm)
        out = render_pixels_recluster(
            pixel_idx, scene_arrays, cam, view, inv_proj, config, frame,
            sample_base, n_samples, baked_fn=baked_fn,
            with_stats=with_stats, dyn_tables=dyn_tables,
            dyn_static=dyn_static)
        return (out[0][jnp.asarray(inv)],) + out[1:]
    pixel_idx = jnp.arange(config.num_pixels, dtype=jnp.uint32)
    return render_pixels_recluster(
        pixel_idx, scene_arrays, cam, view, inv_proj, config, frame,
        sample_base, n_samples, baked_fn=baked_fn, with_stats=with_stats,
        dyn_tables=dyn_tables, dyn_static=dyn_static)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "config", "baked_fn", "with_stats",
                     "lane_split", "dyn_static"),
)
def _render_samples_impl(scene_arrays, cam, view, inv_proj,
                         config: RenderConfig, frame, sample_base,
                         n_samples=1, baked_fn=None,
                         with_stats: bool = False, lane_split: int = 1,
                         dyn_tables=None, dyn_static=None):
    # n_samples is a TRACED input (it only feeds the kernel's salt
    # plane), so changing the spp budget never recompiles the kernel.
    if config.block_tiles:
        # Trace in 32x32-image-block lane order (see _block_perm), then
        # unscatter radiance back to natural pixel order.
        perm, inv = _block_perm(config.width, config.height,
                                config.block_tiles)
        out = render_pixels(
            jnp.asarray(perm), scene_arrays, cam, view, inv_proj, config,
            frame, sample_base, n_samples, baked_fn, with_stats=with_stats,
            lane_split=lane_split, dyn_tables=dyn_tables,
            dyn_static=dyn_static,
        )
        return (out[0][jnp.asarray(inv)],) + out[1:]
    pixel_idx = jnp.arange(config.num_pixels, dtype=jnp.uint32)
    return render_pixels(
        pixel_idx, scene_arrays, cam, view, inv_proj, config, frame,
        sample_base, n_samples, baked_fn, with_stats=with_stats,
        lane_split=lane_split, dyn_tables=dyn_tables,
        dyn_static=dyn_static,
    )
