"""Bounce-0 frustum-shortlist headroom (round-4 VERDICT lever (b)).

The proposal: at bake time, intersect each 32x32 pixel block's
primary-ray frustum with the cluster AABBs and emit a per-block static
cluster shortlist, so primary rays sweep with ZERO runtime conds.

This probe measures the lever's actual headroom by comparing, on the
same render:

* **measured**: clusters the production consensus cull actually
  ENTERS at bounce 0 (`max_bounces=1`, so every iteration is bounce 0;
  read from the kernel's aux stats plane), and
* **shortlist**: the smallest correct bake-time shortlist — per block,
  every cluster some primary ray geometrically hits inside the
  hierarchy slab (union over the frame's AA jitter, since a static
  list must cover every sample).

A bake-time list cannot use the running best_t (occlusion is runtime
knowledge), so `shortlist >= frustum-visible set`, while consensus
enters a cluster only if it can still IMPROVE some lane's hit — with
front-to-back visit order and cap refresh, a primary hit culls
everything behind it.  If measured <= shortlist, the lever's entire
remaining value is the cond pass it deletes, whose cost is already
measured at ~2.8% of iteration time (exp/dynprobe.py, BENCHMARKS.md).

Usage: JAX_PLATFORMS=... python exp/bounce0.py [--scene book_one_final]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS", "")
if _want and "axon" not in _want:
    jax.config.update("jax_platforms", _want)

import jax.numpy as jnp  # noqa: E402

from wavefront_path_tracer_tpu.models import fused  # noqa: E402
from wavefront_path_tracer_tpu.models.fused import (  # noqa: E402
    _baked_fn, _block_perm, render_pixels)
from wavefront_path_tracer_tpu.ops.pallas_kernels import (  # noqa: E402
    T_MIN)
from wavefront_path_tracer_tpu.ops.raygen import generate_rays  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import get_scene  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402


def slab_entries(o, d, boxes):
    """(rays, boxes) bool: ray hits box at positive t (slab method),
    the bake-time-computable half of the kernel's cluster_cond."""
    inv = 1.0 / d  # (N, 3)
    lo = boxes[:, 0][None]  # (1, B, 3)
    hi = boxes[:, 1][None]
    t0 = (lo - o[:, None]) * inv[:, None]
    t1 = (hi - o[:, None]) * inv[:, None]
    tmin = np.minimum(t0, t1).max(axis=-1)
    tmax = np.maximum(t0, t1).min(axis=-1)
    return (tmin <= tmax) & (tmax > T_MIN)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="book_one_final")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--clusters", type=int, default=16)
    p.add_argument("--block-tiles", type=int, default=32)
    args = p.parse_args()

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, engine="fused",
                       intersector="baked", baked_clusters=args.clusters,
                       block_tiles=args.block_tiles, max_bounces=1)
    scene = get_scene(args.scene)
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()

    baked = _baked_fn(arrays, args.clusters,
                      camera_pos=np.asarray(cc.view_matrix())[:3, 3])
    boxes = np.asarray([[b[0], b[1]] for b in baked.cluster_aabbs],
                       np.float32)                     # (B, 2, 3)
    n_clu = boxes.shape[0]
    print(f"hierarchy: {n_clu} clusters of {args.clusters} "
          f"(+{baked.n_globals} globals swept unconditionally)")

    # --- measured: consensus entries at bounce 0 -------------------
    perm, _ = _block_perm(cfg.width, cfg.height, cfg.block_tiles)
    pix = jnp.asarray(perm)
    orig = fused.fused_render_baked
    aux_out = {}

    def spy(*a, **kw):
        outs = orig(*a, **kw)
        aux_out["aux"] = outs[3]
        return outs

    fused.fused_render_baked = spy
    try:
        render_pixels(pix, arrays, cam, view, inv_proj, cfg,
                      jnp.uint32(0), jnp.uint32(0), args.spp, baked)
    finally:
        fused.fused_render_baked = orig
    aux = np.asarray(aux_out["aux"]).reshape(-1, cfg.tile_rows, 128)
    iters = aux[:, 0, 1]
    entered = aux[:, 0, 3]
    n_tiles = aux.shape[0]
    print(f"measured (consensus @ bounce 0): {entered.sum():.0f} entries "
          f"over {iters.sum():.0f} iterations / {n_tiles} tiles "
          f"-> {entered.sum() / iters.sum():.2f} clusters/iteration")

    # --- bake-time shortlist: frustum-visible set per block --------
    lanes = 1024  # a tile = one 32x32 block (block_tiles=32)
    perm_np = np.asarray(perm).reshape(-1, lanes)
    per_sample = np.zeros((n_tiles,), np.float64)
    union = np.zeros((n_tiles, n_clu), bool)
    for s in range(args.spp):
        o, d = generate_rays(jnp.asarray(perm_np.reshape(-1)),
                             cfg.width, cfg.height, jnp.uint32(0),
                             jnp.uint32(s), cam, view, inv_proj)
        o = np.asarray(o, np.float64).reshape(n_tiles, lanes, 3)
        d = np.asarray(d, np.float64).reshape(n_tiles, lanes, 3)
        for t in range(n_tiles):
            hit = slab_entries(o[t], d[t], boxes)      # (lanes, B)
            blk = hit.any(axis=0)                      # (B,)
            union[t] |= blk
            per_sample[t] += blk.sum() / args.spp
    print(f"frustum-visible (per-sample mean): {per_sample.sum():.1f} "
          f"clusters/iteration-equivalent "
          f"({per_sample.sum() / n_tiles:.2f}/block)")
    print(f"bake-time shortlist (union over jitter): "
          f"{union.sum():.0f} entries/sample-iteration "
          f"({union.sum() / n_tiles:.2f}/block)")

    # One iteration per sample at max_bounces=1, so per-sample totals
    # are directly comparable.
    meas_per_sample = entered.sum() / args.spp
    short_per_sample = float(union.sum())
    print(f"\nper-sample block sweeps at bounce 0: consensus "
          f"{meas_per_sample:.1f} vs static shortlist "
          f"{short_per_sample:.1f} "
          f"({short_per_sample / max(meas_per_sample, 1e-9):.2f}x)")
    if short_per_sample >= meas_per_sample:
        print("-> the static shortlist sweeps AT LEAST as many blocks as "
              "consensus already does; the lever's value is bounded by "
              "the deleted cond pass (~2.8% of iteration cost).")


if __name__ == "__main__":
    main()
