"""Cluster-size sweep for the DYNAMIC culled intersector (real TPU).

exp/dynprobe.py decomposed the dynamic iteration: conds 26% +
per-entered-cluster pl.when boundary 21% -- both scale with cluster
count, and both are ~2x their baked share (baked conds are immediates;
dynamic conds do 6 AABB scalar extracts per cluster).  The baked sweep
optimum (cluster 16) was tuned for baked cost ratios, so the dynamic
path should prefer coarser leaves.  This sweeps cluster size at
400x224@64 on the book scene (each variant compiles in ~1 min -- no
bake).

Usage: python exp/dynsweep.py [--clusters 8,16,32,64] [--scene ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavefront_path_tracer_tpu.models import fused  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import get_scene  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402

W, H, SPP = 400, 224, 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", default="8,16,32,64")
    ap.add_argument("--scene", default="book_one_final")
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--height", type=int, default=H)
    ap.add_argument("--spp", type=int, default=SPP)
    opts = ap.parse_args()

    cc = CameraController.book_one_final()
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(opts.width, opts.height))
    cam = cc.gpu_camera()
    scene = get_scene(opts.scene)

    for cs in (int(c) for c in opts.clusters.split(",")):
        cfg = RenderConfig(width=opts.width, height=opts.height,
                           samples_per_pixel=opts.spp,
                           samples_per_frame=opts.spp, max_bounces=50,
                           engine="fused", intersector="bruteforce",
                           baked_clusters=cs, block_tiles=32)
        arrays = prepare_scene(scene, cfg)
        fused._DYN_CACHE.clear()
        jax.clear_caches()
        try:
            t0 = time.time()
            rad, rays = fused.render_samples(
                arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
                jnp.uint32(0), jnp.uint32(opts.spp))
            float(rays)
            compile_s = time.time() - t0
            t0 = time.time()
            rad, rays = fused.render_samples(
                arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
                jnp.uint32(0), jnp.uint32(opts.spp))
            nrays = float(rays)
            dt = time.time() - t0
            chk = float(jnp.sum(rad))
            print(f"clusters {cs:3d}: {nrays / dt / 1e6:7.1f} Mrays/s  "
                  f"({dt:.2f}s, compile {compile_s:.0f}s, "
                  f"chk {chk:.6e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"clusters {cs:3d}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
