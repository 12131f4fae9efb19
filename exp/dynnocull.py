"""No-cull upper bound for the dynamic path (real TPU).

dynprobe's shares say conds (26%) + when boundaries (21%) cost about
what the cull saves in entry work (44% at ~50% entered) on book-scale
scenes — i.e. an UNBROKEN statically-unrolled brute sweep of the
slimmed-quadratic table (no conds, no whens, full software pipelining)
may beat the culled kernel outright at a few hundred spheres.  This
measures it by forcing every sphere into the culled kernel's globals
phase (global_radius_factor=0 -> all global, n_clusters=0), which is
exactly that sweep.

Usage: python exp/dynnocull.py
"""
import functools
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
    cc = CameraController.book_one_final()
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(W, H))
    cam = cc.gpu_camera()
    scene = get_scene("book_one_final")
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                       samples_per_frame=SPP, max_bounces=50,
                       engine="fused", intersector="bruteforce",
                       baked_clusters=16, block_tiles=32)
    arrays = prepare_scene(scene, cfg)

    fused.pack_culled_scene = functools.partial(
        fused.pack_culled_scene, global_radius_factor=0.0)
    fused._DYN_CACHE.clear()
    jax.clear_caches()

    t0 = time.time()
    rad, rays = fused.render_samples(arrays, cam, view, inv_proj, cfg,
                                     jnp.uint32(0), jnp.uint32(0),
                                     jnp.uint32(SPP))
    float(rays)
    compile_s = time.time() - t0
    t0 = time.time()
    rad, rays = fused.render_samples(arrays, cam, view, inv_proj, cfg,
                                     jnp.uint32(0), jnp.uint32(0),
                                     jnp.uint32(SPP))
    nrays = float(rays)
    dt = time.time() - t0
    print(f"nocull unrolled: {nrays / dt / 1e6:7.1f} Mrays/s  "
          f"({dt:.2f}s, compile {compile_s:.0f}s, "
          f"chk {float(jnp.sum(rad)):.6e})", flush=True)


if __name__ == "__main__":
    main()
