"""Hierarchy-parameter sweep on the 10k-sphere scene (real TPU).

The headline scene's optimum (cluster 16 / super_factor 8 / refresh 16)
was swept at 390 spheres; the 10k scene has 625 leaf clusters and may
prefer coarser leaves or wider supers.  Drives fused.render_pixels with
a custom bake per config (iterprobe pattern).  Each config pays a fresh
~8 min 10k bake (persistently cached for reruns).

Usage: python exp/sweep10k.py [--configs 16x8,32x8,64x8,32x16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavefront_path_tracer_tpu.models import fused  # noqa: E402
from wavefront_path_tracer_tpu.ops import pallas_kernels as pk  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import get_scene  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402

W, H, SPP = 1920, 1080, 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="16x8,32x8,64x8,32x16")
    ap.add_argument("--scene", default="procedural")
    opts = ap.parse_args()

    scene = get_scene(opts.scene)
    cc = CameraController.book_one_final()
    eye = np.asarray(cc.view_matrix())[:3, 3]
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(W, H))
    cam = cc.gpu_camera()

    for spec in opts.configs.split(","):
        cs, sf = (int(v) for v in spec.split("x"))
        cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                           samples_per_frame=SPP, max_bounces=50,
                           engine="fused", intersector="baked",
                           baked_clusters=cs, block_tiles=32)
        arrays = prepare_scene(scene, cfg)
        sargs = tuple(np.asarray(arrays[k]) for k in
                      ("centers", "radii", "albedo", "fuzz",
                       "refract_idx", "mat_type"))
        perm, _ = fused._block_perm(W, H, 32)
        pix = jnp.asarray(perm)
        baked = pk.baked_culled_intersect(
            *sargs, cluster_size=cs, super_factor=sf, camera_hint=eye)
        t0 = time.perf_counter()
        rad, rays = fused.render_pixels(
            pix, arrays, cam, view, inv_proj, cfg,
            jnp.uint32(0), jnp.uint32(0), SPP, baked)
        float(rays)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            rad, rays_ = fused.render_pixels(
                pix, arrays, cam, view, inv_proj, cfg,
                jnp.uint32(1), jnp.uint32(0), SPP, baked)
            rays_ = float(rays_)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"cluster {cs} x super {sf}: {rays_/dt/1e6:.1f} Mrays/s "
              f"({dt:.2f}s; compile {compile_s:.0f}s; "
              f"{baked.n_clusters} clusters, {baked.n_supers} supers)",
              flush=True)


if __name__ == "__main__":
    main()
