"""A/B the two-level consensus hierarchy at the 1080p headline.

The book scene has 31 leaf clusters — below the default super gate
(48), so only leaf conds run.  This measures whether entering through
4 supers of 8 (saving skipped supers' leaf conds, paying 4 extra
conds + coarser refresh) wins at this scale.

Usage: python exp/super_gate.py
"""
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

W, H, SPP, CLUSTERS = 1920, 1080, 32, 16


def main():
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                       samples_per_frame=SPP, max_bounces=50,
                       engine="fused", intersector="baked",
                       baked_clusters=CLUSTERS, block_tiles=32)
    scene = get_scene("book_one_final")
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(W, H))
    cam = cc.gpu_camera()
    eye = np.asarray(cc.view_matrix())[:3, 3]
    sargs = tuple(np.asarray(arrays[k]) for k in
                  ("centers", "radii", "albedo", "fuzz", "refract_idx",
                   "mat_type"))
    perm, _ = fused._block_perm(W, H, 32)
    pix = jnp.asarray(perm)

    for gate, sf in ((48, 8), (0, 8), (0, 4)):
        baked = pk.baked_culled_intersect(
            *sargs, cluster_size=CLUSTERS, camera_hint=eye,
            super_gate=gate, super_factor=sf)
        rad, rays = fused.render_pixels(
            pix, arrays, cam, view, inv_proj, cfg,
            jnp.uint32(0), jnp.uint32(0), SPP, baked)
        float(rays)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            rad, rays_ = fused.render_pixels(
                pix, arrays, cam, view, inv_proj, cfg,
                jnp.uint32(1), jnp.uint32(0), SPP, baked)
            rays_ = float(rays_)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"gate={gate} super_factor={sf}: {rays_/dt/1e6:.1f} Mrays/s "
              f"({dt:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
