"""Knot-scene throughput probe (the round-4 incoherent-ray target).

Renders the torus-knot OBJ scene through the fused dynamic-culled path
with in-kernel counters and prints Mrays/s + cull stats — the scene
where whole-tile consensus collapses (0.31 Mrays/s at round-3 end).

Usage: python exp/knotbench.py [tris] [WxH] [spp] [extra cfg k=v ...]
  e.g. python exp/knotbench.py 50000 800x448 32 recluster=2
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from exp.meshscale import build  # noqa: E402
from wavefront_path_tracer_tpu.models.fused import (  # noqa: E402
    render_samples_with_stats)
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    wh = sys.argv[2] if len(sys.argv) > 2 else "800x448"
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    w, h = (int(v) for v in wh.split("x"))
    extra = {}
    for kv in sys.argv[4:]:
        k, v = kv.split("=")
        extra[k] = int(v) if v.lstrip("-").isdigit() else v

    scene, triangles = build(tris)
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([0.0, 1.5, 4.0], [0.0, 0.0, 0.0])
    cc.vfov_deg = 40.0
    cc.defocus_angle_deg = 0.0
    base = dict(width=w, height=h, samples_per_pixel=spp,
                samples_per_frame=spp, max_bounces=50,
                engine="fused", intersector="bruteforce",
                baked_clusters=16)
    base.update(extra)
    cfg = RenderConfig(**base)
    arrays = prepare_scene(scene, cfg, triangles=triangles)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(w, h))
    cam = cc.gpu_camera()

    t0 = time.perf_counter()
    rad, rays, stats = render_samples_with_stats(
        arrays, cam, view, inv_proj, cfg, jnp.uint32(0), jnp.uint32(0), spp)
    rays = float(rays)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        rad, rays, stats = render_samples_with_stats(
            arrays, cam, view, inv_proj, cfg, jnp.uint32(0), jnp.uint32(0),
            spp)
        rays = float(rays)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    st = {k: float(v) for k, v in stats.items()}
    print(f"knot {tris} tris {w}x{h}@{spp}: {rays/1e6:.1f} Mrays in "
          f"{dt:.2f}s = {rays/dt/1e6:.2f} Mrays/s (compile+first "
          f"{compile_s:.0f}s)")
    print(f"  iterations={st['iterations']:.0f} "
          f"supers_entered={st['supers_entered']:.0f} "
          f"clusters_entered={st['clusters_entered']:.0f} "
          f"sum|rad|={float(jnp.abs(rad).sum()):.1f}")


if __name__ == "__main__":
    main()
