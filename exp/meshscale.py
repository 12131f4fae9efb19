"""Mesh-scale probe: where does the dynamic-culled path's time go as
triangle count grows?

Observed: knot 50k tris (3125 clusters) renders at ~0.003 Mrays/s on
the flat dynamic path — ~3 orders below the linear extrapolation from
10k spheres / 625 clusters (10.4 Mrays/s at 1080p).  This probe times
cold (compile) and warm renders at growing triangle counts to find the
blowup's shape (linear in clusters? quadratic? compile-side?).

Usage: python exp/meshscale.py [tri_counts...]   (default 2000 8000)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import numpy as np  # noqa: E402

from examples.gen_obj import torus_knot  # noqa: E402
from wavefront_path_tracer_tpu.renderer import render  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.mesh import MeshSceneBuilder  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402


def build(tris: int):
    b = MeshSceneBuilder()
    ground = b.lambertian([0.5, 0.5, 0.5])
    b.sphere([0.0, -1000.0, 0.0], 1000.0, ground)
    v, f = torus_knot(tris)
    mat = b.lambertian([0.7, 0.3, 0.2])
    b.mesh(v, f, mat)
    scene, triangles = b.build_mesh_scene()
    return scene, triangles


def main():
    counts = [int(x) for x in sys.argv[1:]] or [2000, 8000]
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([0.0, 1.5, 4.0], [0.0, 0.0, 0.0])
    cc.vfov_deg = 40.0
    cc.defocus_angle_deg = 0.0
    for tris in counts:
        scene, triangles = build(tris)
        n_t = triangles.v0.shape[0]
        cfg = RenderConfig(width=256, height=128, samples_per_pixel=4,
                           samples_per_frame=4, max_bounces=8,
                           engine="fused", intersector="bruteforce",
                           baked_clusters=16)
        t0 = time.perf_counter()
        res = render(scene, cc, cfg, triangles=triangles)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = render(scene, cc, cfg, triangles=triangles)
        warm = time.perf_counter() - t0
        rays = 256 * 128 * 4 * 2.0   # rough; report rate order only
        print(f"tris={n_t:6d} clusters~{(n_t + 15) // 16:5d}  "
              f"cold {cold:7.1f}s  warm {warm:7.1f}s  "
              f"~{rays / warm / 1e6:6.2f} Mrays/s warm", flush=True)


if __name__ == "__main__":
    main()
