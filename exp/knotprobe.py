"""Stage decomposition of the dynamic-culled intersector on the knot
scene, via the fused differential probes (now keyed on the kernels'
probe= static arg, so the dynamic path works too).

Usage: python exp/knotprobe.py [tris] [WxH] [spp]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax.numpy as jnp  # noqa: E402

from exp.meshscale import build  # noqa: E402
from wavefront_path_tracer_tpu.models.fused import stage_timing  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    wh = sys.argv[2] if len(sys.argv) > 2 else "400x224"
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    w, h = (int(v) for v in wh.split("x"))
    scene, triangles = build(tris)
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([0.0, 1.5, 4.0], [0.0, 0.0, 0.0])
    cc.vfov_deg = 40.0
    cc.defocus_angle_deg = 0.0
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                       samples_per_frame=spp, max_bounces=50,
                       engine="fused", intersector="bruteforce",
                       baked_clusters=16)
    arrays = prepare_scene(scene, cfg, triangles=triangles)
    base, rows = stage_timing(
        arrays, cc.gpu_camera(), jnp.asarray(cc.view_matrix()),
        jnp.asarray(cc.inverse_projection(w, h)), cfg,
        n_samples=spp, reps=2)
    print(f"base {base*1e3:.1f} ms ({tris} tris, {w}x{h}@{spp})")
    for label, secs, share in rows:
        print(f"  {label:36s} {secs*1e3:8.1f} ms  {share*100:5.1f}%")


if __name__ == "__main__":
    main()
