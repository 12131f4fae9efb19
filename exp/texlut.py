"""Fused image-texture fidelity vs LUT budget (VERDICT round-3 item 4).

The fused engine evaluates image textures as mean-pooled <=tex_lut_max
texel LUTs with 10:10:10 RGB packing (models/fused._bake_image_luts,
pallas_kernels._apply_image_textures); the XLA engines sample full
resolution.  This measures the quality cost: RMSE of the fused render
vs the megakernel oracle at growing budgets, on a 256x128 source
texture with both smooth and high-frequency content, plus wall time —
the fidelity/cost curve behind the tex_lut_max default.

Usage: python exp/texlut.py [budgets...]   (default 512 2048 8192 32768)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import numpy as np  # noqa: E402

from wavefront_path_tracer_tpu.renderer import render  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import SceneBuilder  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402
from wavefront_path_tracer_tpu.utils.image import rmse  # noqa: E402


def test_texture(h: int = 128, w: int = 256) -> np.ndarray:
    """Realistically mixed content: smooth latitude gradient + medium
    'continents' (low-freq sin bands) + high-frequency grid lines."""
    v, u = np.mgrid[0:h, 0:w].astype(np.float64)
    u /= w
    v /= h
    smooth = np.stack([0.2 + 0.6 * v, 0.3 + 0.4 * u, 0.7 - 0.4 * v], -1)
    continents = 0.25 * np.sin(6.28 * 3 * u)[..., None] * np.sin(
        6.28 * 2 * v)[..., None]
    grid = 0.15 * (((u * 32).astype(int) + (v * 16).astype(int)) % 2
                   )[..., None]
    return np.clip(smooth + continents + grid, 0.0, 1.0).astype(np.float32)


def build_scene():
    img = test_texture()
    b = SceneBuilder()
    b.sphere([0.0, -100.5, -1.0], 100.0, b.lambertian([0.4, 0.4, 0.4]))
    b.sphere([0.0, 0.0, -1.2], 0.5, b.lambertian([1.0, 1.0, 1.0],
                                                 texture=img))
    b.sphere([1.0, 0.0, -1.0], 0.5, b.metal([0.8, 0.6, 0.2], 0.05))
    return b.build()


def main():
    budgets = [int(x) for x in sys.argv[1:]] or [512, 2048, 8192, 32768]
    scene = build_scene()
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([-2.0, 2.0, 1.0], [0.0, 0.0, -1.0])
    cc.vfov_deg = 20.0
    cc.defocus_angle_deg = 0.0
    cc.focus_distance = 3.4
    cfg = RenderConfig(width=400, height=224, samples_per_pixel=64,
                       samples_per_frame=64, max_bounces=50,
                       engine="megakernel", intersector="bruteforce")
    mk = render(scene, cc, cfg)
    print(f"oracle mean {mk.image.mean():.4f}")
    for budget in budgets:
        fcfg = cfg.replace(engine="fused", intersector="baked",
                           baked_clusters=0, tex_lut_max=budget)
        r = render(scene, cc, fcfg)  # compile
        t0 = time.perf_counter()
        r = render(scene, cc, fcfg)
        dt = time.perf_counter() - t0
        print(f"tex_lut_max={budget:6d}: rmse {rmse(r.image, mk.image):.2e}"
              f"  warm render {dt:.2f}s")


if __name__ == "__main__":
    main()
