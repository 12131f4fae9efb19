"""Quantify the firefly clamp's bias (CPU, megakernel oracle).

--clamp is a standard biased variance control; this measures what each
level costs in mean radiance and display-image RMSE on the book-cover
scene, so users can pick a level with eyes open.

Usage: python exp/clamp_bias.py [--spp 256]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from wavefront_path_tracer_tpu.renderer import render  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import book_cover  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402
from wavefront_path_tracer_tpu.utils.image import rmse  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spp", type=int, default=256)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=90)
    p.add_argument("--rr", type=int, default=0)
    args = p.parse_args()

    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([-2.0, 2.0, 1.0], [0.0, 0.0, -1.0])
    cc.vfov_deg = 35.0
    cc.defocus_angle_deg = 0.0
    scene = book_cover()

    def run(clamp):
        cfg = RenderConfig(width=args.width, height=args.height,
                           samples_per_pixel=args.spp,
                           samples_per_frame=min(args.spp, 64),
                           max_bounces=50, engine="megakernel",
                           intersector="bruteforce", clamp=clamp,
                           rr_start_bounce=args.rr)
        return render(scene, cc, cfg)

    ref = run(0.0)
    print(f"{'clamp':>7} {'mean drop':>10} {'display RMSE':>13}")
    for c in (4.0, 2.0, 1.0, 0.5, 0.25):
        r = run(c)
        drop = 1.0 - r.accumulated.mean() / ref.accumulated.mean()
        print(f"{c:>7.2f} {100 * drop:>9.2f}% {rmse(r.image, ref.image):>13.2e}")


if __name__ == "__main__":
    main()
