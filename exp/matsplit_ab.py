"""material_split A/B on the dielectric-heavy cornell scene (VERDICT r3 item 5).

The wavefront engine can partition the shade queue by the material the
lane is about to shade (the extend winner) so the shade stage runs over
contiguous same-material segments — the reference's README TODO
(/root/reference/README.md:19) done for real.  On a SIMT GPU this buys
divergence coherence; on the TPU's lockstep VPU the branchless scatter
already evaluates all three BSDFs for every lane, so the partition can
only pay for itself if XLA exploited the segment structure — this
measures whether it does.

A/B: wavefront/bruteforce on cornell_spheres (65 spheres, heavy
dielectric+metal mix) and book_one_final, material_split off vs on,
same RNG (bit-identical radiance by construction — gate-swept in
golden/GATE_SWEEP.json row wavefront_matsplit).  Warm wall time over
REPS renders.

Usage: python exp/matsplit_ab.py [width height spp reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import numpy as np  # noqa: E402

from wavefront_path_tracer_tpu.renderer import render  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import (  # noqa: E402
    SCENE_CAMERAS, get_scene)
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402
from wavefront_path_tracer_tpu.utils.image import rmse  # noqa: E402


def bench_one(scene_name: str, w: int, h: int, spp: int, reps: int):
    scene = get_scene(scene_name)
    cc = CameraController.book_one_final()
    view = SCENE_CAMERAS.get(scene_name)
    if view:  # same per-scene default view the CLI applies
        cc.camera = cc.camera.look_at(view["look_from"], view["look_at"])
        cc.vfov_deg = float(view["vfov"])
        cc.defocus_angle_deg = float(view["defocus_angle"])
    rows = {}
    for split in (False, True):
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                           samples_per_frame=spp, max_bounces=50,
                           engine="wavefront", intersector="bruteforce",
                           material_split=split)
        res = render(scene, cc, cfg)  # compile + tunnel warm-up
        t0 = time.perf_counter()
        for _ in range(reps):
            res = render(scene, cc, cfg)
        dt = (time.perf_counter() - t0) / reps
        mrays = res.rays_traced / dt / 1e6
        rows[split] = (mrays, np.asarray(res.image))
        print(f"{scene_name:16s} material_split={split!s:5s}: "
              f"{mrays:7.2f} Mrays/s  ({dt:.2f}s/render)", flush=True)
    err = rmse(rows[False][1], rows[True][1])
    print(f"{scene_name:16s} A/B rmse {err:.2e} "
          f"(must be 0.0: bit-identical by construction)  "
          f"split/nosplit = {rows[True][0] / rows[False][0]:.3f}x",
          flush=True)


def main():
    w, h, spp, reps = (int(x) for x in (sys.argv[1:] + ["400", "224", "16",
                                                        "3"])[:4])
    for scene_name in ("cornell_spheres", "book_one_final"):
        bench_one(scene_name, w, h, spp, reps)


if __name__ == "__main__":
    main()
