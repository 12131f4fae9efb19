"""Sweep the Russian-roulette (start, floor) frontier on the TPU.

One process (the tunnel's first host-sync stall is paid once): for each
candidate, gate the 400x225@1000spp fused/baked/cull16 render against
the CPU golden artifact, and for gate-passers time 1000 spp at 1080p
(warm second render, compile excluded).  Incumbent (rr=5, floor=0.05)
is re-timed in the same process for apples-to-apples.
"""

import json
import sys
import time

import numpy as np

from wavefront_path_tracer_tpu.renderer import render
from wavefront_path_tracer_tpu.scene import CameraController
from wavefront_path_tracer_tpu.scene.scene import get_scene
from wavefront_path_tracer_tpu.utils.config import RenderConfig
from wavefront_path_tracer_tpu.utils.image import rmse

GOLDEN = "golden/oracle_book_400x225_1000spp.npz"

scene = get_scene("book_one_final")
cc = CameraController.book_one_final()
gimg = np.load(GOLDEN, allow_pickle=False)["image"]

BASE = dict(engine="fused", intersector="baked", baked_clusters=16,
            max_bounces=50)


def gate(rr, floor):
    cfg = RenderConfig(width=400, height=225, samples_per_pixel=1000,
                       samples_per_frame=200, rr_start_bounce=rr,
                       rr_floor=floor, **BASE)
    t0 = time.time()
    r = render(scene, cc, cfg)
    err = float(rmse(r.image, gimg))
    print(f"gate rr={rr} floor={floor}: rmse={err:.2e} "
          f"({'PASS' if err < 1e-3 else 'fail'}) in {time.time()-t0:.0f}s",
          flush=True)
    return err


def time_1080p(rr, floor):
    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=1000,
                       samples_per_frame=1000, rr_start_bounce=rr,
                       rr_floor=floor, **BASE)
    r = render(scene, cc, cfg)             # compile + warm-up
    # Time the IDENTICAL call: RenderConfig is a jit static argument,
    # so cfg.replace(frame=1) would retrace inside the timed window.
    t0 = time.time()
    r = render(scene, cc, cfg)
    dt = time.time() - t0
    print(f"1080p@1000spp rr={rr} floor={floor}: {dt:.2f}s "
          f"({r.mrays_per_s:.0f} Mrays/s)", flush=True)
    return dt


results = {}
# Incumbent for in-process reference.
results["rr5_f0.05"] = {"rmse": gate(5, 0.05), "t": time_1080p(5, 0.05)}

err3 = gate(3, 0.25)
results["rr3_f0.25"] = {"rmse": err3}
if err3 < 1e-3:
    results["rr3_f0.25"]["t"] = time_1080p(3, 0.25)
    # Earlier start with a higher floor: the remaining frontier.
    err2 = gate(2, 0.30)
    results["rr2_f0.3"] = {"rmse": err2}
    if err2 < 1e-3:
        results["rr2_f0.3"]["t"] = time_1080p(2, 0.30)
else:
    # rr=3 too noisy even at floor 0.25: try the gentler rr=4.
    err4 = gate(4, 0.25)
    results["rr4_f0.25"] = {"rmse": err4}
    if err4 < 1e-3:
        results["rr4_f0.25"]["t"] = time_1080p(4, 0.25)

print(json.dumps(results), flush=True)
