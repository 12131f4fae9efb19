"""Render the CPU golden-oracle artifact with progress + resume.

Renders the BASELINE gate oracle (megakernel / bruteforce, CPU,
400x225 @ 1000 spp) in frame batches, checkpointing after each, so an
interrupted run resumes instead of restarting.  Output: the same npz
golden artifact validate.py consumes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

SPP = int(os.environ.get("GOLDEN_SPP", "1000"))
BATCH = int(os.environ.get("GOLDEN_BATCH", "50"))
OUT = sys.argv[1] if len(sys.argv) > 1 else "golden/oracle_book_400x225_1000spp.npz"
CKPT = OUT + ".ckpt.npz"


def main():
    from wavefront_path_tracer_tpu.renderer import Renderer
    from wavefront_path_tracer_tpu.scene import CameraController
    from wavefront_path_tracer_tpu.scene.scene import get_scene
    from wavefront_path_tracer_tpu.utils.config import RenderConfig
    from wavefront_path_tracer_tpu.utils.image import (
        load_checkpoint, save_checkpoint)

    cfg = RenderConfig(width=400, height=225, samples_per_pixel=SPP,
                       samples_per_frame=BATCH, max_bounces=50,
                       engine="megakernel", intersector="bruteforce")
    scene = get_scene("book_one_final")
    cc = CameraController.book_one_final()
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    r = Renderer(scene, cc, cfg)
    if os.path.exists(CKPT):
        acc, samples, frame = load_checkpoint(CKPT)
        r._accum = np.asarray(acc).reshape(-1, 3).astype(np.float32)
        r.progress.accumulated_samples = samples
        r.progress.frame = frame
        print(f"resumed at {samples} spp", flush=True)
    t0 = time.time()
    while True:
        res = r.render_frame()
        if res is None:
            break
        save_checkpoint(CKPT, np.asarray(r._accum),
                        r.progress.accumulated_samples, r.progress.frame)
        el = time.time() - t0
        done = r.progress.accumulated_samples
        print(f"{done}/{SPP} spp  {el:.0f}s  ({res.mrays_per_s:.2f} Mrays/s)",
              flush=True)
        image = res.image

    meta = {"scene": "book_one_final", "width": 400, "height": 225,
            "spp": SPP, "max_bounces": 50, "engine": "megakernel",
            "intersector": "bruteforce"}
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    np.savez_compressed(OUT, image=np.asarray(image),
                        meta=np.asarray(json.dumps(meta)),
                        platform=np.asarray("cpu"))
    os.remove(CKPT)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
