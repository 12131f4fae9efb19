"""Two-process CPU-emulation dryrun of the multi-host render path.

Spawned (2x) by tests/test_sharding.py::test_multihost_dryrun with
argv = [process_id, coordinator_port].  Each process brings 4 virtual
CPU devices, so the global mesh is 8 devices across 2 "hosts"; each
process checks its tile band against a locally-computed oracle render
(bit-identical: same engine, same RNG streams).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]

    from wavefront_path_tracer_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from wavefront_path_tracer_tpu.renderer import render
    from wavefront_path_tracer_tpu.scene import CameraController
    from wavefront_path_tracer_tpu.scene.scene import book_cover
    from wavefront_path_tracer_tpu.utils.config import RenderConfig

    scene = book_cover()
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([-2.0, 2.0, 1.0], [0.0, 0.0, -1.0])
    cc.defocus_angle_deg = 0.0
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2,
                       samples_per_frame=2, max_bounces=6,
                       engine="megakernel")

    rad, ids = multihost.render_sharded_global(scene, cc, cfg)
    assert rad.shape == (cfg.num_pixels // 2, 3), rad.shape
    assert np.isfinite(rad).all()
    # This process owns a contiguous band (process-major tile order).
    expect = np.arange(proc_id * rad.shape[0], (proc_id + 1) * rad.shape[0])
    assert np.array_equal(ids, expect), (ids[:4], expect[:4])

    # Oracle: plain single-process render of the full image — the
    # sharded path must be bit-identical on this band (same RNG).
    local = render(scene, cc, cfg)
    band = np.asarray(local.accumulated).reshape(-1, 3)[ids]
    np.testing.assert_array_equal(rad, band)
    print(f"process {proc_id}: OK ({rad.shape[0]} pixels, "
          f"mean {rad.mean():.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
