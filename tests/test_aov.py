"""AOV passes (albedo / normal / depth / coverage)."""

import numpy as np

from wavefront_path_tracer_tpu.aov import render_aovs, write_aovs
from wavefront_path_tracer_tpu.scene import CameraController
from wavefront_path_tracer_tpu.scene.scene import book_cover
from wavefront_path_tracer_tpu.utils.config import RenderConfig


def _front_camera():
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([0.0, 0.0, 2.0], [0.0, 0.0, -1.2])
    cc.vfov_deg = 40.0
    cc.defocus_angle_deg = 0.0
    return cc


def test_aov_first_hit_geometry():
    """Camera on the z axis facing the blue center sphere at
    (0, 0, -1.2) r=0.5: the central pixel's depth is the analytic
    ray-sphere distance, its normal faces the camera, and its albedo is
    the material's; a sky pixel has zero coverage/normal and sky
    albedo."""
    cfg = RenderConfig(width=64, height=36, samples_per_pixel=4,
                       samples_per_frame=4, max_bounces=4,
                       engine="megakernel", intersector="bruteforce")
    aovs = render_aovs(book_cover(), _front_camera(), cfg)
    assert aovs["albedo"].shape == (36, 64, 3)
    assert aovs["normal"].shape == (36, 64, 3)
    assert aovs["depth"].shape == (36, 64)

    cy, cx = 18, 32
    # Camera z=2, sphere front surface z = -1.2 + 0.5 = -0.7.
    assert abs(aovs["depth"][cy, cx] - 2.7) < 0.02
    assert aovs["coverage"][cy, cx] == 1.0
    n = aovs["normal"][cy, cx]
    assert n[2] > 0.99                      # faces the camera
    np.testing.assert_allclose(aovs["albedo"][cy, cx], [0.1, 0.2, 0.5],
                               atol=0.02)   # book-cover center albedo

    # Top-left corner: sky.
    assert aovs["coverage"][0, 0] == 0.0
    assert np.all(aovs["normal"][0, 0] == 0.0)
    assert aovs["depth"][0, 0] == 0.0
    assert aovs["albedo"][0, 0, 2] > aovs["albedo"][0, 0, 0]  # blueish sky


def test_aov_write(tmp_path):
    cfg = RenderConfig(width=32, height=16, samples_per_pixel=2,
                       samples_per_frame=2, max_bounces=2,
                       engine="megakernel", intersector="bruteforce")
    aovs = render_aovs(book_cover(), _front_camera(), cfg)
    paths = write_aovs(str(tmp_path / "x"), aovs)
    for p in paths:
        assert (tmp_path / p.split("/")[-1]).exists()
    loaded = np.load(paths[0])
    np.testing.assert_array_equal(loaded["depth"], aovs["depth"])
