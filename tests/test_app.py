"""Interactive session: input events, dt integration, accumulation restart."""

import numpy as np

from wavefront_path_tracer_tpu.app import InteractiveSession
from wavefront_path_tracer_tpu.scene import CameraController
from wavefront_path_tracer_tpu.utils.config import RenderConfig


def _session(scene):
    cc = CameraController.book_one_final()
    cc.defocus_angle_deg = 0.0
    cfg = RenderConfig(width=32, height=18, samples_per_pixel=4,
                       samples_per_frame=1, max_bounces=4,
                       engine="megakernel")
    return InteractiveSession(scene, cc, cfg)


def test_step_accumulates(book_cover_scene):
    s = _session(book_cover_scene)
    r1 = s.step()
    r2 = s.step()
    assert r1.samples == 1 and r2.samples == 2
    assert 0 < s.progress <= 0.5


def test_movement_restarts_accumulation(book_cover_scene):
    s = _session(book_cover_scene)
    s.step()
    assert s.renderer.progress.accumulated_samples == 1
    pos_before = s.camera.camera.position.copy()
    s.key_event("w", True)
    s.step()  # camera moved during this step -> restart, then 1 fresh sample
    s.key_event("w", False)
    assert not np.allclose(s.camera.camera.position, pos_before)
    assert s.renderer.progress.accumulated_samples == 1


def test_mouse_rotation_restarts(book_cover_scene):
    s = _session(book_cover_scene)
    s.step()
    yaw_before = s.camera.camera.yaw
    s.mouse_delta(100.0, 0.0)
    s.step()
    assert s.camera.camera.yaw != yaw_before
    assert s.renderer.progress.accumulated_samples == 1


def test_vfov_change_restarts(book_cover_scene):
    s = _session(book_cover_scene)
    s.step()
    s.set_vfov(45.0)
    assert s.renderer.progress.accumulated_samples == 0


def test_spp_budget_exhausts(book_cover_scene):
    s = _session(book_cover_scene)
    for _ in range(4):
        assert s.step() is not None
    assert s.step() is None  # budget met -> no frame (app would idle)
    assert s.progress == 1.0
