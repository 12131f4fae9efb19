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


def test_interactive_loop_piped_input(book_cover_scene, tmp_path, capsys):
    """interactive_loop: renders, steers on keys, exits on 'x'."""
    import io

    from wavefront_path_tracer_tpu.app import interactive_loop

    s = _session(book_cover_scene)
    png = tmp_path / "live.png"
    pos_before = s.camera.camera.position.copy()
    yaw_before = s.camera.camera.yaw
    # Two frames, then a move + look, then quit.  StringIO is not
    # selectable, so the loop falls back to read-all + EOF semantics.
    frames = interactive_loop(
        s, out_png=str(png), input_stream=io.StringIO("wj"),
        max_frames=3, stream=io.StringIO(), show_term=False)
    assert frames == 3
    assert png.exists()
    assert not np.allclose(s.camera.camera.position, pos_before)
    assert s.camera.camera.yaw != yaw_before


def test_interactive_loop_quit_key(book_cover_scene):
    import io

    from wavefront_path_tracer_tpu.app import interactive_loop

    s = _session(book_cover_scene)
    frames = interactive_loop(
        s, input_stream=io.StringIO("x"), stream=io.StringIO(),
        show_term=False)
    assert frames == 0  # quit before any frame rendered


def test_interactive_loop_converges_and_exits_on_eof(book_cover_scene):
    import io

    from wavefront_path_tracer_tpu.app import interactive_loop

    s = _session(book_cover_scene)
    frames = interactive_loop(
        s, input_stream=io.StringIO(""), stream=io.StringIO(),
        show_term=False)
    # 4-spp budget at 1 spf: renders to convergence, then EOF exits.
    assert frames == 4
    assert s.progress >= 1.0


def test_interactive_look_is_deterministic(book_cover_scene):
    s = _session(book_cover_scene)
    s.step()
    yaw0 = s.camera.camera.yaw
    s.look(5.0, 0.0)
    assert abs(s.camera.camera.yaw - yaw0 - np.radians(5.0)) < 1e-6
    assert s.renderer.progress.accumulated_samples == 0  # restart queued
