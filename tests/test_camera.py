"""Camera math: angles, view matrix, unprojection, controller dynamics."""

import math

import numpy as np
import jax.numpy as jnp

from wavefront_path_tracer_tpu.scene.camera import (
    Camera,
    CameraController,
    inverse_projection,
)
from wavefront_path_tracer_tpu.ops.raygen import generate_rays


def test_book_one_camera_angles():
    cam = Camera.book_one_final()
    # forward = normalize((0,0,0) - (13,2,3)) => pitch = acos(fy), yaw = atan2(fx, fz)
    fwd = -np.array([13.0, 2.0, 3.0])
    fwd = fwd / np.linalg.norm(fwd)
    assert math.isclose(cam.pitch, math.acos(fwd[1]), rel_tol=1e-6)
    assert math.isclose(cam.yaw, math.atan2(fwd[0], fwd[2]), rel_tol=1e-6)
    np.testing.assert_allclose(cam.forward(), fwd, atol=1e-6)


def test_view_matrix_frame():
    cam = Camera.book_one_final()
    m = cam.view_matrix()
    right, up, fwd = m[:3, 0], m[:3, 1], m[:3, 2]
    # Orthogonal frame, translation = camera position.
    assert abs(np.dot(right, fwd)) < 1e-6
    assert abs(np.dot(up, fwd)) < 1e-6
    assert abs(np.dot(right, up)) < 1e-6
    np.testing.assert_allclose(m[:3, 3], cam.position, atol=1e-7)
    # Rotating camera-space +z gives world forward.
    np.testing.assert_allclose(m[:3, :3] @ [0, 0, 1], cam.forward(), atol=1e-6)


def test_inverse_projection_unprojects_to_far_plane():
    vfov, aspect, zn, zf = math.radians(40.0), 16 / 9, 0.1, 100.0
    m = inverse_projection(vfov, aspect, zn, zf)
    p = m @ np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    p = p[:3] / p[3]
    # Center pixel unprojects straight down +z at the far plane.
    np.testing.assert_allclose(p, [0, 0, zf], rtol=1e-4)
    # Top edge of NDC: y/z = tan(vfov/2).
    p = m @ np.array([0.0, 1.0, 1.0, 1.0], np.float32)
    p = p[:3] / p[3]
    assert math.isclose(p[1] / p[2], math.tan(vfov / 2), rel_tol=1e-5)
    assert math.isclose(p[2], zf, rel_tol=1e-4)


def test_generate_rays_points_at_scene():
    cc = CameraController.book_one_final()
    W, H = 32, 18
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(W, H))
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    origin, direction = generate_rays(pix, W, H, 0, 0, cc.gpu_camera(), view, inv_proj)
    origin, direction = np.asarray(origin), np.asarray(direction)
    np.testing.assert_allclose(
        np.linalg.norm(direction, axis=-1), 1.0, atol=1e-5
    )
    # Defocus on: origins jitter on a lens disk around the camera.
    assert np.linalg.norm(origin - np.array([13.0, 2.0, 3.0]), axis=-1).max() < 0.1
    # Central rays roughly face the scene origin.
    center_dir = direction[(H // 2) * W + W // 2]
    fwd = cc.camera.forward()
    assert np.dot(center_dir, fwd) > 0.99


def test_generate_rays_pinhole_when_no_defocus():
    cc = CameraController.book_one_final()
    cc.defocus_angle_deg = 0.0
    W, H = 16, 9
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(W, H))
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    origin, _ = generate_rays(pix, W, H, 0, 0, cc.gpu_camera(), view, inv_proj)
    want = np.tile([[13.0, 2.0, 3.0]], (W * H, 1))
    np.testing.assert_allclose(np.asarray(origin), want, atol=1e-6)


def test_controller_movement_and_pitch_clamp():
    cc = CameraController.book_one_final()
    p0 = cc.camera.position.copy()
    cc.move_forward(True)
    cc.update_camera(0.5)
    moved = cc.camera.position - p0
    # Moves in the horizontal forward direction at the configured speed.
    assert math.isclose(np.linalg.norm(moved), cc.speed * 0.5, rel_tol=1e-5)
    assert moved[1] == 0.0
    cc.move_forward(False)

    cc.process_mouse(0.0, -1e6)  # huge upward rotation
    cc.update_camera(1.0)
    assert cc.camera.pitch <= math.pi - 0.001 + 1e-6
