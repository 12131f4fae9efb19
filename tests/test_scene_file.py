"""User scene files (scene/file.py + --scene-file CLI)."""

import json

import numpy as np
import pytest

from wavefront_path_tracer_tpu.scene.file import (apply_camera_dict,
                                                  load_scene_file)
from wavefront_path_tracer_tpu.scene import CameraController


DOC = {
    "camera": {"look_from": [-2, 2, 1], "look_at": [0, 0, -1],
               "vfov": 35, "defocus_angle": 0},
    "spheres": [
        {"center": [0, -100.5, -1], "radius": 100,
         "material": {"type": "lambertian", "albedo": [0.8, 0.8, 0.0],
                      "texture": {"checker": [0.2, 0.3, 0.1],
                                  "scale": 8}}},
        {"center": [0, 0, -1.2], "radius": 0.5,
         "material": {"type": "lambertian", "albedo": [0.1, 0.2, 0.5]}},
        {"center": [1, 0, -1], "radius": 0.5,
         "material": {"type": "metal", "albedo": [0.8, 0.6, 0.2],
                      "fuzz": 0.3}},
        {"center": [-1, 0, -1], "radius": 0.5,
         "material": {"type": "dielectric", "ior": 1.5}},
        {"center": [-1, 0, -1], "radius": -0.4,
         "material": {"type": "dielectric", "ior": 1.5}},
    ],
}


def _write(tmp_path, doc):
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_load_scene_file(tmp_path):
    scene, tris, cam = load_scene_file(_write(tmp_path, DOC))
    assert tris is None
    assert scene.centers.shape == (5, 3)
    np.testing.assert_allclose(scene.radii,
                               [100, 0.5, 0.5, 0.5, -0.4])
    # Shared material spec (the two dielectrics) dedupes.
    assert scene.mat_type[3] == scene.mat_type[4] == 2
    assert cam["vfov"] == 35

    cc = apply_camera_dict(CameraController.book_one_final(), cam)
    assert cc.vfov_deg == 35.0
    assert cc.defocus_angle_deg == 0.0


@pytest.mark.parametrize("mutate, match", [
    (lambda d: d.pop("spheres"), "spheres"),
    (lambda d: d["spheres"][0].pop("radius"), "radius"),
    (lambda d: d["spheres"][0]["material"].update(type="velvet"),
     "unknown material"),
])
def test_load_scene_file_errors(tmp_path, mutate, match):
    doc = json.loads(json.dumps(DOC))
    mutate(doc)
    with pytest.raises(ValueError, match=match):
        load_scene_file(_write(tmp_path, doc))


def test_cli_scene_file(tmp_path):
    from wavefront_path_tracer_tpu.cli import main
    from wavefront_path_tracer_tpu.utils.image import read_png

    argv = ["--scene-file", _write(tmp_path, DOC), "--width", "48",
            "--height", "27", "--spp", "2", "--spf", "2",
            "--max-bounces", "4", "--engine", "megakernel", "--quiet",
            "--out", str(tmp_path / "out.png")]
    assert main(argv) == 0
    img = read_png(str(tmp_path / "out.png"))
    assert img.shape == (27, 48, 3)
    assert img.mean() > 10


def test_scene_file_image_texture(tmp_path):
    from wavefront_path_tracer_tpu.utils.image import write_png

    tex = np.zeros((8, 16, 3), np.float32)
    tex[:, :8] = [1.0, 0.0, 0.0]
    tex[:, 8:] = [0.0, 0.0, 1.0]
    write_png(str(tmp_path / "tex.png"), tex)
    doc = {"spheres": [
        {"center": [0, 0, 0], "radius": 1,
         "material": {"type": "lambertian", "albedo": [1, 1, 1],
                      "texture": {"image": "tex.png"}}}]}
    scene, _tris, _ = load_scene_file(_write(tmp_path, doc))
    assert scene.tex_kind[0] == 2
    assert scene.tex_data.shape[1:] == (8, 16, 3)


def test_scene_file_with_obj(tmp_path):
    (tmp_path / "tri.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    doc = {"spheres": [
        {"center": [0, -1000, 0], "radius": 1000,
         "material": {"type": "lambertian", "albedo": [0.5, 0.5, 0.5]}}],
        "objs": [{"path": "tri.obj", "scale": 2.0}]}
    scene, tris, _ = load_scene_file(_write(tmp_path, doc))
    assert tris is not None and tris.num_triangles == 1
    np.testing.assert_allclose(tris.e1[0], [2.0, 0.0, 0.0])
