"""CLI end-to-end (in-process): render, checkpoint, resume, mesh, errors."""

import numpy as np
import pytest

from wavefront_path_tracer_tpu.cli import main
from wavefront_path_tracer_tpu.utils.image import read_png


def _args(tmp_path, *extra):
    return [
        "--scene", "book_cover", "--width", "32", "--height", "18",
        "--spp", "2", "--spf", "2", "--max-bounces", "4",
        "--engine", "megakernel",
        "--look-from", "-2", "2", "1", "--look-at", "0", "0", "-1",
        "--defocus-angle", "0", "--quiet",
        "--out", str(tmp_path / "out.png"), *extra,
    ]


def test_cli_renders_png(tmp_path):
    assert main(_args(tmp_path)) == 0
    img = read_png(str(tmp_path / "out.png"))
    assert img.shape == (18, 32, 3)
    assert img.mean() > 10  # not black


def test_cli_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "ck.npz")
    assert main(_args(tmp_path, "--checkpoint", ck)) == 0
    # Resume with a larger budget: picks up at 2 spp, adds 2 more.
    argv = _args(tmp_path, "--resume", ck)
    argv[argv.index("--spp") + 1] = "4"
    assert main(argv) == 0


def test_cli_mesh_demo(tmp_path):
    argv = _args(tmp_path, )
    argv[argv.index("--scene") + 1] = "mesh_demo"
    argv[argv.index("--engine") + 1] = "wavefront"
    assert main(argv) == 0


def test_cli_obj(tmp_path):
    (tmp_path / "tri.obj").write_text("v 0 1 -2\nv 1 0 -2\nv -1 0 -2\nf 1 2 3\n")
    argv = _args(tmp_path, "--obj", str(tmp_path / "tri.obj"))
    argv[argv.index("--engine") + 1] = "wavefront"
    assert main(argv) == 0


def test_cli_budget_already_met(tmp_path):
    ck = str(tmp_path / "ck.npz")
    assert main(_args(tmp_path, "--checkpoint", ck)) == 0
    # Same spp budget, resuming from a finished checkpoint -> exit 1.
    assert main(_args(tmp_path, "--resume", ck)) == 1


def test_cli_preview_written_per_frame(tmp_path):
    prev = tmp_path / "prev.png"
    assert main(_args(tmp_path, "--preview", str(prev))) == 0
    img = read_png(str(prev))
    assert img.shape == (18, 32, 3)
    assert (tmp_path / "prev.html").exists()  # auto-refresh viewer


def test_cli_resume_rejects_mismatched_checkpoint(tmp_path):
    ck = str(tmp_path / "ck.npz")
    assert main(_args(tmp_path, "--checkpoint", ck)) == 0
    argv = _args(tmp_path, "--resume", ck)
    argv[argv.index("--width") + 1] = "64"  # different resolution
    argv[argv.index("--height") + 1] = "36"
    with pytest.raises(ValueError, match="refusing to blend"):
        main(argv)


def test_cli_fused_bvh_rejected(tmp_path):
    argv = _args(tmp_path, "--intersector", "bvh")
    argv[argv.index("--engine") + 1] = "fused"
    assert main(argv) == 2
