"""Fused-Pallas engine vs. the oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from wavefront_path_tracer_tpu.renderer import render
from wavefront_path_tracer_tpu.utils.config import RenderConfig
from wavefront_path_tracer_tpu.utils.image import rmse

from tests.test_engines import BASE, _cover_camera


@pytest.fixture(scope="module")
def oracle(book_cover_scene):
    return render(book_cover_scene, _cover_camera(), BASE.replace(engine="megakernel"))


def test_fused_matches_oracle(book_cover_scene, oracle):
    fz = render(book_cover_scene, _cover_camera(), BASE.replace(engine="fused"))
    # Same integer RNG streams; only transcendental lowering differs.
    err = rmse(fz.accumulated, oracle.accumulated)
    assert err < 1e-4, err
    assert np.isfinite(fz.accumulated).all()


def test_fused_nonsquare_padding(book_cover_scene, oracle):
    # 100x27 = 2700 pixels: not a multiple of 128 -> padded lanes must
    # neither crash nor leak radiance.
    cfg = BASE.replace(engine="fused", width=100, height=27,
                       samples_per_pixel=2, samples_per_frame=2)
    ref = render(book_cover_scene, _cover_camera(),
                 cfg.replace(engine="megakernel"))
    fz = render(book_cover_scene, _cover_camera(), cfg)
    assert rmse(fz.accumulated, ref.accumulated) < 1e-4
