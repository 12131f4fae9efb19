"""Stratified AA sampler: engine parity + variance reduction."""

import numpy as np
import pytest

from wavefront_path_tracer_tpu.renderer import render
from wavefront_path_tracer_tpu.utils.image import rmse

from tests.test_engines import BASE, _cover_camera


def test_stratified_engines_agree(book_cover_scene):
    """The stratum remap is shared formula + shared streams, so the XLA
    engines stay bit-identical, and the fused engine statistical."""
    cfg = BASE.replace(samples_per_pixel=4, samples_per_frame=4,
                       sampler="stratified")
    mk = render(book_cover_scene, _cover_camera(),
                cfg.replace(engine="megakernel"))
    wf = render(book_cover_scene, _cover_camera(),
                cfg.replace(engine="wavefront"))
    np.testing.assert_array_equal(mk.accumulated, wf.accumulated)
    fz = render(book_cover_scene, _cover_camera(),
                cfg.replace(engine="fused"))
    assert np.isfinite(fz.accumulated).all()
    diff = np.abs(fz.accumulated - mk.accumulated).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.05


def test_stratified_reduces_variance(book_cover_scene):
    """At 16 spp the stratified AA estimate must be closer to a
    256-spp reference than the random estimate is (the whole point);
    both must converge to the same integral (unbiasedness)."""
    hi = render(book_cover_scene, _cover_camera(),
                BASE.replace(engine="megakernel", samples_per_pixel=256,
                             samples_per_frame=256))
    ref = np.asarray(hi.image)
    errs = {}
    for sampler in ("random", "stratified"):
        lo = render(book_cover_scene, _cover_camera(),
                    BASE.replace(engine="megakernel", samples_per_pixel=16,
                                 samples_per_frame=16, sampler=sampler))
        errs[sampler] = rmse(lo.image, ref)
    assert errs["stratified"] < errs["random"]


def test_sampler_validated():
    with pytest.raises(ValueError, match="sampler"):
        BASE.replace(sampler="sobol")
