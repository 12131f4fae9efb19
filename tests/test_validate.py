"""Tests for the validate.py correctness-gate tool (CPU, tiny sizes).

Covers the estimator-flag plumbing added in round 5: same-stream gates
must render the ORACLE with the test sampler (a sampler changes the
quadrature, and MC noise only cancels when both sides integrate with
the same one), while --oracle-sampler pins the oracle independently
(the independent-quadrature bias-gate mode), and a cached golden
artifact must refuse to stand in for a different oracle configuration.
"""

import json

import numpy as np
import pytest

from wavefront_path_tracer_tpu import validate

TINY = ["--width", "64", "--height", "32", "--spp", "4",
        "--max-bounces", "4",
        "--engine", "megakernel", "--intersector", "bruteforce",
        "--oracle-engine", "megakernel",
        "--oracle-intersector", "bruteforce"]


def _run(argv, capsys):
    rc = validate.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_same_stream_oracle_follows_test_sampler(capsys):
    """With identical engines and --sampler stratified, the oracle must
    also run stratified: rmse is then exactly 0 (same engine, same
    quadrature).  Before round 5 the oracle silently rendered with the
    random sampler and this gate could never pass."""
    rc, row = _run(TINY + ["--sampler", "stratified", "--gate", "1e-6"],
                   capsys)
    assert rc == 0 and row["pass"]
    assert row["rmse"] == 0.0


def test_oracle_sampler_override_changes_quadrature(capsys):
    """--oracle-sampler random vs --sampler stratified compares two
    INDEPENDENT quadratures of the same integral: rmse must be
    nonzero (MC noise floor), i.e. well above the same-stream 0."""
    rc, row = _run(TINY + ["--sampler", "stratified",
                           "--oracle-sampler", "random",
                           "--gate", "1e-6"], capsys)
    assert rc == 1 and not row["pass"]
    assert row["rmse"] > 1e-4


def test_oracle_cache_roundtrip_and_meta_guard(tmp_path, capsys):
    """The golden artifact records its oracle metadata; a gate whose
    oracle configuration differs (here: a stratified-oracle gate vs a
    random-sampler artifact) must refuse to load it rather than
    silently comparing against the wrong quadrature."""
    cache = str(tmp_path / "golden.npz")
    rc, row = _run(TINY + ["--oracle-cache", cache, "--gate", "1e-6"],
                   capsys)
    assert rc == 0 and row["rmse"] == 0.0
    z = np.load(cache, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    assert meta["spp"] == 4 and "sampler" not in meta

    # Reload hit: same flags load the artifact (rmse still 0).
    rc, row = _run(TINY + ["--oracle-cache", cache, "--gate", "1e-6"],
                   capsys)
    assert rc == 0 and row["rmse"] == 0.0

    with pytest.raises(ValueError, match="rendered with"):
        validate.main(TINY + ["--oracle-cache", cache,
                              "--sampler", "stratified"])
