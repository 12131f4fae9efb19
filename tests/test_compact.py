"""Stream compaction: determinism, stability, correctness."""

import numpy as np
import jax.numpy as jnp

from wavefront_path_tracer_tpu.ops.compact import compact, compaction_order


def test_compaction_stable_prefix():
    rs = np.random.RandomState(5)
    keep = rs.rand(1000) < 0.3
    payload = np.arange(1000, dtype=np.int32)
    count, out = compact(jnp.asarray(keep), jnp.asarray(payload))
    count = int(count)
    assert count == keep.sum()
    # Survivors keep their original relative order (stability).
    np.testing.assert_array_equal(np.asarray(out)[:count], payload[keep])


def test_compaction_multiple_arrays_consistent():
    rs = np.random.RandomState(6)
    keep = rs.rand(257) < 0.5
    a = rs.randn(257, 3).astype(np.float32)
    b = np.arange(257, dtype=np.int32)
    count, ca, cb = compact(jnp.asarray(keep), jnp.asarray(a), jnp.asarray(b))
    count = int(count)
    np.testing.assert_array_equal(np.asarray(cb)[:count], b[keep])
    np.testing.assert_array_equal(np.asarray(ca)[:count], a[keep])


def test_all_and_none():
    keep = jnp.ones(16, bool)
    count, out = compact(keep, jnp.arange(16))
    assert int(count) == 16
    np.testing.assert_array_equal(np.asarray(out), np.arange(16))

    keep = jnp.zeros(16, bool)
    count, _ = compact(keep, jnp.arange(16))
    assert int(count) == 0


def test_order_is_permutation():
    keep = jnp.asarray(np.random.RandomState(7).rand(64) < 0.4)
    order, _ = compaction_order(keep)
    np.testing.assert_array_equal(np.sort(np.asarray(order)), np.arange(64))
