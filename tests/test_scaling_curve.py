"""Multi-device scaling of the production JaxSession (SURVEY.md §2.11).

The test host is a virtual 8-device CPU mesh sharing one set of physical
cores, so WALL-CLOCK scaling is unmeasurable here; what is measurable —
and what would catch a sharding regression that keeps correctness but
serializes work — is the compiled partitioning itself: at every mesh size
the batch must land 1/n per device (shard shapes + device sets checked on
the live output arrays), outputs must match the single-device reference
bit-for-bit in structure, and the mis-bucketed fallback must WARN instead
of silently serializing. A scaling table (rows/device at n=1,2,4,8) is
asserted, not just logged."""
from __future__ import annotations

import logging

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from rapiddoc_tpu.engine.buckets import BucketSpec
from rapiddoc_tpu.engine.session import JaxSession
from rapiddoc_tpu.parallel.mesh import get_mesh


def _toy_apply(params, x):
    import jax.numpy as jnp

    # conv-ish batch-parallel compute: per-row matmul + nonlinearity
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w * c)
    return jnp.tanh(flat @ params["w"]).astype(jnp.float32)


def _make_session(n: int) -> JaxSession:
    rng = np.random.default_rng(0)
    params = {"w": rng.standard_normal((4 * 4 * 3, 16)).astype(np.float32)}
    spec = BucketSpec(heights=(4,), widths=(4,), batch_sizes=(8,))
    return JaxSession(
        _toy_apply, params, spec, name=f"scale{n}",
        mesh=get_mesh(n), preproc=None,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(1)
    return rng.standard_normal((8, 4, 4, 3)).astype(np.float32)


def test_partitioning_scales_with_mesh(batch):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    ref = None
    curve = {}
    for n in (1, 2, 4, 8):
        sess = _make_session(n)
        out, count, *_ = sess.dispatch(batch)
        assert count == 8
        leaf = jax.tree.leaves(out)[0]
        devs = leaf.sharding.device_set
        shard_rows = leaf.sharding.shard_shape(leaf.shape)[0]
        curve[n] = shard_rows
        if n == 1:
            assert len(devs) == 1
        else:
            # the batch dim must be partitioned 1/n per device
            assert len(devs) == n, (n, devs)
            assert shard_rows == 8 // n, (n, shard_rows)
        host = np.asarray(leaf)
        if ref is None:
            ref = host
        else:
            np.testing.assert_allclose(host, ref, atol=1e-5, rtol=1e-5)
    # the scaling table itself: rows/device halves at every doubling
    assert curve == {1: 8, 2: 4, 4: 2, 8: 1}, curve


def test_misbucketed_batch_warns_not_silent(batch, caplog):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.default_rng(0)
    params = {"w": rng.standard_normal((4 * 4 * 3, 16)).astype(np.float32)}
    # bucket size 6 is NOT divisible by 4 shards -> fallback branch
    spec = BucketSpec(heights=(4,), widths=(4,), batch_sizes=(6,))
    sess = JaxSession(
        _toy_apply, params, spec, name="scale_fb", mesh=get_mesh(4),
        preproc=None,
    )
    with caplog.at_level(logging.WARNING, logger="rapiddoc_tpu.engine"):
        # force the non-divisible compiled bucket directly: dispatch pads
        # 5 -> 6 (bucket), 6 % 4 != 0
        fn = sess._get_compiled(6, 4, 4, 3, "float32")
        assert fn is not None
    assert any("FALLING BACK" in r.message for r in caplog.records)
