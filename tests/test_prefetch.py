"""Device prefetcher tests."""

import numpy as np
import pytest

from arvae_tpu.data.loaders import EpochLoader
from arvae_tpu.data.prefetch import DevicePrefetcher
from arvae_tpu.parallel import create_mesh


def test_yields_all_batches_in_order():
    ctx = create_mesh()
    loader = EpochLoader((np.arange(64).reshape(64, 1).astype(np.float32),),
                         8, shuffle=False)
    pf = DevicePrefetcher(loader, ctx)
    batches = [np.asarray(b[0]) for b in pf]
    assert len(batches) == 8
    np.testing.assert_array_equal(
        np.concatenate(batches).ravel(), np.arange(64)
    )


def test_process_fn_applied():
    ctx = create_mesh()
    loader = EpochLoader((np.ones((16, 2), np.float32),), 8, shuffle=False)
    pf = DevicePrefetcher(loader, ctx, process_fn=lambda b: (b[0] * 3.0,))
    for (x,) in pf:
        np.testing.assert_allclose(np.asarray(x), 3.0)


def test_worker_errors_propagate():
    ctx = create_mesh()
    loader = EpochLoader((np.ones((16, 2), np.float32),), 8, shuffle=False)

    def bad(batch):
        raise RuntimeError("boom")

    pf = DevicePrefetcher(loader, ctx, process_fn=bad)
    with pytest.raises(RuntimeError, match="boom"):
        list(pf)


def test_reiterable():
    ctx = create_mesh()
    loader = EpochLoader((np.arange(32).reshape(32, 1).astype(np.float32),),
                         8, shuffle=False)
    pf = DevicePrefetcher(loader, ctx)
    assert len(list(pf)) == 4
    assert len(list(pf)) == 4
