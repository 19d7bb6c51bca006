"""Multi-host scaffold tests (single-process degenerate paths)."""

import numpy as np

import dctz_tpu
from dctz_tpu.parallel import multihost as mh


def test_init_noop_single_process():
    mh.init()  # must not raise


def test_host_slice_single_process():
    start, stop = mh.host_slice(64 * 100)
    assert start == 0
    assert stop >= 64 * 100
    assert stop % 64 == 0


def test_compress_multihost_single_process_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64 * 200 + 5) * 12
    blob = mh.compress_multihost(x, x.size, 1e-3, "ec")
    y = dctz_tpu.decompress(blob)
    assert dctz_tpu.evaluate(x, y, 1e-3)["bound_satisfied"]
