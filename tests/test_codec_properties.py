"""Error-control regression: the paper's core quality claim (measured
L-inf error within ~20-30% of the requested tolerance except at
round-off-limited tolerances; doc/cfdproc2017.pdf p.2 Fig.3)."""
import numpy as np
import pytest

from waverange_tpu.core import codec
from conftest import smooth_field


@pytest.mark.parametrize("tol", [1e-2, 1e-4, 1e-6, 1e-8, 1e-10, 1e-12])
def test_error_control_sweep(tol):
    a = smooth_field((40, 36, 32))
    a = a + 0.02 * np.abs(a).max() * \
        np.random.default_rng(7).standard_normal(a.shape)
    e = codec.encode_field(a, tol, backend="native")
    r = codec.decode_field(e, backend="native")
    err = np.abs(r - a).max()
    assert err <= 1.3 * tol * np.abs(a).max()


def test_monotone_size_vs_tolerance():
    a = smooth_field((32, 32, 32))
    sizes = [codec.encode_field(a, t, backend="native").ntot_enc
             for t in (1e-2, 1e-5, 1e-8, 1e-11, 1e-14)]
    assert sizes == sorted(sizes), sizes
