"""Real-hardware kernel assertions (run with WR_TPU=1 on a TPU host).

The regular suite pins everything on the CPU backend; these tests run
the SAME assertions on the real chip — Pallas kernel byte-identity with
the C++ coder, device round-trips, exact64 stream equality — so the
driver's bench run (or any TPU host) can execute them every round:

    WR_TPU=1 python -m pytest tests/test_tpu_hardware.py -q

Skipped (not failed) when WR_TPU is unset or no accelerator is present.
NOTE: the first device->host transfer through the axon tunnel can take
minutes (transfer-program setup); that cost is environmental, not the
kernels'.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("WR_TPU") != "1":
    pytest.skip("WR_TPU=1 not set (hardware tests opt-in)",
                allow_module_level=True)

# deliberately NOT the suite conftest's forced-CPU config: this module
# must see the real accelerator, so it neuters the cpu override.
import jax  # noqa: E402

if jax.devices()[0].platform == "cpu":
    pytest.skip("no accelerator visible", allow_module_level=True)

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from waverange_tpu import native as wn  # noqa: E402
from waverange_tpu.ops import rans  # noqa: E402


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_kernel_encode_byte_identity(rng):
    """Pallas kernel pipeline == C++ turbo coder, per distribution."""
    cases = [
        rng.normal(128, 20, 200000).clip(0, 255).astype(np.uint8),
        rng.integers(0, 256, 200000, np.uint8),        # raw escape
        np.full(130000, 9, np.uint8),                  # const blocks
        (rng.random(200000) < 0.02).astype(np.uint8),  # sparse
        rng.normal(100, 40, 2 * 65536).clip(0, 255)
        .astype(np.uint8),                             # exact blocks
    ]
    for data in cases:
        got = rans.encode_planes_device(jnp.asarray(data[None, :]),
                                        data.size)[0]
        want = wn.encode_plane(data, coder=1)
        assert got == want, (len(got), len(want))


def test_kernel_decode_roundtrip(rng):
    """Device decode of device-encoded planes is symbol-exact."""
    L, n = 4, 3 * 65536 + 12345
    planes = rng.normal(120, 25, (L, n)).clip(0, 255).astype(np.uint8)
    dev = jnp.asarray(planes)
    streams = rans.encode_planes_device(dev, n)
    back = np.asarray(rans.decode_planes_device(streams, n))
    assert np.array_equal(back, planes)


def test_kernel_decode_near_raw_blocks(rng):
    """Near-raw modeled blocks (wlen in (31744, 32510)) exercise the
    dchain window hierarchy's top granule clamps (g2 in {8,9}, c1 up to
    10): a uniform alphabet of ~225-245 symbols lands in that band while
    still beating the raw escape."""
    for k in (225, 235, 240):
        data = rng.integers(0, k, 2 * 65536).astype(np.uint8)
        s = wn.encode_plane(data, coder=1)
        batch, raws, *_rest, wlen_a, _bs = rans._parse_to_batch(
            [s], [data.size])
        assert len(batch) >= 1, "expected modeled blocks"
        back = np.asarray(rans.decode_planes_device([s], data.size))[0]
        assert np.array_equal(back, data), f"k={k}"


def test_device_codec_roundtrip_envelope(rng):
    """Whole-field device codec at a conforming tolerance."""
    from waverange_tpu.core import codec

    from conftest import smooth_field
    fld = smooth_field((64, 64, 64), rng, noise=1e-3)
    tol = 1e-8
    enc = codec.encode_field(fld, tol, backend="jax", coder="rans",
                             entropy="device")
    dec = codec.decode_field(enc, backend="jax", entropy="device")
    assert np.abs(dec - fld).max() <= 1.3 * tol * np.abs(fld).max()


def test_conformance_guard_on_device():
    """strict conformance refuses below-floor tolerances on device."""
    from waverange_tpu.core import codec

    fld = np.random.default_rng(0).standard_normal((16, 16, 16))
    with pytest.raises(ValueError, match="error floor"):
        codec.encode_field(fld, 1e-16, backend="jax", coder="rans",
                           entropy="device")


def test_conformance_route_on_device(rng):
    """conformance='route' falls back to a conforming backend below the
    device floor: with entropy='device' the stream must equal exact64's
    (== the native C++ stream, bit for bit)."""
    from waverange_tpu.core import codec

    from conftest import smooth_field
    fld = smooth_field((32, 32, 32), rng, noise=1e-4)
    enc = codec.encode_field(fld, 1e-16, backend="jax", coder="rans",
                             entropy="device", conformance="route")
    want = wn.encode_field(fld, wtflag=1, cutoff=np.array([1e-16]),
                           coder=1)
    assert enc.data == want["data"], "routed stream != native stream"
    # above the floor the device path is used unchanged
    enc2 = codec.encode_field(fld, 1e-7, backend="jax", coder="rans",
                              entropy="device", conformance="route")
    dev = codec.encode_field(fld, 1e-7, backend="jax", coder="rans",
                             entropy="device", conformance="strict")
    assert enc2.data == dev.data


def test_margin_envelope_on_device(rng):
    """Error-contract margin of the device path across sizes and
    conforming tolerances: err <= 1.3 * tol * max|fld| with measured
    headroom (the r3 squeeze was 80% of budget at 512^3/1e-10)."""
    from waverange_tpu.core import codec

    from conftest import smooth_field
    for N in (64, 128):
        fld = smooth_field((N, N, N), rng, noise=1e-3)
        maxabs = float(np.abs(fld).max())
        for tol in (1e-7, 1e-10):
            enc = codec.encode_field(fld, tol, backend="jax",
                                     coder="rans", entropy="device")
            dec = codec.decode_field(enc, backend="jax",
                                     entropy="device")
            err = float(np.abs(dec - fld).max())
            frac = err / (1.3 * tol * maxabs)
            assert frac <= 1.0, (N, tol, err, frac)


@pytest.mark.slow
def test_exact64_on_chip_stream_identity(rng):
    """Software-IEEE f64 on the chip == native C++ stream, bit for bit
    (32^3 cube keeps lifting-graph compiles small)."""
    from waverange_tpu.core import exact64

    from conftest import smooth_field
    a = smooth_field((32, 32, 32), rng, noise=1e-4)
    got = exact64.encode_field_exact64(a, 1e-16, entropy="host", coder=1)
    want = wn.encode_field(a, wtflag=1, cutoff=np.array([1e-16]),
                           coder=1)
    assert got["nlay"] == want["nlay"]
    assert np.array_equal(got["deps_vec"], want["deps_vec"])
    assert got["data"] == want["data"]
    dec = exact64.decode_field_exact64(got, a.shape, entropy="host",
                                       coder=1)
    dref = wn.decode_field(want, a.shape, coder=1)
    assert np.array_equal(dec.view(np.uint64), dref.view(np.uint64))
