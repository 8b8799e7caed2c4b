"""Native C++ runtime library: build, ring semantics, packing parity."""

import threading

import numpy as np
import pytest

from iq_tool_tpu import native

built = native.ensure_built()
pytestmark = pytest.mark.skipif(not built, reason="no C++ toolchain")


def test_ring_basic():
    rb = native.NativeRingBuffer(16)
    assert rb.write(b"0123456789") == 10
    assert rb.write(b"abcdefghij") == 6            # lossy short write
    assert rb.read(16) == b"0123456789abcdef"
    rb.write(b"xy")
    rb.signal_end_of_stream()
    assert rb.read(10) == b"xy"
    assert rb.read(10) == b""
    assert rb.end_of_stream


def test_ring_blocking_read_producer_consumer():
    rb = native.NativeRingBuffer(1 << 16)
    payload = bytes(range(256)) * 500

    def producer():
        for i in range(0, len(payload), 4096):
            while rb.free < 4096:
                pass
            rb.write(payload[i:i + 4096])
        rb.signal_end_of_stream()

    t = threading.Thread(target=producer)
    t.start()
    got = b""
    while True:
        chunk = rb.read(8192)
        if not chunk:
            break
        got += chunk
        if len(chunk) < 8192:
            break
    t.join()
    assert got == payload


def test_ring_shutdown_unblocks():
    rb = native.NativeRingBuffer(64)
    result = {}

    def reader():
        result["data"] = rb.read(10)

    t = threading.Thread(target=reader)
    t.start()
    rb.signal_shutdown()
    t.join(timeout=2)
    assert not t.is_alive()
    assert result["data"] == b""


def test_cs24_pack_unpack_parity(rng):
    vals = rng.integers(-(1 << 23), 1 << 23, 10_000).astype(np.int32)
    packed = native.pack_cs24(vals)
    assert len(packed) == 30_000
    back = native.unpack_cs24(packed)
    np.testing.assert_array_equal(back, vals)
    # parity with the pure-numpy fallback path
    b = np.frombuffer(packed, np.uint8).reshape(-1, 3).astype(np.int32)
    ref = ((b[:, 0] << 8) | (b[:, 1] << 16) | (b[:, 2] << 24)) >> 8
    np.testing.assert_array_equal(back, ref)


def test_interleave_parity(rng):
    xi = rng.integers(-2 ** 15, 2 ** 15, 5000).astype(np.int16)
    xq = rng.integers(-2 ** 15, 2 ** 15, 5000).astype(np.int16)
    out = native.interleave_shorts(xi, xq)
    np.testing.assert_array_equal(out[0::2], xi)
    np.testing.assert_array_equal(out[1::2], xq)
