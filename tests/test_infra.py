"""Packet serializer (incl. corruption resync), watchdog, checkpoint/resume."""

import time

import numpy as np
import pytest

from iq_tool_tpu.io import packets
from iq_tool_tpu.utils.ringbuffer import RingBuffer
from iq_tool_tpu.utils.watchdog import Watchdog


def test_packet_roundtrip_interleaved(rng):
    ring = RingBuffer(1 << 20)
    data = rng.integers(0, 256, 50_000 * 2, dtype=np.uint8).tobytes()
    dropped = packets.write_interleaved_chunks(ring, data, "cu8")
    assert dropped == 0
    ring.signal_end_of_stream()
    r = packets.PacketReader(ring)
    got = b""
    sizes = []
    while (p := r.read_packet()) is not None:
        assert p.format_name == "cu8"
        sizes.append(p.num_samples)
        got += p.payload
    assert got == data
    assert max(sizes) <= packets.MAX_PACKET_SAMPLES
    assert r.resync_count == 0


def test_packet_planar_reinterleave(rng):
    ring = RingBuffer(1 << 20)
    xi = rng.integers(-2 ** 15, 2 ** 15, 20_000, dtype=np.int16)
    xq = rng.integers(-2 ** 15, 2 ** 15, 20_000, dtype=np.int16)
    assert packets.write_planar_shorts(ring, xi, xq) == 0
    ring.signal_end_of_stream()
    r = packets.PacketReader(ring)
    got = b""
    while (p := r.read_packet()) is not None:
        got += p.payload
    out = np.frombuffer(got, np.int16)
    np.testing.assert_array_equal(out[0::2], xi)
    np.testing.assert_array_equal(out[1::2], xq)


def test_packet_resync_after_corruption(rng):
    ring = RingBuffer(1 << 20)
    a = rng.integers(0, 256, 1000 * 2, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 1000 * 2, dtype=np.uint8).tobytes()
    packets.write_interleaved_chunks(ring, a, "cu8")
    ring.write(b"\xde\xad\xbe\xef" * 7)          # corruption between packets
    packets.write_interleaved_chunks(ring, b, "cu8")
    ring.signal_end_of_stream()
    r = packets.PacketReader(ring)
    p1 = r.read_packet()
    p2 = r.read_packet()
    assert p1.payload == a
    assert p2 is not None and p2.payload == b
    assert r.resync_count > 0


def test_packet_reset_event():
    ring = RingBuffer(4096)
    packets.write_reset_event(ring, "cs16")
    packets.write_interleaved_chunks(ring, b"\x01\x02\x03\x04", "cs16")
    ring.signal_end_of_stream()
    r = packets.PacketReader(ring)
    p = r.read_packet()
    assert p.reset and p.num_samples == 0
    p = r.read_packet()
    assert not p.reset and p.payload == b"\x01\x02\x03\x04"


def test_packet_overrun_drops(rng):
    ring = RingBuffer(1024)
    data = rng.integers(0, 256, 10_000 * 2, dtype=np.uint8).tobytes()
    dropped = packets.write_interleaved_chunks(ring, data, "cu8")
    assert dropped > 0


def test_watchdog_fires():
    fired = []
    hb = time.monotonic() - 100.0
    w = Watchdog(lambda: hb, stale_sec=0.2, poll_sec=0.05,
                 on_stale=lambda msg: fired.append(msg))
    w.start()
    time.sleep(0.4)
    w.stop()
    assert fired and "stalled" in fired[0]


def test_watchdog_quiet_when_alive():
    fired = []
    w = Watchdog(time.monotonic, stale_sec=1.0, poll_sec=0.05,
                 on_stale=lambda msg: fired.append(msg))
    w.start()
    time.sleep(0.3)
    w.stop()
    assert not fired


def test_checkpoint_resume_exact(tmp_path, rng):
    """Resuming mid-stream reproduces the uninterrupted output exactly."""
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
    from iq_tool_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True, agc_profile="local",
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=4096)
    ch = Chain(cfg)
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, ch.in_wire_len)).astype(np.int16)
            for _ in range(4)]

    # uninterrupted run
    carry = ch.init_carry()
    outs = []
    for raw in raws:
        carry, out = ch.step(carry, raw, np.False_)
        outs.append(np.asarray(out))

    # run 2 blocks, checkpoint, reload, run the rest
    carry = ch.init_carry()
    for raw in raws[:2]:
        carry, out = ch.step(carry, raw, np.False_)
    path = str(tmp_path / "state.ckpt")
    save_checkpoint(path, carry, frames_in=2 * ch.n_in,
                    frames_out=2 * ch.n_out, meta={"cfg": "test"})

    carry2, fin, fout, extra = load_checkpoint(path, ch.init_carry())
    assert fin == 2 * ch.n_in and fout == 2 * ch.n_out
    assert extra == {"cfg": "test"}
    for i, raw in enumerate(raws[2:]):
        carry2, out = ch.step(carry2, raw, np.False_)
        np.testing.assert_array_equal(np.asarray(out), outs[2 + i])


def test_checkpoint_rejects_mismatched_chain(tmp_path, rng):
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
    from iq_tool_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint

    ch1 = Chain(ChainConfig(input_format="cs16", output_format="cs16",
                            input_rate=1_000_000.0, target_rate=500_000.0,
                            target_block=4096))
    ch2 = Chain(ChainConfig(input_format="cs16", output_format="cs16",
                            input_rate=1_000_000.0, target_rate=250_000.0,
                            target_block=4096))
    path = str(tmp_path / "s.ckpt")
    save_checkpoint(path, ch1.init_carry(), 0, 0)
    with pytest.raises(ValueError, match="mismatch|structure|treedef|leaves"):
        load_checkpoint(path, ch2.init_carry())


def test_sdr_buffered_packet_blocks(rng):
    """Buffered capture: packets -> blocks with reset propagation."""
    from iq_tool_tpu.modules.input_sdr import _SdrInputBase

    class FakeSdr(_SdrInputBase):
        name = "fake"
        native_format = "cu8"

        def initialize(self, config, args):
            pass

        def _start_hardware(self):
            pass

    class _A:
        sdr_rf_freq = 1e6
        sdr_sample_rate = None
        sdr_buffered = True

    mod = FakeSdr()
    mod._common_init(_A())
    a = rng.integers(0, 256, 5000 * 2, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 3000 * 2, dtype=np.uint8).tobytes()
    mod._deliver(a)
    mod._deliver_reset()
    mod._deliver(b)
    mod._ring.signal_end_of_stream()
    blocks = list(mod.blocks(2048))
    # stream content preserved and the first post-reset block flagged
    payload = b"".join(blk.payload for blk in blocks)
    assert payload == a + b
    disc_flags = [blk.discontinuity for blk in blocks]
    assert sum(disc_flags) == 1
    # the discontinuity lands at the block containing the reset boundary
    idx = disc_flags.index(True)
    before = sum(len(blk.payload) for blk in blocks[:idx])
    assert before <= len(a) <= before + len(blocks[idx].payload)


def test_api_demo_example():
    """The examples/api_demo.py script runs end to end."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "api_demo", os.path.join(os.path.dirname(__file__), "..",
                                 "examples", "api_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def test_ringbuffer_write_all_alignment():
    """write_all never splits a message (partial writes would shift frame
    boundaries for 6-byte cs24 frames in a pow2 ring)."""
    from iq_tool_tpu.utils.ringbuffer import RingBuffer
    rb = RingBuffer(16)
    assert rb.write_all(b"abcdef")          # 6
    assert rb.write_all(b"ghijkl")          # 12
    assert not rb.write_all(b"mnopqr")      # would need 18 > 16: all-or-nothing
    assert rb.read(12) == b"abcdefghijkl"
    assert rb.write_all(b"mnopqr")


def test_filename_parse_picks_last_hz_marker():
    from iq_tool_tpu.io.metadata import parse_filename
    md = parse_filename("notch_60Hz_SDRSharp_20240101_000000Z_145000000Hz.wav")
    assert md.center_freq_hz == 145000000.0


def test_crashed_wav_header_reads_to_eof(tmp_path):
    """A writer that died before finalize leaves size 0 placeholders; the
    reader must trust the file size, not walk the payload as chunks."""
    import struct

    import numpy as np

    from iq_tool_tpu.io.wav import WavReader
    data = np.zeros(4096, np.int16).tobytes()     # silence: worst case
    hdr = b"RIFF" + struct.pack("<I", 0) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 48000, 192000, 4, 16)
    hdr += b"data" + struct.pack("<I", 0)         # unpatched
    path = tmp_path / "crashed.wav"
    path.write_bytes(hdr + data)
    info = WavReader(str(path)).info
    assert info.data_bytes == len(data)
    assert info.frames == len(data) // 4


def test_rtlsdr_mock_driver(monkeypatch):
    """Exercise the rtlsdr ctypes plumbing end-to-end with a fake librtlsdr:
    open/configure, sync reads into the ring, bias-T + close teardown."""
    import ctypes
    import ctypes.util

    from iq_tool_tpu.modules.input_sdr import RtlSdrInput

    calls = []

    class FakeLib:
        def __getattr__(self, name):
            def fn(*a):
                calls.append(name)
                if name == "rtlsdr_open":
                    a[0]._obj.value = 1234
                    return 0
                if name == "rtlsdr_read_sync":
                    if calls.count("rtlsdr_read_sync") > 3:
                        return -1          # stop the reader loop
                    n = ctypes.cast(a[3], ctypes.POINTER(ctypes.c_int))
                    n.contents.value = 4096
                    ctypes.memset(a[1], 127, 4096)
                    return 0
                return 0
            return fn

    monkeypatch.setattr(ctypes.util, "find_library", lambda n: "fake_rtlsdr")
    monkeypatch.setattr(ctypes, "CDLL", lambda path: FakeLib())

    class Args:
        sdr_rf_freq = 100e6
        sdr_sample_rate = 2_048_000.0
        sdr_bias_t = True
        rtlsdr_device_idx = 0
        rtlsdr_gain = 19.7
        rtlsdr_ppm = 5
        rtlsdr_direct_sampling = None
        sdr_buffered = False

        def __getattr__(self, _):
            return None

    mod = RtlSdrInput()
    info = mod.initialize(None, Args())
    assert info.sample_format == "cu8"
    assert "rtlsdr_set_bias_tee" in calls
    assert "rtlsdr_set_tuner_gain" in calls
    got = bytearray()
    for blk in mod.blocks(2048):
        got.extend(blk.payload)
        if len(got) >= 3 * 4096:
            break
    assert len(got) >= 3 * 4096 and set(got) == {127}
    mod.close()
    assert "rtlsdr_cancel_async" in calls and "rtlsdr_close" in calls
    # bias-T disabled on the way out
    assert calls.count("rtlsdr_set_bias_tee") == 2


def test_hackrf_mock_driver(monkeypatch):
    """HackRF ctypes plumbing: configure, async callback -> ring, teardown."""
    import ctypes
    import ctypes.util

    from iq_tool_tpu.modules.input_sdr import HackRfInput, _HackRfTransfer

    calls = []
    holder = {}

    class FakeLib:
        def __getattr__(self, name):
            def fn(*a):
                calls.append(name)
                if name == "hackrf_open":
                    a[0]._obj.value = 77
                    return 0
                if name == "hackrf_start_rx":
                    holder["cb"] = a[1]
                    return 0
                return 0
            return fn

    monkeypatch.setattr(ctypes.util, "find_library", lambda n: "fake_hackrf")
    monkeypatch.setattr(ctypes, "CDLL", lambda path: FakeLib())

    class Args:
        sdr_rf_freq = 100e6
        sdr_sample_rate = 10_000_000.0
        sdr_bias_t = True
        hackrf_lna_gain = 24
        hackrf_vga_gain = 8
        hackrf_amp_enable = True

        def __getattr__(self, _):
            return None

    mod = HackRfInput()
    info = mod.initialize(None, Args())
    assert info.sample_format == "cs8"
    assert {"hackrf_set_lna_gain", "hackrf_set_vga_gain",
            "hackrf_set_amp_enable",
            "hackrf_set_antenna_enable"} <= set(calls)
    gen = mod.blocks(1024)
    # deliver two fake transfers through the registered callback
    import threading

    def pump():
        buf = (ctypes.c_ubyte * 4096)(*([3] * 4096))
        t = _HackRfTransfer(device=None, buffer=buf, buffer_length=4096,
                            valid_length=4096)
        for _ in range(2):
            holder["cb"](ctypes.pointer(t))
        mod._ring.signal_end_of_stream()

    # start hardware happens on first next(); pump after the callback
    # registers (bounded wait so a registration failure can't hang pytest)
    import time as _t

    def delayed():
        for _ in range(500):
            if "cb" in holder:
                pump()
                return
            _t.sleep(0.01)
        mod._ring.signal_end_of_stream()

    th = threading.Thread(target=delayed, daemon=True)
    th.start()
    got = bytearray()
    for blk in gen:
        got.extend(blk.payload)
    th.join()
    assert len(got) == 8192 and set(got) == {3}
    mod.close()
    assert "hackrf_stop_rx" in calls and "hackrf_close" in calls


def test_bladerf_mock_driver(monkeypatch):
    """BladeRF ctypes plumbing: profile config, sync RX loop, teardown."""
    import ctypes
    import ctypes.util

    from iq_tool_tpu.modules.input_sdr import BladeRfInput

    calls = []

    class FakeLib:
        def __getattr__(self, name):
            def fn(*a):
                calls.append(name)
                if name == "bladerf_open":
                    a[0]._obj.value = 99
                    return 0
                if name == "bladerf_set_sample_rate":
                    ctypes.cast(a[3], ctypes.POINTER(ctypes.c_uint)) \
                        .contents.value = int(a[2])
                    return 0
                if name == "bladerf_sync_rx":
                    if calls.count("bladerf_sync_rx") > 2:
                        return -1
                    ctypes.memset(a[1], 9, 1024)
                    return 0
                if name == "bladerf_is_fpga_configured":
                    return 1          # already flashed -> no autoload
                return 0
            return fn

    monkeypatch.setattr(ctypes.util, "find_library", lambda n: "fake_bladerf")
    monkeypatch.setattr(ctypes, "CDLL", lambda path: FakeLib())

    class Args:
        sdr_rf_freq = 433e6
        sdr_sample_rate = 2_000_000.0
        bladerf_gain = 30
        bladerf_bit_depth = 12

        def __getattr__(self, _):
            return None

    mod = BladeRfInput()
    info = mod.initialize(None, Args())
    assert info.sample_format == "sc16q11"
    assert {"bladerf_sync_config", "bladerf_enable_module",
            "bladerf_set_gain_mode", "bladerf_set_gain"} <= set(calls)
    got = bytearray()
    for blk in mod.blocks(128):
        got.extend(blk.payload)
        if len(got) >= 1024:
            break
    assert len(got) >= 1024
    mod.close()
    assert "bladerf_close" in calls


def test_bladerf_oversample_mode(monkeypatch):
    """>61.44 MHz: oversample feature + rational rate + auto 8-bit
    (input_bladerf.c:251-275, 445-484)."""
    import ctypes
    import ctypes.util

    from iq_tool_tpu.modules.input_sdr import (BladeRfInput,
                                               bladerf_resolve_bit_depth)

    # pure bit-depth resolution matrix
    assert bladerf_resolve_bit_depth(122.88e6, None) == (8, True)
    assert bladerf_resolve_bit_depth(122.88e6, 8) == (8, False)
    assert bladerf_resolve_bit_depth(2e6, None) == (12, False)
    assert bladerf_resolve_bit_depth(2e6, 8) == (8, False)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="12-bit"):
        bladerf_resolve_bit_depth(122.88e6, 12)

    calls = []

    class FakeLib:
        def __getattr__(self, name):
            def fn(*a):
                calls.append(name)
                if name == "bladerf_open":
                    a[0]._obj.value = 99
                    return 0
                if name == "bladerf_set_rational_sample_rate":
                    got = a[3]._obj
                    want = a[2]._obj
                    got.integer = want.num - 5     # "actual" differs a bit
                    got.num = 0
                    got.den = 1
                    return 0
                if name == "bladerf_is_fpga_configured":
                    return 1          # already flashed -> no autoload
                return 0
            return fn

    monkeypatch.setattr(ctypes.util, "find_library", lambda n: "fake_bladerf")
    monkeypatch.setattr(ctypes, "CDLL", lambda path: FakeLib())

    class Args:
        sdr_rf_freq = 2.4e9
        sdr_sample_rate = 122_880_000.0
        bladerf_bit_depth = None

        def __getattr__(self, _):
            return None

    mod = BladeRfInput()
    info = mod.initialize(None, Args())
    assert info.sample_format == "cs8"             # auto 8-bit
    assert info.sample_rate == 122_880_000.0 - 5   # actual from the device
    assert "bladerf_enable_feature" in calls
    assert "bladerf_set_rational_sample_rate" in calls
    assert "bladerf_set_sample_rate" not in calls
    assert "bladerf_set_bandwidth" not in calls    # automatic in this mode
    mod.close()

    # 12-bit request above the limit is rejected before opening hardware
    class Bad12(Args):
        bladerf_bit_depth = 12

    import pytest
    with pytest.raises(ValueError, match="12-bit"):
        BladeRfInput().initialize(None, Bad12())

    # bandwidth + high-speed mode is rejected
    class BadBw(Args):
        bladerf_bandwidth = 10e6

    with pytest.raises(ValueError, match="bandwidth"):
        BladeRfInput().initialize(None, BadBw())
