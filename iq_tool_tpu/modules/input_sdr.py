"""Local SDR hardware inputs: rtlsdr, sdrplay, hackrf, bladerf.

TPU hosts have no radio hardware attached, but the modules keep full
option-surface and behavioral parity with the reference
(input_rtlsdr.c / input_sdrplay.c / input_hackrf.c / input_bladerf.c):

* every CLI option is registered so --help and validation match;
* device-independent logic (rtlsdr 10x integer gain mapping, bladerf
  adaptive stream profiles and dynamic transfer sizing, rate bounds) is
  implemented and unit-tested;
* rtlsdr has a real ctypes driver path (librtlsdr) used when the shared
  library is present; the others fail at initialize() with a clear
  "driver not available" message (the reference similarly dlopen()s
  vendor DLLs at runtime, input_sdrplay.c:57-167, input_bladerf.c:79-143).

All hardware callbacks feed the same lossy RingBuffer + heartbeat pattern
as the SpyServer client (SURVEY.md section 3.3).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import threading
import time
from typing import Iterator

from iq_tool_tpu import constants as C
from iq_tool_tpu.modules.base import Block, InputModule, SourceInfo
from iq_tool_tpu.utils.ringbuffer import make_ring as _make_ring
from iq_tool_tpu.utils.ringbuffer import RingBuffer



def _require(args, name: str, flag: str):
    v = getattr(args, name, None)
    if not v:
        raise ValueError(f"SDR inputs require {flag}")
    return v


# ------------------------------- pure logic ----------------------------------

def rtlsdr_gain_to_tenths(gain_db: float) -> int:
    """rtlsdr API takes tenths of dB as int (input_rtlsdr.c:113-116)."""
    return int(round(gain_db * 10.0))


def bladerf_stream_profile(sample_rate_hz: float) -> dict:
    """Adaptive stream profiles by rate (input_bladerf.c:537-552,
    constants.h:224-234): <1 / 1-5 / >=5 MSPS."""
    if sample_rate_hz < 1e6:
        return {"num_buffers": 16, "buffer_size": 8192, "num_transfers": 8}
    if sample_rate_hz < 5e6:
        return {"num_buffers": 32, "buffer_size": 16384, "num_transfers": 16}
    return {"num_buffers": 64, "buffer_size": 32768, "num_transfers": 32}


def bladerf_transfer_samples(sample_rate_hz: float) -> int:
    """Dynamic transfer size: 0.25 s of samples clamped to [4096, 16384],
    1024-aligned (input_bladerf.c:591-595)."""
    n = int(sample_rate_hz * 0.25)
    n = max(4096, min(16384, n))
    return (n // 1024) * 1024


def hackrf_validate_rate(rate_hz: float) -> None:
    """hackrf supports 2-20 MHz (input_hackrf.c:130)."""
    if not (2e6 <= rate_hz <= 20e6):
        raise ValueError(f"hackrf sample rate must be 2-20 MHz, got {rate_hz}")


def bladerf_needs_oversample(rate_hz: float) -> bool:
    """>61.44 MHz requires the oversample feature + 8-bit mode
    (input_bladerf.c:389-399)."""
    return rate_hz > 61.44e6


# ------------------------------- base class ----------------------------------

class _SdrInputBase(InputModule):
    is_realtime = True
    native_format = "cu8"
    default_rate = 2_400_000.0
    ring_bytes = 64 << 20

    def __init__(self):
        self._ring = _make_ring(self.ring_bytes)
        self._stop = threading.Event()
        self.heartbeat = 0.0
        self._rate = self.default_rate
        self._fmt = None
        self._buffered = False
        self._reset_pending = False
        self._dropped = 0
        self._dropped_warns = 0

    def _common_init(self, args) -> None:
        from iq_tool_tpu.formats import get_format
        _require(args, "sdr_rf_freq", "--sdr-rf-freq")
        self._rate = getattr(args, "sdr_sample_rate", None) or self.default_rate
        self._fmt = get_format(self.native_format)
        self._buffered = bool(getattr(args, "sdr_buffered", False))

    # -- producer-side helpers (hardware callbacks call these) ----------------

    def _deliver(self, payload: bytes) -> None:
        """Samples from the hardware callback into the ring (realtime: raw
        bytes; buffered: IQPK packets with resync framing)."""
        if self._buffered:
            from iq_tool_tpu.io import packets
            if self._reset_pending:
                # a reset event was dropped on a full ring earlier: it MUST
                # precede any further data or the gap would be spliced
                if packets.write_reset_event(self._ring, self._fmt.name):
                    self._reset_pending = False
            dropped = packets.write_interleaved_chunks(self._ring, payload,
                                                       self._fmt.name)
            if dropped:
                self._dropped += dropped
                if self._dropped_warns < 5:
                    self._dropped_warns += 1
                    from iq_tool_tpu.utils.log import get_logger
                    get_logger(self.name).warning(
                        "capture ring overrun: dropped %d samples total",
                        self._dropped)
        else:
            self._ring.write(payload)
        self.heartbeat = time.monotonic()

    def _deliver_reset(self) -> None:
        """Stream discontinuity (e.g. sdrplay stream-reset events,
        input_sdrplay.c:384-395).  Kept pending until it fits in the ring —
        losing it would splice the gap."""
        if self._buffered:
            from iq_tool_tpu.io import packets
            if not packets.write_reset_event(self._ring, self._fmt.name):
                self._reset_pending = True

    # -- consumer side ----------------------------------------------------------

    def blocks(self, frames_per_block: int) -> Iterator[Block]:
        self._start_hardware()
        if self._buffered:
            yield from self._packet_blocks(frames_per_block)
            return
        bpf = self._fmt.bytes_per_frame
        want = frames_per_block * bpf
        while True:
            buf = self._ring.read(want)
            if not buf:
                return
            yield Block(payload=buf[: len(buf) // bpf * bpf])
            if len(buf) < want:
                return

    def _packet_blocks(self, frames_per_block: int) -> Iterator[Block]:
        from iq_tool_tpu.io.packets import PacketReader
        reader = PacketReader(self._ring)
        bpf = self._fmt.bytes_per_frame
        want = frames_per_block * bpf
        buf = bytearray()
        next_disc = False
        while True:
            p = reader.read_packet()
            if p is None:
                if buf:
                    yield Block(payload=bytes(buf), discontinuity=next_disc)
                return
            if p.reset:
                if buf:
                    yield Block(payload=bytes(buf), discontinuity=next_disc)
                    buf.clear()
                next_disc = True
                continue
            buf.extend(p.payload)
            while len(buf) >= want:
                yield Block(payload=bytes(buf[:want]), discontinuity=next_disc)
                next_disc = False
                del buf[:want]

    def _start_hardware(self) -> None:
        raise NotImplementedError

    def close(self) -> None:
        self._stop.set()
        self._ring.signal_shutdown()


# --------------------------------- rtlsdr ------------------------------------

class RtlSdrInput(_SdrInputBase):
    name = "rtlsdr"
    native_format = "cu8"                  # input_rtlsdr.c:250
    default_rate = float(C.RTLSDR_DEFAULT_RATE)

    @classmethod
    def add_cli_options(cls, parser) -> None:
        g = parser.add_argument_group("RTL-SDR Options")
        g.add_argument("--rtlsdr-device-idx", type=int, default=0,
                       help="Select RTL-SDR device by index (default 0)")
        g.add_argument("--rtlsdr-gain", type=float, metavar="DB",
                       help="Manual tuner gain in dB (disables AGC)")
        g.add_argument("--rtlsdr-ppm", type=int, default=0,
                       help="Frequency correction in ppm")
        g.add_argument("--rtlsdr-direct-sampling", type=int, choices=(1, 2),
                       help="Direct sampling for HF (1=I branch, 2=Q branch)")

    def initialize(self, config, args) -> SourceInfo:
        self._common_init(args)
        libname = ctypes.util.find_library("rtlsdr")
        if not libname:
            raise ValueError(
                "rtlsdr input: librtlsdr not found on this host. TPU hosts "
                "have no USB radio hardware; use the spyserver-client input "
                "to stream from a remote SDR instead.")
        self._lib = ctypes.CDLL(libname)
        self._args = args
        dev = ctypes.c_void_p()
        idx = getattr(args, "rtlsdr_device_idx", 0)
        if self._lib.rtlsdr_open(ctypes.byref(dev), idx) != 0:
            raise ValueError(f"rtlsdr device {idx} could not be opened")
        self._dev = dev
        lib = self._lib
        lib.rtlsdr_set_sample_rate(dev, int(self._rate))
        lib.rtlsdr_set_center_freq(dev, int(args.sdr_rf_freq))
        if getattr(args, "rtlsdr_ppm", 0):
            lib.rtlsdr_set_freq_correction(dev, int(args.rtlsdr_ppm))
        if getattr(args, "rtlsdr_gain", None) is not None:
            lib.rtlsdr_set_tuner_gain_mode(dev, 1)
            lib.rtlsdr_set_tuner_gain(dev,
                                      rtlsdr_gain_to_tenths(args.rtlsdr_gain))
        else:
            lib.rtlsdr_set_tuner_gain_mode(dev, 0)
        if getattr(args, "rtlsdr_direct_sampling", None):
            lib.rtlsdr_set_direct_sampling(dev, int(args.rtlsdr_direct_sampling))
        if getattr(args, "sdr_bias_t", False):
            lib.rtlsdr_set_bias_tee(dev, 1)
        lib.rtlsdr_reset_buffer(dev)
        return SourceInfo(sample_rate=self._rate, sample_format="cu8",
                          total_frames=None)

    def close(self) -> None:
        super().close()
        dev = getattr(self, "_dev", None)
        if dev is not None:
            self._dev = None
            try:
                if getattr(self._args, "sdr_bias_t", False):
                    self._lib.rtlsdr_set_bias_tee(dev, 0)
                self._lib.rtlsdr_cancel_async(dev)
                self._lib.rtlsdr_close(dev)
            except Exception:
                pass  # device teardown is best-effort on exit

    def _start_hardware(self) -> None:
        def reader():
            n_read = ctypes.c_int(0)
            buflen = 16384 * 2
            buf = (ctypes.c_ubyte * buflen)()
            while not self._stop.is_set():
                dev = self._dev            # close() may null it under us
                if dev is None:
                    break
                r = self._lib.rtlsdr_read_sync(dev, buf, buflen,
                                               ctypes.byref(n_read))
                if r != 0:
                    break
                self._deliver(bytes(buf[: n_read.value]))
            self._ring.signal_end_of_stream()

        threading.Thread(target=reader, daemon=True, name="rtlsdr-rx").start()

    def summary(self) -> dict:
        return {"RTL-SDR Rate": f"{self._rate:.0f} Hz"}


# ------------------------- driver-gated module stubs --------------------------

class _DriverGated(_SdrInputBase):
    driver_lib = "?"

    def initialize(self, config, args) -> SourceInfo:
        self._common_init(args)
        libname = ctypes.util.find_library(self.driver_lib)
        if not libname:
            raise ValueError(
                f"{self.name} input: lib{self.driver_lib} not found on this "
                "host. TPU hosts have no radio hardware attached; use the "
                "spyserver-client input to stream from a remote SDR.")
        raise ValueError(
            f"{self.name}: driver found but the hardware path is not wired "
            "on TPU hosts yet; use spyserver-client")

    def _start_hardware(self) -> None:  # pragma: no cover
        raise NotImplementedError


class SdrPlayInput(_DriverGated):
    name = "sdrplay"
    native_format = "cs16"                 # input_sdrplay.c:752
    default_rate = 2_000_000.0
    driver_lib = "sdrplay_api"

    @classmethod
    def add_cli_options(cls, parser) -> None:
        g = parser.add_argument_group("SDRplay Options")
        g.add_argument("--sdrplay-device-idx", type=int, default=0)
        g.add_argument("--sdrplay-bandwidth", type=float, metavar="HZ",
                       help="Analog bandwidth in Hz (default 1.536e6)")
        g.add_argument("--sdrplay-lna-state", type=int, metavar="N",
                       help="LNA state, 0 = min gain (disables AGC)")
        g.add_argument("--sdrplay-if-gain", type=int, metavar="DB",
                       help="IF gain in dB (e.g. -20..-59; disables AGC)")
        g.add_argument("--sdrplay-antenna", metavar="PORT",
                       help="Antenna port (device-specific)")
        g.add_argument("--sdrplay-hdr-mode", action="store_true",
                       help="Enable HDR mode (RSPdx/RSPdxR2)")
        g.add_argument("--sdrplay-hdr-bw", type=float, metavar="HZ",
                       help="HDR mode bandwidth (requires --sdrplay-hdr-mode)")


class HackRfInput(_DriverGated):
    name = "hackrf"
    native_format = "cs8"                  # input_hackrf.c:303
    default_rate = 10_000_000.0
    driver_lib = "hackrf"

    @classmethod
    def add_cli_options(cls, parser) -> None:
        g = parser.add_argument_group("HackRF Options")
        g.add_argument("--hackrf-lna-gain", type=int, default=16, metavar="DB",
                       help="LNA (IF) gain in dB (default 16)")
        g.add_argument("--hackrf-vga-gain", type=int, default=0, metavar="DB",
                       help="VGA (baseband) gain in dB (default 0)")
        g.add_argument("--hackrf-amp-enable", action="store_true",
                       help="Enable the +14 dB front-end RF amplifier")


class BladeRfInput(_DriverGated):
    name = "bladerf"
    native_format = "sc16q11"              # input_bladerf.c:431
    default_rate = 2_000_000.0
    driver_lib = "bladeRF"

    @classmethod
    def add_cli_options(cls, parser) -> None:
        g = parser.add_argument_group("BladeRF Options")
        g.add_argument("--bladerf-device-idx", type=int, default=0)
        g.add_argument("--bladerf-load-fpga", metavar="FILE",
                       help="Load an FPGA bitstream from the given file")
        g.add_argument("--bladerf-bandwidth", type=float, metavar="HZ")
        g.add_argument("--bladerf-gain", type=int, metavar="DB",
                       help="Overall manual gain in dB (disables AGC)")
        g.add_argument("--bladerf-channel", type=int, choices=(0, 1), default=0,
                       help="BladeRF 2.0 RX channel (default 0)")
        g.add_argument("--bladerf-bit-depth", type=int, choices=(8, 12),
                       default=12,
                       help="Capture bit depth; 8-bit is BladeRF 2.0 only, "
                            "auto-selected above 61.44 MHz")


ALL = [RtlSdrInput, SdrPlayInput, HackRfInput, BladeRfInput]
