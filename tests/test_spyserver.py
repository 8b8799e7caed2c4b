"""SpyServer client against an in-process fake server (protocol bytes only,
SURVEY.md section 4 item 5)."""

import socket
import struct
import threading

import numpy as np
import pytest

from iq_tool_tpu.modules.input_spyserver import (
    _CMD_HEADER, _DEVICE_INFO, _MSG_HEADER, CMD_HELLO, CMD_SET_SETTING,
    MSG_CLIENT_SYNC, MSG_DEVICE_INFO, MSG_UINT8_IQ, PROTOCOL_VERSION,
    SETTING_IQ_DECIMATION, SETTING_STREAMING_ENABLED, SpyServerInput)
from iq_tool_tpu.utils.ringbuffer import RingBuffer


class FakeSpyServer:
    """Minimal v2.0.1700 server: handshake, settings log, cu8 IQ stream."""

    def __init__(self, max_rate=2_500_000, min_dec=1, dec_count=4,
                 forced_fmt=0, can_control=1, n_frames=40_000):
        self.settings = {}
        self.max_rate = max_rate
        self.min_dec = min_dec
        self.dec_count = dec_count
        self.forced_fmt = forced_fmt
        self.can_control = can_control
        self.n_frames = n_frames
        self.hello_payload = None
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        self.port = srv.getsockname()[1]
        self._srv = srv
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _recv_all(self, c, n):
        buf = b""
        while len(buf) < n:
            chunk = c.recv(n - len(buf))
            if not chunk:
                raise ConnectionError
            buf += chunk
        return buf

    def _send_msg(self, c, mtype, body):
        c.sendall(_MSG_HEADER.pack(PROTOCOL_VERSION, mtype, 0, 0, len(body))
                  + body)

    def _serve(self):
        c, _ = self._srv.accept()
        try:
            # HELLO
            cmd, size = _CMD_HEADER.unpack(self._recv_all(c, _CMD_HEADER.size))
            assert cmd == CMD_HELLO
            self.hello_payload = self._recv_all(c, size)
            # DeviceInfo + ClientSync
            di = _DEVICE_INFO.pack(3, 42, self.max_rate, 0, self.dec_count,
                                   10, 29, 24_000_000, 1_700_000_000, 8,
                                   self.min_dec, self.forced_fmt)
            self._send_msg(c, MSG_DEVICE_INFO, di)
            sync = struct.pack("<9I", self.can_control, 0, 100_000_000,
                               100_000_000, 0, 0, 0xFFFFFFFF, 0, 0)
            self._send_msg(c, MSG_CLIENT_SYNC, sync)
            # settings until STREAMING_ENABLED=1
            while True:
                cmd, size = _CMD_HEADER.unpack(
                    self._recv_all(c, _CMD_HEADER.size))
                body = self._recv_all(c, size)
                if cmd != CMD_SET_SETTING:
                    continue
                setting, value = struct.unpack("<2I", body)
                self.settings[setting] = value
                if setting == SETTING_STREAMING_ENABLED and value == 1:
                    break
            # stream deterministic cu8 frames then close
            rng = np.random.default_rng(0)
            payload = rng.integers(0, 256, self.n_frames * 2,
                                   dtype=np.uint8).tobytes()
            self.payload = payload
            for i in range(0, len(payload), 8192):
                self._send_msg(c, MSG_UINT8_IQ, payload[i:i + 8192])
            c.shutdown(socket.SHUT_WR)
            self._recv_all(c, 1)
        except (ConnectionError, AssertionError, OSError):
            pass
        finally:
            c.close()
            self._srv.close()


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, _):
        return None


def _connect(server, **extra):
    mod = SpyServerInput()
    args = _Args(spyserver_client_host="127.0.0.1",
                 spyserver_client_port=server.port,
                 spyserver_client_format="cu8",
                 sdr_rf_freq=100e6, **extra)
    info = mod.initialize(None, args)
    return mod, info


def test_handshake_and_rate_negotiation():
    srv = FakeSpyServer(max_rate=2_500_000, min_dec=1, dec_count=4)
    mod, info = _connect(srv, sdr_sample_rate=600_000.0)
    # rates: 1.25M, 625k, 312.5k, 156.25k -> closest to 600k is 625k (dec 2)
    assert info.sample_rate == 625_000.0
    assert info.sample_format == "cu8"
    mod.close()
    assert srv.hello_payload[:4] == struct.pack("<I", PROTOCOL_VERSION)
    assert b"iq_tool_tpu" in srv.hello_payload


def test_stream_delivers_bytes():
    srv = FakeSpyServer(n_frames=30_000)
    mod, info = _connect(srv)
    got = b""
    for block in mod.blocks(8192):
        got += block.payload
    mod.close()
    assert got == srv.payload[: len(got)]
    assert len(got) == 30_000 * 2
    assert srv.settings[SETTING_IQ_DECIMATION] == 1  # default = highest rate


def test_forced_format():
    srv = FakeSpyServer(forced_fmt=2)  # server forces cs16
    mod, info = _connect(srv)
    assert info.sample_format == "cs16"
    mod.close()


def test_cannot_control():
    srv = FakeSpyServer(can_control=0)
    with pytest.raises(ValueError, match="control"):
        _connect(srv)


def test_requires_rf_freq():
    srv = FakeSpyServer()
    mod = SpyServerInput()
    args = _Args(spyserver_client_host="127.0.0.1",
                 spyserver_client_port=srv.port,
                 spyserver_client_format="cu8")
    with pytest.raises(ValueError, match="sdr-rf-freq"):
        mod.initialize(None, args)


def test_ringbuffer_semantics():
    rb = RingBuffer(16)
    assert rb.write(b"0123456789") == 10
    assert rb.write(b"abcdefghij") == 6          # lossy short write
    assert rb.read(16) == b"0123456789abcdef"
    rb.write(b"xy")
    rb.signal_end_of_stream()
    assert rb.read(10) == b"xy"                  # EOS drains what's left
    assert rb.read(10) == b""
