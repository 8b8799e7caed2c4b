"""SDRplay input: pure option-matrix helpers + mock-driver streaming path.

Mirrors the rtlsdr/hackrf mock-driver pattern (tests/test_infra.py): a
fake libsdrplay_api exercises the real ctypes plumbing — open/select/
configure, planar-short stream callbacks, reset -> discontinuity,
power-overload ack, teardown — without hardware.
"""

import ctypes
import ctypes.util
import threading
import time

import numpy as np
import pytest

from iq_tool_tpu.modules import sdrplay_api as sp
from iq_tool_tpu.modules.input_sdr import SdrPlayInput


# ---------------------------- pure helpers -----------------------------------

def test_bw_mapping():
    assert sp.bw_hz_to_enum(1_536_000.0) == 1536
    assert sp.bw_hz_to_enum(200_000.0) == 200
    assert sp.bw_hz_to_enum(1_000_000.0) == sp.BW_UNDEFINED


def test_hdr_bw_mapping():
    assert sp.hdr_bw_to_enum(1_700_000.0) == sp.HDRMODE_BW_1_700
    assert sp.hdr_bw_to_enum(123.0) is None


@pytest.mark.parametrize("hw,freq,hdr,hiz,want", [
    (sp.RSP1, 100e6, False, False, 4),
    (sp.RSP1A, 50e6, False, False, 7),
    (sp.RSP1A, 500e6, False, False, 10),
    (sp.RSP1A, 1.5e9, False, False, 9),
    (sp.RSP2, 30e6, False, True, 5),
    (sp.RSP2, 100e6, False, False, 9),
    (sp.RSP2, 500e6, False, False, 6),
    (sp.RSPduo, 30e6, False, True, 5),
    (sp.RSPduo, 50e6, False, False, 7),
    (sp.RSPdx, 1e6, True, False, 21),
    (sp.RSPdx, 10e6, False, False, 14),
    (sp.RSPdx, 55e6, False, False, 28),
    (sp.RSPdx, 100e6, False, False, 27),
    (sp.RSPdx, 900e6, False, False, 21),
    (sp.RSPdxR2, 2e9, False, False, 19),
])
def test_lna_state_matrix(hw, freq, hdr, hiz, want):
    """Parity with input_sdrplay.c:328-360."""
    assert sp.num_lna_states(hw, freq, hdr, hiz) == want


def test_lna_inversion():
    # user 0 = min gain -> API n-1 (max reduction), input_sdrplay.c:745-750
    assert sp.lna_state_for_api(0, 27) == 26
    assert sp.lna_state_for_api(26, 27) == 0


# --------------------------- mock-driver path --------------------------------

class FakeSdrplayLib:
    """Emulates the sdrplay_api service entry points."""

    def __init__(self, hw_ver=sp.RSPdx, init_err=0, errstr=b"ok"):
        self.calls = []
        self.update_reasons = []       # (reasonForUpdate, reasonExt1) pairs
        self.hw_ver = hw_ver
        self.init_err = init_err
        self.errstr = errstr
        self.dev_params = sp.DevParamsT()
        self.rx_a = sp.RxChannelParams()
        self.params = sp.DeviceParamsT(
            devParams=ctypes.pointer(self.dev_params),
            rxChannelA=ctypes.pointer(self.rx_a))
        self.cbfns = None

    def __getattr__(self, name):
        if not name.startswith("sdrplay_api_"):
            raise AttributeError(name)

        def fn(*a):
            self.calls.append(name)
            if name == "sdrplay_api_Update":
                self.update_reasons.append((int(a[2]), int(a[3])))
            if name == "sdrplay_api_GetDevices":
                devs = a[0]
                devs[0].SerNo = b"FAKE0001"
                devs[0].hwVer = self.hw_ver
                devs[0].valid = 1
                devs[0].dev = 42
                a[1]._obj.value = 1
                return sp.SUCCESS
            if name == "sdrplay_api_GetDeviceParams":
                a[1]._obj.contents = self.params
                return sp.SUCCESS
            if name == "sdrplay_api_Init":
                self.cbfns = a[1]._obj
                return self.init_err
            if name == "sdrplay_api_GetErrorString":
                return self.errstr
            return sp.SUCCESS
        return fn


class Args:
    sdr_rf_freq = 100e6
    sdr_sample_rate = 2_000_000.0
    sdr_bias_t = True
    sdr_buffered = False
    sdrplay_device_idx = 0
    sdrplay_bandwidth = 1_536_000.0
    sdrplay_lna_state = 3
    sdrplay_if_gain = -30
    sdrplay_antenna = "B"
    sdrplay_hdr_mode = False
    sdrplay_hdr_bw = None

    def __getattr__(self, _):
        return None


def _patched(monkeypatch, fake):
    real_find = ctypes.util.find_library
    real_cdll = ctypes.CDLL
    monkeypatch.setattr(
        ctypes.util, "find_library",
        lambda n: "fake_sdrplay" if "sdrplay" in n else real_find(n))
    monkeypatch.setattr(
        ctypes, "CDLL",
        lambda path, *a, **k: fake if path == "fake_sdrplay"
        else real_cdll(path, *a, **k))


def test_sdrplay_mock_configure(monkeypatch):
    fake = FakeSdrplayLib()
    _patched(monkeypatch, fake)
    mod = SdrPlayInput()
    info = mod.initialize(None, Args())
    assert info.sample_format == "cs16"
    assert info.sample_rate == 2_000_000.0
    # device params programmed (input_sdrplay.c:614-630)
    assert fake.dev_params.fsFreq.fsHz == 2_000_000.0
    assert fake.rx_a.tunerParams.bwType == 1536
    assert fake.rx_a.tunerParams.ifType == sp.IF_ZERO
    assert fake.rx_a.tunerParams.rfFreq.rfHz == 100e6
    # RSPdx family: antenna B + bias-T through rspDxParams
    assert fake.dev_params.rspDxParams.antennaSel == sp.RSPDX_ANTENNA_B
    assert fake.dev_params.rspDxParams.biasTEnable == 1
    # manual gain: AGC off, IF gain negated, LNA level inverted
    assert fake.rx_a.ctrlParams.agc.enable == sp.AGC_DISABLE
    assert fake.rx_a.tunerParams.gain.gRdB == 30
    n = sp.num_lna_states(sp.RSPdx, 100e6, False, False)        # 27
    assert fake.rx_a.tunerParams.gain.LNAstate == n - 1 - 3
    mod.close()
    assert "sdrplay_api_ReleaseDevice" in fake.calls
    assert "sdrplay_api_Close" in fake.calls


def test_sdrplay_mock_stream(monkeypatch):
    """Planar callback -> interleaved ring bytes; reset -> discontinuity;
    overload event acked; teardown order."""
    fake = FakeSdrplayLib()
    _patched(monkeypatch, fake)
    mod = SdrPlayInput()
    mod.initialize(None, Args())

    n = 1024
    xi = (ctypes.c_short * n)(*range(n))
    xq = (ctypes.c_short * n)(*(-v for v in range(n)))

    def feeder():
        for _ in range(100):
            if fake.cbfns is not None:
                break
            time.sleep(0.01)
        fns = fake.cbfns
        # first delivery arrives with reset=1 (stream restarted)
        fns.StreamACbFn(xi, xq, None, n, 1, None)
        fns.StreamACbFn(xi, xq, None, n, 0, None)
        # power overload event must be acknowledged via Update
        evt = sp.EventParamsT()
        evt.powerOverloadParams.powerOverloadChangeType = \
            sp.OVERLOAD_DETECTED
        fns.EventCbFn(sp.EVT_POWER_OVERLOAD, sp.TUNER_A,
                      ctypes.pointer(evt), None)
        mod._ring.signal_end_of_stream()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    blocks = list(mod.blocks(512))
    t.join(timeout=5.0)
    got = b"".join(b.payload for b in blocks)
    want = np.empty(2 * n, np.int16)
    want[0::2] = np.arange(n, dtype=np.int16)
    want[1::2] = -np.arange(n, dtype=np.int16)
    assert got == want.tobytes() * 2
    # the reset marked a block discontinuous
    assert any(b.discontinuity for b in blocks)
    assert mod.heartbeat > 0.0
    assert "sdrplay_api_Update" in fake.calls       # overload ack + bias-T
    # the ack must carry the vendor header's OverloadMsgAck bit — any
    # other ReasonForUpdate value fires an unrelated tuner update on
    # real hardware (sdrplay_api.h: sdrplay_api_Update_Ctrl_OverloadMsgAck)
    assert (0x04000000, 0) in fake.update_reasons
    # RSPdx bias-T rides ReasonForUpdateExtension1T (RspDx_BiasTControl)
    assert (0, 0x00000002) in fake.update_reasons
    mod.close()
    assert "sdrplay_api_Uninit" in fake.calls
    assert fake.calls.index("sdrplay_api_Uninit") < \
        fake.calls.index("sdrplay_api_ReleaseDevice")


def test_sdrplay_mock_buffered_planar_packets(monkeypatch):
    """Buffered mode writes planar IQPK packets (input_sdrplay.c:470)."""
    fake = FakeSdrplayLib()
    _patched(monkeypatch, fake)

    class BufArgs(Args):
        sdr_buffered = True

    mod = SdrPlayInput()
    mod.initialize(None, BufArgs())
    n = 256
    xi = (ctypes.c_short * n)(*range(n))
    xq = (ctypes.c_short * n)(*(-v for v in range(n)))

    def feeder():
        for _ in range(100):
            if fake.cbfns is not None:
                break
            time.sleep(0.01)
        fake.cbfns.StreamACbFn(xi, xq, None, n, 1, None)
        mod._ring.signal_end_of_stream()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    blocks = list(mod.blocks(128))
    t.join(timeout=5.0)
    got = b"".join(b.payload for b in blocks)
    want = np.empty(2 * n, np.int16)
    want[0::2] = np.arange(n, dtype=np.int16)
    want[1::2] = -np.arange(n, dtype=np.int16)
    assert got == want.tobytes()
    # the in-band reset packet preceded the data
    assert blocks[0].discontinuity
    mod.close()


def test_sdrplay_hdr_requires_dx(monkeypatch):
    fake = FakeSdrplayLib(hw_ver=sp.RSP1A)
    _patched(monkeypatch, fake)

    class HdrArgs(Args):
        sdrplay_hdr_mode = True
        sdrplay_antenna = None
        sdr_bias_t = False

    with pytest.raises(ValueError, match="RSPdx"):
        SdrPlayInput().initialize(None, HdrArgs())
    # failed init released the API cleanly
    assert "sdrplay_api_Close" in fake.calls


def test_sdrplay_invalid_lna_state(monkeypatch):
    fake = FakeSdrplayLib(hw_ver=sp.RSP1)      # 4 LNA states
    _patched(monkeypatch, fake)

    class BadLna(Args):
        sdrplay_lna_state = 9
        sdrplay_antenna = None
        sdr_bias_t = False

    with pytest.raises(ValueError, match="LNA state"):
        SdrPlayInput().initialize(None, BadLna())


@pytest.mark.parametrize("hw,reason,ext1", [
    (sp.RSP1A, 0x00000010, 0),      # sdrplay_api_Update_Rsp1a_BiasTControl
    (sp.RSP2, 0x00000080, 0),       # sdrplay_api_Update_Rsp2_BiasTControl
    (sp.RSPduo, 0x08000000, 0),     # sdrplay_api_Update_RspDuo_BiasTControl
])
def test_sdrplay_bias_t_update_reason(monkeypatch, hw, reason, ext1):
    """Post-Init bias-T Update must carry the vendor header's exact
    ReasonForUpdate bit for the device family (input_sdrplay.c:797-830);
    a wrong bit silently toggles notch/antenna/retune state instead."""
    fake = FakeSdrplayLib(hw_ver=hw)
    _patched(monkeypatch, fake)

    class BiasArgs(Args):
        sdrplay_antenna = None if hw != sp.RSP2 else "B"
        sdrplay_hdr_mode = False

    mod = SdrPlayInput()
    mod.initialize(None, BiasArgs())
    mod._start_hardware()
    assert (reason, ext1) in fake.update_reasons
    mod.close()


def test_realtime_reset_counter_never_lost(monkeypatch):
    """Resets arriving between block yields surface on the NEXT block
    (monotonic counter latch) — a read-then-clear flag could erase one."""
    fake = FakeSdrplayLib()
    _patched(monkeypatch, fake)
    mod = SdrPlayInput()
    mod.initialize(None, Args())
    mod._start_hardware = lambda: None          # ring is fed directly
    bpf = mod._fmt.bytes_per_frame
    mod._ring.write(b"\0" * (3 * 512 * bpf))
    mod._ring.signal_end_of_stream()

    it = mod.blocks(512)
    # two resets before the first block coalesce into one marker
    mod._deliver_reset()
    mod._deliver_reset()
    b1 = next(it)
    assert b1.discontinuity
    # no reset since -> clean block
    b2 = next(it)
    assert not b2.discontinuity
    # reset between yields (the racy window) is latched, not erased
    mod._deliver_reset()
    b3 = next(it)
    assert b3.discontinuity
    mod.close()


def test_init_pending_status_tolerated(monkeypatch):
    """Init returning a Start/StopPending transient (matched via the
    API's error string, not a hard-coded ordinal) must not abort the
    stream; a genuine failure status must."""
    fake = FakeSdrplayLib(init_err=15, errstr=b"sdrplay_api_StopPending")
    _patched(monkeypatch, fake)
    mod = SdrPlayInput()
    mod.initialize(None, Args())
    mod._start_hardware()              # no raise
    assert "sdrplay_api_Init" in fake.calls
    mod.close()

    fake2 = FakeSdrplayLib(init_err=1, errstr=b"sdrplay_api_Fail")
    _patched(monkeypatch, fake2)
    mod2 = SdrPlayInput()
    mod2.initialize(None, Args())
    with pytest.raises(ValueError, match="Init failed"):
        mod2._start_hardware()
    mod2.close()
