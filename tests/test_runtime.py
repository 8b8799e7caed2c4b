"""Host streaming engine: split invariance, EOS trimming, pipelining.

SURVEY.md section 4 item 2: streaming-vs-whole equivalence across
arbitrary block segmentations is the key property exercising every
overlap/carry seam.  Here the seam is the HOST one: the engine must
produce identical bytes regardless of how the source fragments its
payloads (SDR callbacks deliver arbitrary-sized transfers).
"""

import numpy as np

from iq_tool_tpu.modules.base import Block, InputModule, OutputModule, SourceInfo
from iq_tool_tpu.ops.fir_design import FilterRequest
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
from iq_tool_tpu.pipeline.runtime import StreamEngine


class FakeSource(InputModule):
    name = "fake"

    def __init__(self, payload: bytes, cuts):
        self._payload = payload
        self._cuts = list(cuts)

    def initialize(self, config, args) -> SourceInfo:
        return SourceInfo(sample_rate=2_048_000.0, sample_format="cs16")

    def blocks(self, frames_per_block: int):
        pos = 0
        for cut in self._cuts:
            yield Block(self._payload[pos:cut])
            pos = cut
        if pos < len(self._payload):
            yield Block(self._payload[pos:])


class FakeSink(OutputModule):
    name = "fake"
    requires_output_path = False

    def __init__(self):
        self.data = bytearray()

    def validate(self, config, args) -> None:
        pass

    def initialize(self, config, args) -> None:
        pass

    def write(self, payload: bytes) -> None:
        self.data.extend(payload)

    def finalize(self) -> None:
        pass


def _chain():
    return Chain(ChainConfig(
        input_format="cs16", output_format="cs16",
        input_rate=2_048_000.0, target_rate=1_536_000.0, channels=1,
        dc_block=True, freq_shift_pre_hz=100e3,
        filters=[FilterRequest("lowpass", 400e3)], target_block=2048))


def _run(payload: bytes, cuts, depth=4) -> bytes:
    sink = FakeSink()
    eng = StreamEngine(_chain(), FakeSource(payload, cuts), sink,
                       pipeline_depth=depth)
    s = eng.run()
    assert s.frames_out * 4 == len(sink.data)
    return bytes(sink.data)


def test_split_invariance_and_eos_trim(rng):
    chain = _chain()
    n = chain.n_in * 3 + chain.n_in // 3          # ragged total (EOS pad+trim)
    payload = rng.integers(-2**15, 2**15, 2 * n).astype(np.int16).tobytes()

    whole = _run(payload, [len(payload)])
    # frames out trimmed to floor(valid_in * P/Q)
    assert len(whole) // 4 == n * chain.resampler.plan.p // chain.resampler.plan.q

    cutsets = [
        sorted(rng.choice(np.arange(2, len(payload) - 2, 2),
                          size=17, replace=False).tolist()),
        [10, 12, 50_000, 50_002, len(payload) - 2],   # tiny + huge fragments
    ]
    for cuts in cutsets:
        assert _run(payload, cuts) == whole

    # pipeline depth must not change bytes
    assert _run(payload, cutsets[0], depth=1) == whole
    assert _run(payload, cutsets[0], depth=16) == whole


def test_output_closed_is_graceful(rng):
    """A sink whose consumer goes away (stdout EPIPE) stops the stream
    cleanly instead of crashing (output_stdout.c:37-77 semantics)."""
    from iq_tool_tpu.modules.base import OutputClosed

    class ClosingSink(FakeSink):
        def write(self, payload: bytes) -> None:
            if len(self.data) > 1000:
                raise OutputClosed()
            super().write(payload)

    chain = _chain()
    payload = rng.integers(-2**15, 2**15,
                           2 * chain.n_in * 4).astype(np.int16).tobytes()
    sink = ClosingSink()
    eng = StreamEngine(chain, FakeSource(payload, [len(payload)]), sink)
    s = eng.run()                        # must not raise
    assert not s.interrupted
    assert len(sink.data) <= 1000 + chain.n_out * 4


def test_discontinuity_drains_pregap_remainder(rng):
    """Pre-gap buffered bytes must be processed as their own short block
    before the reset, never spliced with post-gap samples."""
    chain = _chain()
    n_bytes = chain.n_in * 4
    payload = rng.integers(-2**15, 2**15,
                           2 * chain.n_in * 4).astype(np.int16).tobytes()
    half = n_bytes // 2

    class GappySource(FakeSource):
        def blocks(self, frames_per_block: int):
            yield Block(self._payload[:half])                # partial block
            yield Block(self._payload[half:],
                        discontinuity=True)                  # gap before this

    sink = FakeSink()
    s = StreamEngine(chain, GappySource(payload, []), sink).run()
    # pre-gap half (n_in/2 frames) + post-gap rest all accounted for
    assert s.frames_in == len(payload) // 4
    assert s.frames_out * 4 == len(sink.data)
    # and equals: fresh run of pre-gap half ++ fresh run of the rest
    a = _run(payload[:half], [half])
    b = _run(payload[half:], [len(payload) - half])
    assert bytes(sink.data) == a + b


def test_no_checkpoint_after_sink_write_failure(tmp_path, rng):
    """A sink write that FAILS (not OutputClosed) must not be followed by
    a periodic checkpoint: the carry has consumed input whose output
    never landed, so saving would leave frames_in ahead of the bytes on
    disk and misalign --resume (advisor round-2 medium finding)."""
    import pytest

    import time

    class FailingSink(FakeSink):
        def write(self, payload: bytes) -> None:
            if len(self.data) >= 2 * len(payload):   # fail on the 3rd block
                # slow failure: the main loop's writer.error check passes
                # first, so the error lands DURING maybe_checkpoint's
                # flush — the advisor's exact race
                time.sleep(0.2)
                raise IOError("disk full")
            super().write(payload)

    chain = _chain()
    payload = rng.integers(-2**15, 2**15,
                           2 * chain.n_in * 6).astype(np.int16).tobytes()
    sink = FailingSink()
    ckpt = str(tmp_path / "state.ckpt")
    eng = StreamEngine(chain, FakeSource(payload, [len(payload)]), sink,
                       checkpoint_path=ckpt, checkpoint_interval_sec=0.0,
                       pipeline_depth=1)
    with pytest.raises(IOError, match="disk full"):
        eng.run()

    from iq_tool_tpu.pipeline.checkpoint import load_checkpoint
    _, fin, fout, _ = load_checkpoint(ckpt, chain.init_carry())
    # consistent cut: everything consumed was written — never ahead
    assert fout == chain.expected_out_frames(fin)
    assert fout * 4 == len(sink.data)
