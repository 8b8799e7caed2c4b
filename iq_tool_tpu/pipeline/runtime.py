"""Host streaming engine: feeds the compiled chain from an input module and
drains it into an output module.

Replaces the reference's thread pipeline + queues + rings (pipeline.c):
JAX's async dispatch IS the pipeline — while the device runs block k, the
host reads ahead and keeps up to ``pipeline_depth`` device steps in
flight before forcing a readback, so dispatch/readback latency (large on
remote PJRT links) is amortized across the queue instead of paid per
block.  EOS pads the final partial block and trims the output to exactly
floor(valid_in * P/Q) frames; stream discontinuities set the step's reset
flag (pipeline.c:458-464 semantics).
"""

from __future__ import annotations

import collections
import dataclasses
import time

import jax
import numpy as np

from iq_tool_tpu import constants as C
from iq_tool_tpu.modules.base import InputModule, OutputClosed, OutputModule
from iq_tool_tpu.pipeline.chain import Chain


@dataclasses.dataclass
class StreamSummary:
    frames_in: int = 0
    frames_out: int = 0
    bytes_out: int = 0
    duration_sec: float = 0.0
    interrupted: bool = False

    @property
    def avg_mb_per_sec(self) -> float:
        if self.duration_sec <= 0:
            return 0.0
        return self.bytes_out / 1e6 / self.duration_sec


class StreamEngine:
    def __init__(self, chain: Chain | None, source: InputModule,
                 sink: OutputModule, raw_passthrough: bool = False,
                 progress=None, progress_total_frames: int | None = None,
                 checkpoint_path: str | None = None,
                 checkpoint_interval_sec: float = 30.0,
                 resume: bool = False,
                 initial_carry=None,
                 pipeline_depth: int = C.PIPELINE_DEPTH):
        if chain is None and not raw_passthrough:
            raise ValueError("need a chain unless raw_passthrough")
        self.chain = chain
        self.source = source
        self.sink = sink
        self.raw_passthrough = raw_passthrough
        self.progress = progress
        self.total_frames = progress_total_frames
        self.checkpoint_path = checkpoint_path
        self.checkpoint_interval = checkpoint_interval_sec
        self.resume = resume
        self.initial_carry = initial_carry
        self.pipeline_depth = max(1, pipeline_depth)

    # ---------------------------------------------------------------------

    def run(self) -> StreamSummary:
        if self.raw_passthrough:
            return self._run_passthrough()
        return self._run_chain()

    def _run_passthrough(self) -> StreamSummary:
        s = StreamSummary()
        t0 = time.monotonic()
        last_prog = t0
        try:
            for block in self.source.blocks(C.DEFAULT_BLOCK_SIZE):
                self.sink.write(block.payload)
                s.bytes_out += len(block.payload)
                last_prog = self._progress_tick(s, t0, last_prog)
        except OutputClosed:
            pass                # consumer closed the pipe: graceful stop
        except KeyboardInterrupt:
            s.interrupted = True
        s.duration_sec = time.monotonic() - t0
        return s

    def _run_chain(self) -> StreamSummary:
        ch = self.chain
        fmt = ch.fmt_in
        bpf = fmt.bytes_per_frame
        n_in = ch.n_in
        block_bytes = n_in * bpf

        if ch.cfg.channels != 1:
            raise ValueError(
                "StreamEngine drives ONE stream (the CLI surface); for "
                "multi-channel batches call chain.step directly "
                f"(got channels={ch.cfg.channels})")
        carry = (self.initial_carry if self.initial_carry is not None
                 else ch.init_carry(1))
        s = StreamSummary()

        skip_frames = 0
        if self.resume and self.checkpoint_path:
            import os

            from iq_tool_tpu.pipeline.checkpoint import load_checkpoint
            if os.path.isfile(self.checkpoint_path):
                carry, fin, fout, _ = load_checkpoint(self.checkpoint_path,
                                                      carry)
                s.frames_in, s.frames_out = fin, fout
                skip_frames = fin
                if hasattr(self.source, "seek_frames"):
                    self.source.seek_frames(fin)
                    skip_frames = 0
                # a crash between checkpoints leaves the sink AHEAD of the
                # checkpointed cut: truncate so resume is sample-exact
                # instead of duplicating the post-checkpoint stretch
                if hasattr(self.sink, "truncate_to_frames"):
                    self.sink.truncate_to_frames(
                        fout, ch.fmt_out.bytes_per_frame)

        t0 = time.monotonic()
        last_prog = t0
        last_ckpt = t0

        pending = collections.deque()   # (device array, frames_to_emit)
        buf = bytearray()
        pending_reset = False
        src = self.source.blocks(n_in)
        eos = False

        def flush_oldest():
            dev, emit = pending.popleft()
            host = np.asarray(jax.device_get(dev))[0]
            payload = host[: emit * ch.fmt_out.items_per_frame].tobytes()
            self.sink.write(payload)
            s.frames_out += emit
            s.bytes_out += len(payload)

        def flush_pending():
            while pending:
                flush_oldest()

        def process(chunk: bytes, valid_frames: int, reset: bool):
            nonlocal carry
            if len(chunk) < block_bytes:
                chunk = chunk + b"\x00" * (block_bytes - len(chunk))
            wire = np.frombuffer(chunk, dtype=ch.in_wire_dtype)[None, :]
            dev = jax.device_put(wire)
            carry, out = ch.step(carry, dev, np.bool_(reset))
            s.frames_in += valid_frames
            allowed = ch.expected_out_frames(s.frames_in)
            emit = max(0, min(allowed - s.frames_out - _pending_frames(),
                              ch.n_out))
            pending.append((out, emit))
            while len(pending) > self.pipeline_depth:
                flush_oldest()

        def _pending_frames():
            return sum(e for _, e in pending)

        skip_bytes = skip_frames * bpf

        def maybe_checkpoint(now: float, last: float) -> float:
            if (self.checkpoint_path
                    and now - last >= self.checkpoint_interval):
                from iq_tool_tpu.pipeline.checkpoint import save_checkpoint
                # flush first so (carry, frames_in, frames_out) is a
                # consistent cut: everything consumed has been written
                flush_pending()
                save_checkpoint(self.checkpoint_path, carry,
                                s.frames_in, s.frames_out)
                return now
            return last

        try:
            while not eos:
                block = next(src, None)
                if block is None:
                    eos = True
                else:
                    if block.discontinuity:
                        # drain the pre-gap remainder as its own (padded)
                        # short block FIRST — otherwise pre- and post-gap
                        # samples would be spliced into one chunk and
                        # resampled across the gap as if contiguous
                        if buf:
                            valid = len(buf) // bpf
                            if valid:
                                process(bytes(buf[:valid * bpf]), valid,
                                        pending_reset)
                            buf.clear()
                        pending_reset = True
                    payload = block.payload
                    if skip_bytes:          # resume on a non-seekable source
                        drop = min(skip_bytes, len(payload))
                        payload = payload[drop:]
                        skip_bytes -= drop
                    buf.extend(payload)
                while len(buf) >= block_bytes:
                    chunk = bytes(buf[:block_bytes])
                    del buf[:block_bytes]
                    process(chunk, n_in, pending_reset)
                    pending_reset = False
                    now = time.monotonic()
                    last_prog = self._progress_tick(s, t0, last_prog)
                    last_ckpt = maybe_checkpoint(now, last_ckpt)
                if eos and buf:
                    valid = len(buf) // bpf
                    process(bytes(buf), valid, pending_reset)
                    buf.clear()
            flush_pending()
        except OutputClosed:
            pending.clear()     # consumer is gone; nothing more to write
        except KeyboardInterrupt:
            s.interrupted = True
            try:
                flush_pending()
            except OutputClosed:
                pending.clear()
        if self.checkpoint_path:
            from iq_tool_tpu.pipeline.checkpoint import save_checkpoint
            save_checkpoint(self.checkpoint_path, carry,
                            s.frames_in, s.frames_out)
        s.duration_sec = time.monotonic() - t0
        return s

    def _progress_tick(self, s: StreamSummary, t0: float, last: float) -> float:
        now = time.monotonic()
        if self.progress and now - last >= C.PROGRESS_INTERVAL_SEC:
            self.progress(s, now - t0, self.total_frames)
            return now
        return last
