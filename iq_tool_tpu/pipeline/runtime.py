"""Host streaming engine: feeds the compiled chain from input module(s) and
drains it into output module(s).

Replaces the reference's thread pipeline + queues + rings (pipeline.c)
with three host threads around the XLA device queue:

  reader thread  ->  bounded chunk queue (HOST_QUEUE_DEPTH)
      -> main thread: device_put + step dispatch (async under JAX)
  -> bounded output queue (pipeline_depth)  ->  writer thread: readback
      + sink writes

so source I/O, device compute, and sink I/O all overlap — the
pipeline.c:96-116 reader/writer overlap semantics — while output bytes
stay identical at any queue depth (FIFO order end to end).  EOS pads the
final partial block and trims the output to exactly floor(valid_in * P/Q)
frames; stream discontinuities set the step's reset flag
(pipeline.c:458-464 semantics).

Multi-channel (BASELINE config #5): N sources + N sinks drive a
``channels=N`` chain (or a ShardedChain over a device mesh); channel c's
bytes are byte-identical to an independent single-channel run.  Channels
advance in lockstep, so a multi-channel stream ends at the SHORTEST
channel and a discontinuity on ANY channel resets the whole chain at the
next block boundary (single-channel keeps the exact pre-gap short-block
drain semantics).
"""

from __future__ import annotations

import dataclasses
import queue as queue_mod
import threading
import time

import jax
import numpy as np

from iq_tool_tpu import constants as C
from iq_tool_tpu.modules.base import OutputClosed
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


class _Writer:
    """Drains (device_array, emit_frames) items in FIFO order: forces the
    readback, splits per channel, writes each sink.  The bounded queue is
    the device pipeline: up to ``depth`` steps stay in flight before the
    oldest readback is forced (reference writer thread + 1 GB ring,
    pipeline.c:418-434, sized WRITER_QUEUE_DEPTH here)."""

    def __init__(self, sinks, items_per_frame: int,
                 summary: StreamSummary, depth: int):
        self._sinks = sinks
        self._items = items_per_frame
        self._q = queue_mod.Queue(maxsize=max(1, depth))
        self._summary = summary
        self.closed = False            # an OutputClosed arrived
        self.dropped = False           # items discarded after close
        self.error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="iq-writer")
        self._thread.start()

    def put(self, dev, emit: int) -> None:
        self._q.put((dev, emit))

    def flush(self) -> None:
        """Block until everything queued so far has been written (or
        discarded after a close) — the consistent-cut point used by
        checkpoints."""
        self._q.join()

    def stop(self) -> None:
        try:
            # a consumer stuck mid-write (full pipe, dead NFS...) keeps
            # the queue full; don't let shutdown hang on it — the thread
            # is a daemon and is abandoned after the grace period
            self._q.put(None, timeout=2.0)
        except queue_mod.Full:
            self.closed = True
        self._thread.join(timeout=10.0)

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            dev, emit = item
            try:
                if self.closed:
                    self.dropped = True
                else:
                    host = np.asarray(jax.device_get(dev))
                    n_items = emit * self._items
                    for c, sink in enumerate(self._sinks):
                        sink.write(host[c, :n_items].tobytes())
                    self._summary.frames_out += emit
                    self._summary.bytes_out += (n_items * host.itemsize
                                                * len(self._sinks))
            except OutputClosed:
                self.closed = True
                self.dropped = True
            except BaseException as e:      # surfaced on the main thread
                self.error = e
                self.closed = True
            finally:
                self._q.task_done()


class _Reader:
    """Pumps assembled chunks from a generator into a bounded queue so
    source I/O overlaps device dispatch (reference reader thread,
    pipeline.c:334-416)."""

    _EOS = ("eos", None, 0, False)

    def __init__(self, gen, depth: int = C.HOST_QUEUE_DEPTH):
        self._q = queue_mod.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._gen = gen
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="iq-reader")
        self._thread.start()

    def get(self):
        return self._q.get()

    def stop(self) -> None:
        self._stop.set()
        # drain so a blocked put wakes up, then wait for exit
        try:
            while True:
                self._q.get_nowait()
        except queue_mod.Empty:
            pass
        self._thread.join(timeout=5.0)

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue_mod.Full:
                continue
        return False

    def _run(self) -> None:
        try:
            for item in self._gen:
                if not self._put(("chunk",) + item):
                    return
        except BaseException as e:
            self._put(("err", e, 0, False))
            return
        self._put(self._EOS)


class StreamEngine:
    """Single- or multi-channel streaming driver.

    ``source``/``sink`` may each be a single module or a sequence of
    ``channels`` modules (one stream per channel, lockstep)."""

    def __init__(self, chain: Chain | None, source, sink,
                 raw_passthrough: bool = False,
                 progress=None, progress_total_frames: int | None = None,
                 checkpoint_path: str | None = None,
                 checkpoint_interval_sec: float = 30.0,
                 resume: bool = False,
                 initial_carry=None,
                 pipeline_depth: int = C.PIPELINE_DEPTH):
        if chain is None and not raw_passthrough:
            raise ValueError("need a chain unless raw_passthrough")
        self.chain = chain
        self.sources = (list(source) if isinstance(source, (list, tuple))
                        else [source])
        self.sinks = (list(sink) if isinstance(sink, (list, tuple))
                      else [sink])
        self.source = self.sources[0]
        self.sink = self.sinks[0]
        self.raw_passthrough = raw_passthrough
        self.progress = progress
        self.total_frames = progress_total_frames
        self.checkpoint_path = checkpoint_path
        self.checkpoint_interval = checkpoint_interval_sec
        self.resume = resume
        self.initial_carry = initial_carry
        self.pipeline_depth = max(1, pipeline_depth)
        n_ch = len(self.sources)
        if len(self.sinks) != n_ch:
            raise ValueError(
                f"{n_ch} sources need {n_ch} sinks, got {len(self.sinks)}")
        if chain is not None and chain.cfg.channels != n_ch:
            raise ValueError(
                f"chain has channels={chain.cfg.channels} but "
                f"{n_ch} source streams were given")
        if raw_passthrough and n_ch != 1:
            raise ValueError("raw passthrough is single-stream")

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

    # ----------------------------------------------------- chunk assembly

    def _gen_single(self, block_bytes: int, bpf: int, skip_bytes: int):
        """Single-channel chunk generator; keeps the exact pre-gap
        short-block drain semantics for discontinuities."""
        buf = bytearray()
        pending_reset = False
        src = self.sources[0].blocks(block_bytes // bpf)
        while True:
            block = next(src, None)
            if block is None:
                if buf:
                    valid = len(buf) // bpf
                    if valid:
                        yield ([bytes(buf[:valid * bpf])], valid,
                               pending_reset)
                return
            if block.discontinuity:
                # drain the pre-gap remainder as its own (padded) short
                # block FIRST — otherwise pre- and post-gap samples would
                # be spliced into one chunk and resampled across the gap
                if buf:
                    valid = len(buf) // bpf
                    if valid:
                        yield [bytes(buf[:valid * bpf])], valid, pending_reset
                    buf.clear()
                pending_reset = True
            payload = block.payload
            if skip_bytes:              # resume on a non-seekable source
                drop = min(skip_bytes, len(payload))
                payload = payload[drop:]
                skip_bytes -= drop
            buf.extend(payload)
            while len(buf) >= block_bytes:
                yield [bytes(buf[:block_bytes])], block_bytes // bpf, \
                    pending_reset
                pending_reset = False
                del buf[:block_bytes]

    def _gen_multi(self, block_bytes: int, bpf: int, skip_bytes: int):
        """Lockstep multi-channel chunk generator.  Ends at the shortest
        channel; a discontinuity on any channel resets the whole chain at
        the next block boundary (channels cannot drain pre-gap tails
        independently without desynchronizing the batch)."""
        n = len(self.sources)
        bufs = [bytearray() for _ in range(n)]
        iters = [s.blocks(block_bytes // bpf) for s in self.sources]
        done = [False] * n
        skips = [skip_bytes] * n
        pending_reset = False
        while True:
            for c in range(n):
                while len(bufs[c]) < block_bytes and not done[c]:
                    block = next(iters[c], None)
                    if block is None:
                        done[c] = True
                        break
                    if block.discontinuity:
                        pending_reset = True
                    payload = block.payload
                    if skips[c]:
                        drop = min(skips[c], len(payload))
                        payload = payload[drop:]
                        skips[c] -= drop
                    bufs[c].extend(payload)
            if all(len(b) >= block_bytes for b in bufs):
                yield ([bytes(b[:block_bytes]) for b in bufs],
                       block_bytes // bpf, pending_reset)
                pending_reset = False
                for b in bufs:
                    del b[:block_bytes]
                continue
            # at least one channel exhausted: emit the common tail
            valid = min(len(b) // bpf for b in bufs)
            if valid:
                yield ([bytes(b[:valid * bpf]) for b in bufs], valid,
                       pending_reset)
            return

    # ------------------------------------------------------------- chain

    def _run_chain(self) -> StreamSummary:
        ch = self.chain
        fmt = ch.fmt_in
        bpf = fmt.bytes_per_frame
        n_in = ch.n_in
        n_channels = ch.cfg.channels
        block_bytes = n_in * bpf

        carry = (self.initial_carry if self.initial_carry is not None
                 else ch.init_carry(n_channels))
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
                if all(hasattr(src, "seek_frames") for src in self.sources):
                    for src in self.sources:
                        src.seek_frames(fin)
                    skip_frames = 0
                # a crash between checkpoints leaves the sink AHEAD of the
                # checkpointed cut: truncate so resume is sample-exact
                # instead of duplicating the post-checkpoint stretch
                for snk in self.sinks:
                    if hasattr(snk, "truncate_to_frames"):
                        snk.truncate_to_frames(fout,
                                               ch.fmt_out.bytes_per_frame)

        t0 = time.monotonic()
        last_prog = t0
        last_ckpt = t0
        # frames the writer has been ASKED to emit (>= s.frames_out until
        # the writer catches up; equal after flush)
        scheduled_out = s.frames_out

        gen_fn = self._gen_single if n_channels == 1 else self._gen_multi
        reader = _Reader(gen_fn(block_bytes, bpf, skip_frames * bpf))
        writer = _Writer(self.sinks, ch.fmt_out.items_per_frame, s,
                         self.pipeline_depth)

        # A zero-padded partial block (EOS tail) pollutes the carry with
        # padding state (filter tails of zeros, NCO phase advanced past
        # the real samples), so a checkpoint taken after it would make a
        # later --resume against a longer input diverge.  Stash the
        # pre-partial cut instead and checkpoint THAT; resume then
        # replays the tail frames.  Must be fetched to host BEFORE the
        # step — the step donates the carry buffers.
        pre_partial = None

        def process(chunks: list[bytes], valid_frames: int, reset: bool):
            nonlocal carry, scheduled_out, pre_partial
            rows = []
            for chunk in chunks:
                if len(chunk) < block_bytes:
                    chunk = chunk + b"\x00" * (block_bytes - len(chunk))
                rows.append(np.frombuffer(chunk, dtype=ch.in_wire_dtype))
            wire = np.stack(rows, axis=0)
            if valid_frames < ch.n_in and self.checkpoint_path:
                # keep the OLDEST clean cut: on consecutive partials
                # (pre-gap drain then EOS tail) the live carry is
                # already padding-polluted, so overwriting would record
                # a dirty state
                if pre_partial is None:
                    pre_partial = (jax.device_get(carry), s.frames_in)
            else:
                # a later full block (mid-stream partials come from SDR
                # pre-gap drains) makes the live carry consistent again
                pre_partial = None
            dev = jax.device_put(wire)
            carry, out = ch.step(carry, dev, np.bool_(reset))
            s.frames_in += valid_frames
            allowed = ch.expected_out_frames(s.frames_in)
            emit = max(0, min(allowed - scheduled_out, ch.n_out))
            scheduled_out += emit
            try:
                # start the device->host transfer NOW so the writer
                # thread's device_get finds the bytes already in flight —
                # otherwise each readback serializes behind the previous
                # sink write (weakness: readback blocked the writer)
                out.copy_to_host_async()
            except Exception:
                pass                    # best-effort (backend-dependent)
            writer.put(out, emit)       # blocks when the pipe is full

        def consistent_cut():
            if pre_partial is not None:
                c, fin = pre_partial
                return c, fin, min(s.frames_out,
                                   ch.expected_out_frames(fin))
            return carry, s.frames_in, s.frames_out

        def maybe_checkpoint(now: float, last: float) -> float:
            if (self.checkpoint_path
                    and now - last >= self.checkpoint_interval):
                from iq_tool_tpu.pipeline.checkpoint import save_checkpoint
                # flush first so (carry, frames_in, frames_out) is a
                # consistent cut: everything consumed has been written
                writer.flush()
                # also require writer.error is None: a failed sink write
                # sets error without dropped, yet the failed block's
                # output never landed — saving would leave frames_in
                # ahead of the bytes on disk and misalign --resume
                if not writer.dropped and writer.error is None:
                    save_checkpoint(self.checkpoint_path, *consistent_cut())
                return now
            return last
        try:
            while True:
                kind, payload, valid, reset = reader.get()
                if kind == "eos":
                    break
                if kind == "err":
                    raise payload
                process(payload, valid, reset)
                if writer.error is not None:
                    raise writer.error
                if writer.closed:
                    break
                now = time.monotonic()
                last_prog = self._progress_tick(s, t0, last_prog)
                last_ckpt = maybe_checkpoint(now, last_ckpt)
            writer.flush()
        except KeyboardInterrupt:
            s.interrupted = True
            try:
                writer.flush()
            except Exception:
                pass
        finally:
            reader.stop()
            writer.stop()
        if writer.error is not None and not isinstance(writer.error,
                                                       OutputClosed):
            raise writer.error
        # a closed consumer dropped computed-but-unflushed blocks, so
        # (carry, frames_in) is AHEAD of frames_out — not a consistent
        # cut.  Keep the last periodic checkpoint instead of saving one
        # that would leave a gap on --resume.
        if self.checkpoint_path and not writer.dropped:
            from iq_tool_tpu.pipeline.checkpoint import save_checkpoint
            save_checkpoint(self.checkpoint_path, *consistent_cut())
        s.duration_sec = time.monotonic() - t0
        return s

    def _progress_tick(self, s: StreamSummary, t0: float, last: float) -> float:
        now = time.monotonic()
        if self.progress and now - last >= C.PROGRESS_INTERVAL_SEC:
            self.progress(s, now - t0, self.total_frames)
            return now
        return last
