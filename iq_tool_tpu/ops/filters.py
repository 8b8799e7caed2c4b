"""Streaming FIR execution: direct convolution and FFT overlap-save.

Reference behavior (src/filter.c):
* FIR path: liquid firfilt executed in-place per block (filter.c:449-462);
* FFT path: fftfilt overlap-save with an explicit remainder carry
  (filter.c:491-526), block size = next pow2 >= taps-1, doubled if
  < 2*taps, FFT length = 2*block (filter.c:317-336);
* implementation auto-choice: complex (asymmetric) taps -> FFT, symmetric
  -> FIR (filter.c:301-312), overridable.

TPU design: both paths are stateless block maps plus a carried input tail
(the whole overlap discipline lives in the carry, so time-sharded meshes
can halo-exchange the tail, SURVEY.md section 5):

* direct: complex conv decomposed into 4 real ``lax.conv_general_dilated``
  ops (MXU-lowered), best for short taps;
* overlap-save: ALL chunks of a block are FFT'd in one batched matmul-FFT
  call (ops/fft.py) — windows are built by reshaping the tail-extended
  block into (n_chunks, 2*block) overlapped segments, so there is no
  sequential chunk loop at all.

The carried tail has length ``block`` (>= taps-1), one tail per channel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from iq_tool_tpu.ops import fft as tfft
from iq_tool_tpu.ops.fir_design import choose_fft_block


def tail_len(num_taps: int, method: str, user_fft_size: int | None = None) -> int:
    if method == "fir":
        return num_taps - 1
    return choose_fft_block(num_taps, user_fft_size)


def init(channels: int, num_taps: int, method: str,
         user_fft_size: int | None = None) -> jnp.ndarray:
    return jnp.zeros((channels, tail_len(num_taps, method, user_fft_size)),
                     jnp.complex64)


def reset(state: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros_like(state)


def _conv_valid_real(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode correlation-style FIR: y[n] = sum_k h[k] x[n + K-1 - k].

    x: (C, L) f32, h: (K,) f32 -> (C, L-K+1) f32.
    """
    lhs = x[:, None, :]                       # (N=C, C_in=1, W)
    rhs = h[::-1][None, None, :]              # (O=1, I=1, W) flipped -> convolution
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return out[:, 0, :]


def _fir_direct(ext: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR over the tail-extended block, complex via 4 real convs."""
    xr, xi = jnp.real(ext), jnp.imag(ext)
    hr, hi = jnp.real(taps), jnp.imag(taps)
    rr = _conv_valid_real(xr, hr)
    ii = _conv_valid_real(xi, hi)
    ri = _conv_valid_real(xr, hi)
    ir = _conv_valid_real(xi, hr)
    return ((rr - ii) + 1j * (ri + ir)).astype(jnp.complex64)


@functools.lru_cache(maxsize=None)
def _freq_taps(taps_key, nfft: int):
    # kept as NUMPY so jit embeds it as a literal constant (device-resident
    # complex constants would need a device->host pull at trace time, which
    # some PJRT backends cannot do)
    taps = np.asarray(taps_key, np.complex64)
    return np.fft.fft(taps, nfft).astype(np.complex64)


class StreamingFilter:
    """A designed filter bound to a method and block geometry.

    Stateless object holding static data (taps / freq response); the
    per-stream state is the external tail array, making instances safe to
    close over inside jit.
    """

    def __init__(self, taps: np.ndarray, method: str = "auto",
                 user_fft_size: int | None = None):
        taps = np.asarray(taps, np.complex64)
        if method == "auto":
            # reference: complex -> FFT, symmetric -> FIR (filter.c:301-312).
            # On TPU direct conv wins only for short taps; keep the
            # reference's choice for complex taps and use cost for real ones.
            is_complex = bool(np.any(np.abs(taps.imag) > 0))
            method = "fft" if (is_complex or len(taps) > 96) else "fir"
        self.method = method
        self.taps = taps
        self.num_taps = len(taps)
        self.block = tail_len(self.num_taps, method, user_fft_size)
        if method == "fft":
            self.nfft = 2 * self.block
            self._h = _freq_taps(tuple(taps.tolist()), self.nfft)
        else:
            self._h = taps

    def init(self, channels: int) -> jnp.ndarray:
        return jnp.zeros((channels, self.block), jnp.complex64)

    def __call__(self, x: jnp.ndarray, state: jnp.ndarray):
        """x: (C, N) complex64, state: (C, block) -> (y (C, N), new state).

        N must be a positive multiple of ``block`` for the fft method
        (the chain builder arranges this).
        """
        c, n = x.shape
        if self.method == "fir":
            k = self.num_taps
            ext = jnp.concatenate([state, x], axis=-1)
            y = _fir_direct(ext, self._h)
            new_state = ext[:, -(k - 1):] if k > 1 else state
            return y, new_state

        b = self.block
        if n < b:
            raise ValueError(f"block length {n} smaller than filter block {b}")
        ext = jnp.concatenate([state, x], axis=-1)       # (C, n + b)
        if n % b == 0:
            segs = ext.reshape(c, n // b + 1, b)
            windows = jnp.concatenate([segs[:, :-1], segs[:, 1:]], axis=-1)
            out = tfft.ifft(tfft.fft(windows) * self._h)[..., b:]
            y = out.reshape(c, n)
        else:
            # Arbitrary n: static overlapping windows. Chunk i produces
            # outputs [s_i, s_i + b); the last window is re-anchored at
            # n - b so every output is covered with fixed shapes (its
            # leading duplicate outputs are discarded).
            nc = -(-n // b)
            starts = np.arange(nc, dtype=np.int64) * b
            starts[-1] = n - b
            idx = starts[:, None] + np.arange(2 * b, dtype=np.int64)[None, :]
            windows = jnp.take(ext, jnp.asarray(idx), axis=-1)  # (C, nc, 2b)
            out = tfft.ifft(tfft.fft(windows) * self._h)[..., b:]
            head = out[:, :-1, :].reshape(c, (nc - 1) * b)
            tail = out[:, -1, -(n - (nc - 1) * b):]
            y = jnp.concatenate([head, tail], axis=-1)
        return y.astype(jnp.complex64), ext[:, -b:]
