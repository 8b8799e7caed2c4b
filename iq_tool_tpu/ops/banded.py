"""Strided-window banded matmul: the shared MXU execution primitive.

Both polyphase resampling (ops/resample.py) and direct FIR filtering
(ops/filters.py) are "banded" linear maps: every output sample depends on
K consecutive inputs, with output m anchored at input s_m (s_m = m for a
FIR, floor(m*q/p) for a p/q polyphase).  The reference delegates these to
liquid-dsp's sequential per-sample loops (firfilt_crcf_execute_block,
msresamp_crcf_execute); a literal translation (gather + einsum, or
lax.conv) materializes huge intermediate tensors and starves the TPU on
HBM bandwidth.

Instead the band is densified over a GROUP of G outputs into a constant
matrix A[L, G] (A[s_m + k, m] = w[m, k]), windows of length L at stride S
are built from reshaped slices of the tail-extended input (no gather),
and the whole group computes as ONE MXU matmul ``win @ A``.  The pad
flops inside the band are free relative to the HBM traffic saved — the
classic TPU trade (see the sibling pallas_kernels module for the fully
fused version that also avoids materializing the windows).

All matmuls run at ``Precision.HIGH`` (3-pass bf16 ~= f32): the default
single-pass bf16 has only ~8 mantissa bits, below the 60 dB (~10-bit)
design-attenuation contract of constants.h:137.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_windows(ext: jnp.ndarray, stride: int, hist: int) -> jnp.ndarray:
    """Overlapping windows win[b] = ext[b*S : b*S + S + hist] without a
    gather: each view j contributes columns [j*S, (j+1)*S) of the window
    from a plain reshape of ext shifted by j*S (views are zero-padded past
    the end; the pad lands beyond the window length and is dropped).

    ext: (C, hist + n) with n a multiple of stride -> (C, n // S, S + hist).
    """
    ch = ext.shape[0]
    n = ext.shape[-1] - hist
    nb = n // stride
    s = stride
    parts = []
    remaining = s + hist
    j = 0
    while remaining > 0:
        src = ext[:, j * s:j * s + nb * s]
        pad = nb * s - src.shape[-1]
        if pad > 0:
            src = jnp.pad(src, ((0, 0), (0, pad)))
        take = min(s, remaining)
        parts.append(src.reshape(ch, nb, s)[:, :, :take])
        remaining -= take
        j += 1
    return jnp.concatenate(parts, axis=-1)


def window_matmul(win: jnp.ndarray, a_r: np.ndarray,
                  a_i: np.ndarray | None = None) -> jnp.ndarray:
    """(C, nb, L) complex windows @ (L, G) banded matrix -> (C, nb*G)
    complex64.  Real A needs 2 real matmuls; complex A needs 4.
    """
    ch, nb, _ = win.shape
    g = a_r.shape[1]
    dn = (((2,), (0,)), ((), ()))
    ar = jnp.asarray(a_r)
    wr, wi = jnp.real(win), jnp.imag(win)

    def dot(lhs, rhs):
        return jax.lax.dot_general(lhs, rhs, dn,
                                   precision=jax.lax.Precision.HIGH,
                                   preferred_element_type=jnp.float32)

    yr = dot(wr, ar)
    yi = dot(wi, ar)
    if a_i is not None and np.any(a_i):
        ai = jnp.asarray(a_i)
        yr = yr - dot(wi, ai)
        yi = yi + dot(wr, ai)
    return jax.lax.complex(yr, yi).reshape(ch, nb * g).astype(jnp.complex64)


def largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (>= 1)."""
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1
