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


def window_matmul_planar(win_r: jnp.ndarray, win_i: jnp.ndarray,
                         a_r: np.ndarray, a_i: np.ndarray | None = None):
    """Planar (C, nb, L) f32 windows @ (L, G) banded matrix -> two
    (C, nb*G) f32 planes.  Real A needs 2 real matmuls; complex A needs 4.
    """
    ch, nb, _ = win_r.shape
    g = a_r.shape[1]
    dn = (((2,), (0,)), ((), ()))
    ar = jnp.asarray(a_r)

    def dot(lhs, rhs):
        return jax.lax.dot_general(lhs, rhs, dn,
                                   precision=jax.lax.Precision.HIGH,
                                   preferred_element_type=jnp.float32)

    yr = dot(win_r, ar)
    yi = dot(win_i, ar)
    if a_i is not None and np.any(a_i):
        ai = jnp.asarray(a_i)
        yr = yr - dot(win_i, ai)
        yi = yi + dot(win_r, ai)
    return yr.reshape(ch, nb * g), yi.reshape(ch, nb * g)


def largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (>= 1)."""
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


# ------------------------------ dispatcher ------------------------------------

_kernels_enabled = True


def set_kernels_enabled(enabled: bool) -> None:
    """Global kill-switch for the Mosaic kernels: every dispatch site
    (banded, chain fused pre-stage, sharded fused pre-stage) gates on
    _on_tpu(), so disabling routes everything through the pure-XLA path.
    Used when a backend rejects Mosaic custom calls in a context (e.g.
    inside manually partitioned computations) — the chain still runs,
    just without the fused kernels."""
    global _kernels_enabled
    _kernels_enabled = enabled


def _on_tpu() -> bool:
    """Gate for the Mosaic (TPU-only) kernels — other accelerators must
    take the XLA path, not crash at pallas lowering."""
    if not _kernels_enabled:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def new_tail(state: jnp.ndarray, x: jnp.ndarray, hist: int) -> jnp.ndarray:
    """The carry for the next block: last `hist` samples of state ++ x."""
    if x.shape[-1] >= hist:
        return x[:, x.shape[-1] - hist:]
    return jnp.concatenate([state, x], axis=-1)[:, -hist:]


def apply_planar(state_r: jnp.ndarray, state_i: jnp.ndarray,
                 xr: jnp.ndarray, xi: jnp.ndarray,
                 a_r: np.ndarray, a_i: np.ndarray | None,
                 stride: int, hist: int):
    """Banded map over a block with carried tap history: dispatches to
    the fused Pallas kernel on TPU (no windows materialization, no
    state-concat copy) and to the build_windows + matmul XLA path
    elsewhere.

    state_*: (C, hist); x*: (C, n); returns (yr, yi): (C, (n//stride)*G).
    """
    if _on_tpu() and hist > 0:
        from iq_tool_tpu.ops import pallas_kernels
        ch, n = xr.shape
        nb = n // stride
        if pallas_kernels.plan(stride, hist, a_r.shape[1], nb, ch) is not None:
            return pallas_kernels.banded_apply(state_r, state_i, xr, xi,
                                               a_r, a_i, stride, hist)
    ext_r = jnp.concatenate([state_r, xr], axis=-1)
    ext_i = jnp.concatenate([state_i, xi], axis=-1)
    win_r = build_windows(ext_r, stride, hist)
    win_i = build_windows(ext_i, stride, hist)
    return window_matmul_planar(win_r, win_i, a_r, a_i)


def can_pack(stride: int, hist: int, g: int, n: int, ch: int,
             interpret: bool = False) -> bool:
    """Static predicate: will apply_planar_packed engage for a (ch, n)
    block through this banded map?  Every decline condition is
    shape/config-derived, so callers can decide BEFORE tracing earlier
    pipeline stages — no reliance on XLA CSE/DCE to clean up a
    speculative trace that declined mid-build."""
    if hist <= 0 or not (_on_tpu() or interpret):
        return False
    from iq_tool_tpu.ops import pallas_kernels
    return pallas_kernels.plan(stride, hist, g, n // stride, ch) is not None


def apply_planar_packed(state_r: jnp.ndarray, state_i: jnp.ndarray,
                        xr: jnp.ndarray, xi: jnp.ndarray,
                        a_r: np.ndarray, a_i: np.ndarray | None,
                        stride: int, hist: int,
                        interpret: bool = False, out_fmt: str = "cs16"):
    """Banded map whose output IS the quantized interleaved wire
    (int32 for 16-bit wires / int16 for 8-bit, I low code / Q high):
    the kernel epilogue quantizes in VMEM so the separate convert pass
    never touches HBM.  Returns the (C, (n//stride)*G) packed wire, or
    None when the kernel path is unavailable or the format has no
    packed epilogue (caller runs apply_planar + convert.from_planar)."""
    ch, n = xr.shape
    from iq_tool_tpu.ops import pallas_kernels
    if not pallas_kernels.packable_out(out_fmt):
        return None
    if not can_pack(stride, hist, a_r.shape[1], n, ch, interpret):
        return None
    return pallas_kernels.banded_apply(state_r, state_i, xr, xi,
                                       a_r, a_i, stride, hist,
                                       interpret=interpret,
                                       pack_fmt=out_fmt)
