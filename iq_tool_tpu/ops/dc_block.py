"""First-order IIR DC blocker.

Contract (src/dc_block.c:20-86):  H(z) = (1 - z^-1) / (1 - (1-a) z^-1)
with a = 2*pi*DC_BLOCK_CUTOFF_HZ / Fs at the *input* rate; applied
in-place per block; reset on stream discontinuity.

TPU design: the recurrence y[n] = (1-a)*y[n-1] + (x[n] - x[n-1]) is a
first-order *linear* recurrence, so instead of a per-sample loop we run a
log-depth ``jax.lax.associative_scan`` over the block (the classic
linear-recurrence composition (A, B) -> (A2*A1, B2 + A2*B1)).  Carry is
(x_prev, y_prev) per channel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from iq_tool_tpu.constants import DC_BLOCK_CUTOFF_HZ


class DcState(NamedTuple):
    x_prev: jnp.ndarray  # (C,) complex64
    y_prev: jnp.ndarray  # (C,) complex64


def alpha_for_rate(sample_rate: float, cutoff_hz: float = DC_BLOCK_CUTOFF_HZ) -> float:
    return float(2.0 * np.pi * cutoff_hz / sample_rate)


def init(channels: int) -> DcState:
    # two distinct buffers (a shared one breaks jit argument donation)
    return DcState(jnp.zeros((channels,), jnp.complex64),
                   jnp.zeros((channels,), jnp.complex64))


def reset(state: DcState) -> DcState:
    return DcState(jnp.zeros_like(state.x_prev), jnp.zeros_like(state.y_prev))


def apply(x: jnp.ndarray, state: DcState, alpha: float) -> tuple[jnp.ndarray, DcState]:
    """x: (C, N) complex64 -> (y, new_state)."""
    a = jnp.complex64(1.0 - alpha)
    # b[n] = x[n] - x[n-1], with x[-1] from the carry
    xm1 = jnp.concatenate([state.x_prev[:, None], x[:, :-1]], axis=-1)
    b = x - xm1
    # fold the carried y[-1] into the first element: y[0] = a*y[-1] + b[0]
    b = b.at[:, 0].add(a * state.y_prev)

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, b2 + a2 * b1

    coeffs = jnp.full_like(b, a)
    _, y = jax.lax.associative_scan(combine, (coeffs, b), axis=-1)
    return y.astype(jnp.complex64), DcState(x[:, -1], y[:, -1])
