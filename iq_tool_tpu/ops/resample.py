"""Arbitrary-ratio multi-stage polyphase resampler (msresamp_crcf role).

Contract (src/resampler.c, setup.c:91-122): ratio = target_rate /
input_rate, validated 0.001..1000; 60 dB stop-band attenuation
(constants.h:137); streaming `execute`; reset on discontinuity.

Architecture (mirrors liquid msresamp's staging, re-designed for XLA's
static shapes):

  [halfband decimators x s_d] -> [arbitrary-ratio stage, r in [0.5, 2)]
                               -> [halfband interpolators x s_u]

* Ratios are rationalized to P/Q (Farey-bounded; exact for real-world
  integer rate pairs).  The device block is sized so every stage sees a
  static shape and produces EXACTLY n*P/Q outputs per block: n_in is a
  multiple of 2^s_d * q_arb, so the fractional phase pattern of the
  arbitrary stage repeats identically every block — no data-dependent
  shapes, no fractional carry.

* The arbitrary stage is an *analytic* polyphase: the set of fractional
  phases is finite and known at setup, so the Kaiser-windowed-sinc kernel
  is evaluated exactly at every needed (phase, tap) point into a dense
  weight matrix W[M, K] (zero phase-quantization error — liquid quantizes
  to a 64-entry filterbank and lerps; we don't have to).  Execution is a
  static gather of input windows + einsum: out[c,m] = sum_k ext[c, idx[m,k]] * W[m,k].

* Halfband stages are strided MXU convolutions (decim) / polyphase
  two-branch interpolators (interp) with half-zero Kaiser halfband taps.

Per-stream carry: a tuple of input tails, one per stage.  Streaming delay
of the arbitrary stage is `semilength` input samples (kernel centered).
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from iq_tool_tpu import constants as C


def rationalize(ratio: float, max_denom: int = C.RESAMP_MAX_DENOM) -> tuple[int, int]:
    """ratio -> (P, Q) in lowest terms, |ratio - P/Q| minimal for Q <= max."""
    if not (C.RESAMPLE_RATIO_MIN <= ratio <= C.RESAMPLE_RATIO_MAX):
        raise ValueError(
            f"resample ratio {ratio} out of range "
            f"[{C.RESAMPLE_RATIO_MIN}, {C.RESAMPLE_RATIO_MAX}] (setup.c:106-113)")
    fr = Fraction(ratio).limit_denominator(max_denom)
    return fr.numerator, fr.denominator


def _kaiser_beta(atten_db: float) -> float:
    a = float(atten_db)
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a > 21.0:
        return 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


def _kernel(t: np.ndarray, fc: float, semilen: int, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc at arbitrary real offsets t (input-sample units)."""
    w_arg = 1.0 - (t / semilen) ** 2
    w = np.where(w_arg > 0, np.i0(beta * np.sqrt(np.maximum(w_arg, 0.0))), 0.0)
    w = w / np.i0(beta)
    g = 2.0 * fc * np.sinc(2.0 * fc * t)
    return np.where(np.abs(t) <= semilen, g * w, 0.0)


def halfband_taps(atten_db: float = C.RESAMPLER_ATTENUATION_DB,
                  transition: float = 0.08) -> np.ndarray:
    """Odd-length halfband lowpass (fc = 0.25), even offsets exactly zero."""
    n = int(np.ceil((atten_db - 7.95) / (14.26 * transition)))
    # halfband structure wants (n-1)/2 odd so zero taps land symmetrically
    n |= 1
    if ((n - 1) // 2) % 2 == 0:
        n += 2
    beta = _kaiser_beta(atten_db)
    t = np.arange(n, dtype=np.float64) - (n - 1) / 2
    h = 0.5 * np.sinc(0.5 * t) * np.kaiser(n, beta)
    c = (n - 1) // 2
    mask = (np.abs(t) % 2 == 0) & (t != 0)
    h[mask] = 0.0
    h[c] = 0.5
    return (h / h.sum()).astype(np.float64)  # unity DC gain


# ------------------------------ stages ---------------------------------------

def _conv_valid_real(x: jnp.ndarray, h: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    lhs = x[:, None, :]
    rhs = h[::-1][None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return out[:, 0, :]


def _conv_complex(ext: jnp.ndarray, h: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    xr, xi = jnp.real(ext), jnp.imag(ext)
    hf = jnp.asarray(np.asarray(h, np.float32))
    return (_conv_valid_real(xr, hf, stride)
            + 1j * _conv_valid_real(xi, hf, stride)).astype(jnp.complex64)


class _HalfbandDecim:
    """y[m] = (h * x)[2m]; tail = K-1 input samples."""

    def __init__(self, taps: np.ndarray):
        self.taps = np.asarray(taps, np.float32)
        self.k = len(taps)

    def init(self, channels: int) -> jnp.ndarray:
        return jnp.zeros((channels, self.k - 1), jnp.complex64)

    def __call__(self, x, state):
        ext = jnp.concatenate([state, x], axis=-1)
        y = _conv_complex(ext, self.taps, stride=2)
        return y, ext[:, -(self.k - 1):]


class _HalfbandInterp:
    """Polyphase zero-stuff interpolator.

    With prototype length 2c+1 and c odd, the odd-phase sub-filter is a
    single unit tap (the center), so: even outputs = conv(x, H[0::2])
    (the wing taps, a half-sample interpolator) and odd outputs =
    x delayed by (c-1)/2.  Prototype gain 2x (unity net after stuffing).
    """

    def __init__(self, taps: np.ndarray):
        taps = np.asarray(taps, np.float64) * 2.0
        n = len(taps)
        c = (n - 1) // 2                           # odd by construction
        self.h_even = taps[0::2].astype(np.float32)
        self.k = len(self.h_even)                  # = c + 1
        self.delay = (c - 1) // 2

    def init(self, channels: int) -> jnp.ndarray:
        return jnp.zeros((channels, self.k - 1), jnp.complex64)

    def __call__(self, x, state):
        ext = jnp.concatenate([state, x], axis=-1)       # (C, N + k - 1)
        n = x.shape[-1]
        ev = _conv_complex(ext, self.h_even)             # (C, N)
        s = self.k - 1 - self.delay
        od = ext[:, s:s + n]
        y = jnp.stack([ev, od], axis=-1).reshape(x.shape[0], 2 * n)
        return y.astype(jnp.complex64), ext[:, -(self.k - 1):]


@dataclasses.dataclass(frozen=True)
class ArbPlan:
    p: int
    q: int
    n_in: int
    n_out: int
    semilength: int
    history: int
    weights: np.ndarray
    starts: np.ndarray


def _make_arb_plan(p: int, q: int, n_in: int, atten_db: float,
                   semilength: int) -> ArbPlan:
    assert n_in % q == 0
    n_out = n_in * p // q
    m = int(semilength)
    k_taps = 2 * m
    hist = 2 * m - 1
    beta = _kaiser_beta(atten_db)
    fc = 0.5 * min(1.0, p / q) * C.RESAMP_FC_FACTOR

    mm = np.arange(n_out, dtype=np.float64)
    tau = mm * q / p - m               # delayed interpolation time
    n_base = np.floor(tau).astype(np.int64)
    frac = tau - n_base
    k = np.arange(k_taps, dtype=np.float64)
    t = frac[:, None] + (m - 1) - k[None, :]
    w = _kernel(t, fc, m, beta)
    w = w / np.sum(w, axis=1, keepdims=True)   # exact unity DC per phase
    starts = (n_base - m + 1 + hist).astype(np.int64)
    assert starts.min() >= 0 and starts.max() + k_taps <= n_in + hist, \
        (starts.min(), starts.max(), n_in, hist)
    return ArbPlan(p=p, q=q, n_in=n_in, n_out=n_out, semilength=m,
                   history=hist, weights=w.astype(np.float32),
                   starts=starts.astype(np.int32))


class _ArbStage:
    def __init__(self, plan: ArbPlan):
        self.plan = plan
        k_taps = plan.weights.shape[1]
        # numpy (not device arrays): jit embeds them as literal constants
        self._idx = plan.starts[:, None] + np.arange(k_taps, dtype=np.int32)[None, :]
        self._wr = plan.weights

    def init(self, channels: int) -> jnp.ndarray:
        return jnp.zeros((channels, self.plan.history), jnp.complex64)

    def __call__(self, x, state):
        ext = jnp.concatenate([state, x], axis=-1)
        windows = ext[:, self._idx]                        # (C, M, K)
        w = jnp.asarray(self._wr).astype(jnp.complex64)
        y = jnp.einsum("cmk,mk->cm", windows, w)
        return y.astype(jnp.complex64), ext[:, -self.plan.history:]


# --------------------------- multi-stage driver ------------------------------

@dataclasses.dataclass(frozen=True)
class ResamplePlan:
    p: int
    q: int
    n_in: int
    n_out: int
    s_decim: int
    s_interp: int
    arb: ArbPlan | None          # None for exact passthrough / pow2-only

    @property
    def ratio(self) -> float:
        return self.p / self.q


class Resampler:
    """Multi-stage streaming resampler.

    Block contract: input blocks of exactly ``plan.n_in`` frames produce
    exactly ``plan.n_out`` frames.  Carry is a tuple of per-stage tails.
    """

    def __init__(self, ratio: float, target_block: int = C.DEFAULT_BLOCK_SIZE,
                 atten_db: float = C.RESAMPLER_ATTENUATION_DB,
                 semilength: int = C.RESAMP_SEMILENGTH,
                 max_denom: int = C.RESAMP_MAX_DENOM,
                 max_out: int = 1 << 21):
        p, q = rationalize(ratio, max_denom)
        r = p / q
        s_d = 0
        while r <= 0.5:
            r *= 2.0
            s_d += 1
        s_u = 0
        while r >= 2.0:
            r /= 2.0
            s_u += 1

        # arbitrary-stage rational ratio (exact arithmetic)
        fr = Fraction(p * 2 ** s_d, q * 2 ** s_u)
        pa, qa = fr.numerator, fr.denominator

        # n_in must be divisible by 2^s_d, and n_in / 2^s_d by qa
        unit = (2 ** s_d) * qa
        blocks = max(1, round(target_block / unit))
        n_in = blocks * unit
        n_mid = n_in >> s_d
        n_arb = n_mid * pa // qa
        n_out = n_arb << s_u
        while n_out > max_out and blocks > 1:
            blocks -= 1
            n_in = blocks * unit
            n_mid = n_in >> s_d
            n_arb = n_mid * pa // qa
            n_out = n_arb << s_u
        if n_out > max_out:
            raise ValueError(
                f"ratio {p}/{q}: block would need {n_out} outputs (> {max_out})")

        hb = halfband_taps(atten_db)
        self.stages: list = [_HalfbandDecim(hb) for _ in range(s_d)]
        arb_plan = None
        if not (pa == 1 and qa == 1):
            arb_plan = _make_arb_plan(pa, qa, n_mid, atten_db, semilength)
            self.stages.append(_ArbStage(arb_plan))
        self.stages.extend(_HalfbandInterp(hb) for _ in range(s_u))

        self.plan = ResamplePlan(p=p, q=q, n_in=n_in, n_out=n_out,
                                 s_decim=s_d, s_interp=s_u, arb=arb_plan)

    def init(self, channels: int) -> tuple:
        return tuple(s.init(channels) for s in self.stages)

    def reset(self, state: tuple) -> tuple:
        return jax.tree_util.tree_map(jnp.zeros_like, state)

    def __call__(self, x: jnp.ndarray, state: tuple):
        new_states = []
        for stage, st in zip(self.stages, state):
            x, ns = stage(x, st)
            new_states.append(ns)
        return x, tuple(new_states)
