"""Pallas TPU kernels for the hot banded ops.

The XLA path in ops/banded.py materializes the strided windows tensor in
HBM ((C, nb, S+hist) floats written and re-read around each matmul), and
needs the carry tail CONCATENATED onto the block (another full read +
write).  This kernel fuses both into the matmul: a (channel, time) grid
walks tiles of TB windows, Pallas double-buffers the bulk/halo input
DMAs automatically (BlockSpec pipelining), windows are assembled in VMEM
from reshaped views of x itself (the K-1 left context comes from a
left-halo block, or from the carried state ref on the first tile), and
the banded matrix A stays VMEM-resident across all cells (constant
index_map).  HBM traffic drops to ~exactly in + out.

Used by the polyphase resampler stages and the direct FIR filter (both
are "banded" maps, see ops/banded.py).  Complex taps cost 4 in-kernel
matmuls instead of 2.

The kernel is planar (f32 real/imag planes): Pallas has no complex
dtype, which is one of the reasons the whole chain runs planar.

TPU tiling constraints shape the design: channel blocks are 8 sublanes
(or all of C), the bulk tile TB*S must be a multiple of 128 lanes (TB
chosen div-8, strides are steered to multiples of 16 where possible),
halo blocks are the smallest 128-multiple divisor of the tile covering
the tap history, the state block's last dim equals its full array dim,
and the output is written (C, nb, G) so its last dim equals the full
array dim.  ``plan()`` reports whether a geometry fits; callers fall
back to the XLA path when it does not.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# Per-cell working-set target and the DC-fused kernel's cell cap (in
# lanes).  Env-tunable for A/B (tools/ use them); the defaults are the
# measured sweet spot on v5e (round-5 sweep: cap 32/6M = 5076 Msps
# flagship, cap 64/12M = 5509, cap 128/24M = VMEM OOM at the real 16M
# scoped limit) — raising the cap amortizes per-tile fixed costs
# (window-ctx reload, NCO table read, carry logic) against VMEM
# pressure; bytes_for() tracks the scoped allocation closely (the 24M
# budget produced a measured 24.18M scoped alloc), so 12M keeps ~4M
# headroom under the hardware limit.
_VMEM_BUDGET = int(os.environ.get("IQ_VMEM_BUDGET", 12 * 1024 * 1024))
_DC_CELL_CAP = int(os.environ.get("IQ_DC_CELL_CAP", "64"))

# DC in-subtile prefix engine: "matmul" (HIGHEST-precision triangular
# matmul — default) or "cumsum" (masked log-step lane cumsum on the VPU)
# for A/B via IQ_DC_PREFIX.  Interleaved flagship A/B on real v5e
# (tools/dc_ab.py, 2026-08-19): matmul 4498 vs cumsum 4265 Msps — the
# MXU has headroom in this kernel while the VPU rolls are the binding
# engine, so the ~6-pass matmul still wins.  Both are f32-accumulated
# and sit far inside the 60 dB contract (max |diff| ~1.3e-5 on unit-
# variance noise); the cumsum engine is kept tested as the fallback for
# geometries where the MXU is saturated.
_DC_PREFIX_CUMSUM = os.environ.get("IQ_DC_PREFIX", "matmul") == "cumsum"


def set_dc_prefix_engine(name: str) -> None:
    """Switch the DC in-subtile prefix engine ("matmul" | "cumsum").

    The flag is read at TRACE time (module global), so callers must
    re-trace (rebuild the Chain / re-jit) after switching; tools/dc_ab.py
    and the tests share this one supported switch point."""
    global _DC_PREFIX_CUMSUM
    if name not in ("matmul", "cumsum"):
        raise ValueError(f"unknown DC prefix engine {name!r}")
    _DC_PREFIX_CUMSUM = name == "cumsum"


def _cs16_fmt():
    from iq_tool_tpu.formats import get_format
    return get_format("cs16")


def _pick_halo(cell: int, hist: int) -> int | None:
    """Smallest divisor of cell that is a multiple of 128 and >= hist."""
    k = _LANES
    while k <= cell:
        if cell % k == 0 and k >= hist:
            return k
        k += _LANES
    return None


_SHIFT_PARTS_CAP = 4     # max row-shifted matmuls (bounds pad flops + VMEM)


def plan(stride: int, hist: int, g: int, nb: int, ch: int,
         dc: bool = False):
    """(cb, tb, s2, mode) tile plan or None when the geometry cannot lower.

    cb: channels per block (8 when 8 | C, else all of C);
    tb: windows per block (div-8 or == nb, lane-aligned tile; when no
    divisor of nb fits, a non-dividing tb gives a RAGGED grid — Pallas
    masks the partial last tile);
    s2: halo block width (128-multiple divisor of the tile);
    mode: 'shift' (k row-shifted matmuls, k = ceil((s+hist)/s) <= 4;
    needs s lane-aligned) or 'assemble' (in-VMEM lane-granular window
    build; only for hist <= stride — Mosaic miscompiles wide multi-piece
    lane concats, see the DC kernel's VMEM-scratch workaround).

    With ``dc`` (the fused DC-recurrence prologue, wire input): the tile
    must divide nb exactly (a masked ragged tile would corrupt the
    sequential DC carry), the cell is capped so the recurrence's subtile
    unroll stays small, the processed left context must fit the cell,
    and VMEM additionally holds the triangular matrix + two y-buffers.
    """
    if hist <= 0 or nb <= 0:
        return None
    cb = 8 if ch % 8 == 0 else ch
    l = stride + hist
    parts = -(-l // stride)
    if hist > stride:
        # beyond one stride of history only the shift formulation is
        # safe; it needs a lane-aligned stride and a bounded part count
        if stride % _LANES or parts > _SHIFT_PARTS_CAP:
            return None
        mode = "shift"
    else:
        # 'shift' trades lane-granular window assembly for a second
        # matmul of contraction depth s; measured on v5e the extra MXU
        # passes cost more than the assembly they save whenever
        # hist << s, so it is only used when the history is a large
        # fraction of the stride.
        mode = ("shift" if (stride % _LANES == 0
                            and stride // 2 < hist <= stride)
                else "assemble")
    if mode == "assemble" and stride % _LANES:
        # _window_tile splits the bulk as (cb, tb*s) -> (cb, tb, s): a
        # Mosaic vector shape cast whose minormost (lane) dim must stay
        # 128-aligned.  Real Mosaic rejects s % 128 != 0 ("unsupported
        # shape cast", hit by the folded CLI flagship at its default row
        # block: stage-1 regroups to s=224) even though interpret mode
        # accepts it — gate here so those geometries take the XLA
        # windows path instead of dying at compile.  Chain's block
        # sizing treats kernel coverage as a soft constraint and grows
        # the block to restore an aligned grouping where possible.
        return None
    halo_floor = (parts - 1) * stride if mode == "shift" else hist
    mat_rows = parts * stride if mode == "shift" else l
    w_ctx = (parts - 1) * stride if mode == "shift" else hist

    def bytes_for(tb):
        cell = tb * stride
        b = (4 * cb * (2 * cell + 2 * tb * l + 2 * tb * g)
             + 8 * mat_rows * g)
        if dc:
            b += 4 * 128 * 128 + 4 * cb * (2 * cell + 2 * w_ctx)
        return b

    def fits(tb):
        if (tb % 8 and tb != nb) or (tb * stride) % _LANES:
            return None
        cell = tb * stride
        if dc and (cell > _DC_CELL_CAP * _LANES or cell % _LANES
                   or w_ctx > cell):
            return None
        if bytes_for(tb) > _VMEM_BUDGET:
            return None
        s2 = _pick_halo(cell, halo_floor)
        if s2 is None and dc:
            return 0      # dc mode reads no halo (left ctx from scratch)
        return s2

    # exact divisors first (no masked tail); ragged tiles as the fallback
    for tb in range(nb, 0, -1):
        if nb % tb:
            continue
        s2 = fits(tb)
        if s2 is not None:
            return cb, tb, s2, mode
    if not dc:
        for tb in range(8 * (nb // 8), 0, -8):
            s2 = fits(tb)
            if s2 is not None:
                return cb, tb, s2, mode
    return None


def _shift_rows(b, h, st, *, cb, tb, s, hist, parts=2):
    """List of m-back row tensors for the k-part shift formulation:
    window j = concat(r_{j-(k-1)}, ..., r_{j-1}, r_j)[k*s - l:], so
    win @ A = sum_m rows_back[m] @ A_chunk[k-1-m].  The (k-1)*s left
    context comes from the left halo (or the carried state on the first
    time tile, spliced into its tail lanes; the splice's leading lanes
    hit the top chunk's zero rows).  Inputs are VALUES (already decoded
    from the wire in wire mode).  Returns [rows_back_0 (= rows), ...,
    rows_back_{k-1}]."""
    i = pl.program_id(1)
    rows = b.reshape(cb, tb, s)
    ctx_w = (parts - 1) * s
    halo_ctx = h[:, h.shape[-1] - ctx_w:]
    state_ctx = jnp.concatenate(
        [jnp.zeros((cb, ctx_w - hist), rows.dtype), st], axis=-1)
    ctx = jnp.where(i == 0, state_ctx, halo_ctx).reshape(cb, parts - 1, s)
    full = jnp.concatenate([ctx, rows], axis=1)   # (cb, tb + parts-1, s)
    return [full[:, parts - 1 - m:parts - 1 - m + tb, :]
            for m in range(parts)]


def _banded_inputs(refs, n_mats, wire_norm, wire_gain,
                   dtheta=0, cell=0, s2=0, wire_kind="cs16"):
    """Split a banded kernel's positional refs into decoded VALUES.

    Planar layout: (xr_b, xr_h, xr_st, xi_b, xi_h, xi_st, mats..., outs...).
    Wire layout:   (w_b, w_h, st_r, st_i, [phase], mats..., outs...) —
    the packed wire (int32 cs16 or int16 cu8/cs8, convert.wire_pack) is
    de-interleaved and normalized in-register, so the separate
    conversion pass never touches HBM (the input twin of the pack_fmt
    output epilogue).  With ``dtheta`` the decoded samples are also
    NCO-mixed at their global indices (bulk at i*cell, halo at
    i*cell - s2; tile 0's halo is unused garbage and the carried state
    arrives PRE-rotated from the caller), fusing the pre-resample
    frequency shift into the same pass."""
    refs = list(refs)
    if wire_norm:
        wb = refs.pop(0)[...]
        wh = refs.pop(0)[...]
        st_r = refs.pop(0)[...]
        st_i = refs.pop(0)[...]
        ph_ref = refs.pop(0) if dtheta else None

        def dec(v):
            return _wire_decode(v, wire_kind, wire_norm, wire_gain)

        xrb, xib = dec(wb)
        xrh, xih = dec(wh)
        if dtheta:
            i = pl.program_id(1)
            base_b = jnp.int32(i) * jnp.int32(cell)
            xrb, xib = _nco_mix_base(ph_ref, base_b, xrb.shape[0],
                                     xrb.shape[-1], dtheta, xrb, xib)
            xrh, xih = _nco_mix_base(ph_ref, base_b - jnp.int32(s2),
                                     xrh.shape[0], xrh.shape[-1],
                                     dtheta, xrh, xih)
        plane_r = (xrb, xrh, st_r)
        plane_i = (xib, xih, st_i)
    else:
        plane_r = (refs.pop(0)[...], refs.pop(0)[...], refs.pop(0)[...])
        plane_i = (refs.pop(0)[...], refs.pop(0)[...], refs.pop(0)[...])
    mats = [refs.pop(0) for _ in range(n_mats)]
    return plane_r, plane_i, mats, refs


# Formats the kernels can quantize + pack in their epilogue: two codes
# per element, element dtype sized so the host bitcast recovers the
# little-endian interleaved wire (convert.packed_to_wire).  32-bit wires
# (cs32/cu32/cf32) would need int64 elements — not packable.
_PACK_INFO = {  # fmt name -> (element dtype, bits per code)
    "cs16": (jnp.int32, 16), "sc16q11": (jnp.int32, 16),
    "cu16": (jnp.int32, 16), "cu8": (jnp.int16, 8), "cs8": (jnp.int16, 8),
}


def pack_wire_dtype(fmt_name: str):
    """Element dtype of the kernel-packed wire for fmt (KeyError if the
    format has no packed epilogue — gate with `fmt_name in _PACK_INFO`
    via packable_out)."""
    return _PACK_INFO[fmt_name][0]


def packable_out(fmt_name: str) -> bool:
    return fmt_name in _PACK_INFO


def _quant_wire(v, fmt):
    """convert.from_planar's quantizer with fmt's constants — the
    in-kernel twin (signed: scale, round-half-away, clamp
    [min_code, max_code]; unsigned: scale + offset_out, clamp [0, max],
    floor(+0.5)).  All pack-able formats' codes are f32-exact."""
    if fmt.signed:
        v = v * jnp.float32(fmt.scale)
        v = jnp.trunc(jnp.where(v > 0, v + 0.5, v - 0.5))
        v = jnp.clip(v, jnp.float32(fmt.min_code), jnp.float32(fmt.max_code))
    else:
        v = v * jnp.float32(fmt.scale) + jnp.float32(fmt.offset_out)
        v = jnp.clip(v, jnp.float32(0.0), jnp.float32(fmt.max_code))
        v = jnp.floor(v + 0.5)
    return v.astype(jnp.int32)


def _pack_wire(yr, yi, fmt_name):
    """Quantize + interleave into one element per frame: I in the low
    code, Q in the high — bit-identical to the little-endian interleaved
    wire after the host bitcast.  16-bit wires pack into int32; 8-bit
    wires into int16 (value-corrected before the narrowing cast so the
    int32->int16 conversion is exact, not bit-truncation-dependent)."""
    from iq_tool_tpu.formats import get_format
    fmt = get_format(fmt_name)
    dt, bits = _PACK_INFO[fmt_name]
    qi, qq = _quant_wire(yr, fmt), _quant_wire(yi, fmt)
    mask = jnp.int32((1 << bits) - 1)
    packed = (qi & mask) | ((qq & mask) << bits)
    if dt == jnp.int32:
        return packed
    # map [0, 65535] onto int16's value range before the cast
    packed = packed - ((packed >> 15) << 16)
    return packed.astype(dt)


def _banded_write(outs, yr, yi, pack):
    """Kernel epilogue: planar f32 outputs, or ONE packed wire ref
    (``pack`` = format name: the format conversion then never touches
    HBM — the last resampler stage writes the output bytes directly)."""
    if pack:
        outs[0][...] = _pack_wire(yr, yi, pack)
    else:
        outs[0][...] = yr
        outs[1][...] = yi


def _shift_kernel(*refs, tb, s, hist, g, parts=2, pack=False,
                  wire=(0.0, 1.0)):
    """Fast path (s lane-aligned): win @ A = sum_m rows_back[m] @
    A_chunk[k-1-m] with A split into k = ceil((s+hist)/s) stride-sized
    chunks — k clean matmuls, zero lane-granular shuffling (see
    _shift_rows)."""
    pr_, pi_, chunks, outs = _banded_inputs(refs, parts, *wire)
    cb = pr_[0].shape[0]
    cvals = [c[...] for c in chunks]

    def plane(vals):
        back = _shift_rows(*vals, cb=cb, tb=tb, s=s, hist=hist, parts=parts)
        acc = _mm(back[0], cvals[parts - 1], cb, tb, g)
        for m in range(1, parts):
            acc = acc + _mm(back[m], cvals[parts - 1 - m], cb, tb, g)
        return acc

    _banded_write(outs, plane(pr_), plane(pi_), pack)


def _shift_kernel_complex(*refs, tb, s, hist, g, parts=2, pack=False,
                          wire=(0.0, 1.0)):
    pl_r, pl_i, chunks, outs = _banded_inputs(refs, 2 * parts, *wire)
    cb = pl_r[0].shape[0]
    cr = [c[...] for c in chunks[:parts]]
    ci = [c[...] for c in chunks[parts:]]
    br = _shift_rows(*pl_r, cb=cb, tb=tb, s=s, hist=hist, parts=parts)
    bi = _shift_rows(*pl_i, cb=cb, tb=tb, s=s, hist=hist, parts=parts)

    def conv(back, cv):
        acc = _mm(back[0], cv[parts - 1], cb, tb, g)
        for m in range(1, parts):
            acc = acc + _mm(back[m], cv[parts - 1 - m], cb, tb, g)
        return acc

    yr = conv(br, cr) - conv(bi, ci)
    yi = conv(bi, cr) + conv(br, ci)
    _banded_write(outs, yr, yi, pack)


def _split_matrix(a: np.ndarray, s: int, hist: int, parts: int = 2):
    """A (s+hist, G) -> k chunks of (s, G): zero-pad A on top to k*s rows,
    then chunk_k = Apad[k*s:(k+1)*s]; win @ A = sum_m rows_back[m] @
    chunk[k-1-m].  For k=2 this is the classic split at the history
    boundary (chunk0 = zeros(s-hist) ++ A[:hist], chunk1 = A[hist:])."""
    l, g = a.shape
    apad = np.concatenate(
        [np.zeros((parts * s - l, g), a.dtype), a], axis=0)
    return [np.ascontiguousarray(apad[k * s:(k + 1) * s, :])
            for k in range(parts)]


def _window_tile(left, bulk, tb: int, s: int, hist: int):
    """(C, hist) left context + (C, tb*s) bulk -> (C, tb, s+hist) windows,
    window j = xfull[j*s : j*s + s + hist] with xfull = left ++ bulk."""
    ch = bulk.shape[0]
    l = s + hist
    n_parts = -(-l // s)                   # parts of width s covering l
    pad = n_parts * s - l
    xpad = jnp.concatenate(
        [left, bulk]
        + ([jnp.zeros((ch, pad), bulk.dtype)] if pad > 0 else []), axis=-1)
    # xpad: (C, hist + tb*s + pad); part slice [j*s, j*s + tb*s) for
    # j < n_parts ends at (n_parts-1)*s + tb*s = tb*s + hist + pad: in range
    parts = []
    remaining = l
    for j in range(n_parts):
        take = min(s, remaining)
        parts.append(xpad[:, j * s:j * s + tb * s]
                     .reshape(ch, tb, s)[:, :, :take])
        remaining -= take
    return jnp.concatenate(parts, axis=-1)


# Matmul precision: Mosaic offers DEFAULT (1-pass bf16, ~2e-3 error: below
# the 60 dB contract) and HIGHEST (multi-pass, ~f32, measured ~1.45x
# slower than needed).  We hand-roll the 3-term bf16 scheme instead:
# with x = hi + lo and A = A_hi + A_lo (both splits exact in bf16),
# x@A ~= hi@A_hi + lo@A_hi + hi@A_lo (the dropped lo@A_lo term is
# O(2^-16)); measured error ~4e-5 (~88 dB), comfortably above the 60 dB
# budget, at 3 single-pass matmuls.  Banded matrices are pre-split on the
# host and passed as one stacked (2, rows, G) bf16 ref per logical matrix.
def _DOT_BF16(a, b):
    """bf16-operand dot with f32 accumulation on every backend.

    On TPU, DEFAULT precision with bf16 operands IS the single-pass MXU
    with f32 accumulate — the fast path.  On CPU (interpret-mode tests),
    DEFAULT instead accumulates in bf16 (~2e-3: the split-correction
    terms vanish below the accumulator's rounding — found by the round-5
    fold/shard fuzz at 55 dB), so force HIGHEST there: operands stay
    bf16-rounded, accumulation is exact f32 — bit-faithful to what the
    MXU does.  Backend is resolved at TRACE time."""
    prec = (jax.lax.Precision.HIGHEST if jax.default_backend() == "cpu"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)


def _split_np(a: np.ndarray) -> np.ndarray:
    """f32 (rows, g) -> stacked (2, rows, g) bf16 [hi, lo], exact sum."""
    import ml_dtypes
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a.astype(np.float32) - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([hi, lo])


# Matmul term count, read at TRACE time (see set_mm_terms):
#   3 (default): hi@A_hi + lo@A_hi + hi@A_lo  (~4e-5, ~88 dB)
#   2:           hi@A_hi + lo@A_hi == x@A_hi  (x split exact; the whole
#                error is the bf16 rounding of the TAPS — a deterministic
#                LTI response change, measured per config in docs/PERF.md)
#   1:           hi@A_hi                      (perf PROBE only: ~47 dB)
_MM_TERMS = int(os.environ.get("IQ_MM_TERMS", "3"))


def set_mm_terms(terms: int) -> None:
    """Set the banded-matmul bf16 term count (trace-time flag; rebuild
    chains after switching).  tools/mm_ab.py is the measured A/B."""
    global _MM_TERMS
    if terms not in (1, 2, 3):
        raise ValueError(f"mm terms must be 1|2|3, got {terms}")
    _MM_TERMS = terms


def _mm(win, a_pair, ch, tb, g):
    """win (ch, tb, rows) f32 @ stacked bf16 pair (2, rows, g) -> f32."""
    w = win.reshape(ch * tb, win.shape[-1])
    w_hi = w.astype(jnp.bfloat16)
    a_hi, a_lo = a_pair[0], a_pair[1]
    y = _DOT_BF16(w_hi, a_hi)
    if _MM_TERMS >= 2:
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        y = y + _DOT_BF16(w_lo, a_hi)
    if _MM_TERMS >= 3:
        y = y + _DOT_BF16(w_hi, a_lo)
    return y.reshape(ch, tb, g)


def _left(state, halo, hist: int):
    """First time-tile takes the stream carry; later tiles the halo
    tail.  Inputs are VALUES."""
    i = pl.program_id(1)
    tail = halo[:, halo.shape[-1] - hist:]
    return jnp.where(i == 0, state, tail)


def _banded_kernel(*refs, tb, s, hist, g, pack=False, wire=(0.0, 1.0)):
    (xrb, xrh, xrst), (xib, xih, xist), (ar,), outs = \
        _banded_inputs(refs, 1, *wire)
    ch = xrb.shape[0]
    win_r = _window_tile(_left(xrst, xrh, hist), xrb, tb, s, hist)
    win_i = _window_tile(_left(xist, xih, hist), xib, tb, s, hist)
    _banded_write(outs, _mm(win_r, ar[...], ch, tb, g),
                  _mm(win_i, ar[...], ch, tb, g), pack)


def _banded_kernel_complex(*refs, tb, s, hist, g, pack=False,
                           wire=(0.0, 1.0)):
    (xrb, xrh, xrst), (xib, xih, xist), (ar, ai), outs = \
        _banded_inputs(refs, 2, *wire)
    ch = xrb.shape[0]
    win_r = _window_tile(_left(xrst, xrh, hist), xrb, tb, s, hist)
    win_i = _window_tile(_left(xist, xih, hist), xib, tb, s, hist)
    a_r, a_i = ar[...], ai[...]
    _banded_write(outs,
                  _mm(win_r, a_r, ch, tb, g) - _mm(win_i, a_i, ch, tb, g),
                  _mm(win_i, a_r, ch, tb, g) + _mm(win_r, a_i, ch, tb, g),
                  pack)


def banded_apply(state_r: jnp.ndarray, state_i: jnp.ndarray,
                 xr: jnp.ndarray, xi: jnp.ndarray,
                 a_r: np.ndarray, a_i: np.ndarray | None,
                 stride: int, hist: int,
                 interpret: bool = False, pack_fmt=None,
                 wire_i32: jnp.ndarray | None = None,
                 wire_norm: float = 0.0, wire_gain: float = 1.0,
                 nco_dtheta: int = 0, nco_phase: jnp.ndarray | None = None,
                 wire_kind: str = "cs16"):
    """Fused strided-window banded matmul.

    state_*: (C, hist) carried tap history (precedes this block's x);
    x*: (C, n) planes, n a multiple of ``stride``;
    a_r/a_i: (stride + hist, G) banded matrix (numpy, embedded constant).
    Returns (yr, yi): (C, (n // stride) * G) f32 — or, with
    ``pack_fmt`` (an output format name from _PACK_INFO; True is
    accepted as "cs16"), ONE (C, (n // stride) * G) int32/int16 array
    carrying the quantized interleaved wire (I low code, Q high): the
    final stage then writes the output bytes itself and the separate
    conversion pass never touches HBM.

    With ``wire_i32`` (+ wire_norm/wire_gain), the INPUT is the packed
    int32 cs16 wire de-interleaved and normalized in-register (xr/xi may
    be None; the carried state stays planar f32).  ``nco_dtheta`` +
    ``nco_phase`` (C, 1 uint32, phase of this block's first sample)
    additionally NCO-mix the decoded samples at their global indices —
    the pre-resample frequency shift fused into the same pass (the
    carried state must arrive PRE-rotated).

    Raises ValueError when the geometry is unsupported — gate with
    ``plan()`` (ops/banded.py does).
    """
    if wire_i32 is not None and not wire_norm:
        raise ValueError("wire_i32 requires wire_norm (the format "
                         "normalizer) — a zero norm would mis-parse the "
                         "kernel's positional refs")
    pack_fmt = "cs16" if pack_fmt is True else (pack_fmt or None)
    nco_dtheta = int(nco_dtheta) & 0xFFFFFFFF
    if nco_dtheta and (wire_i32 is None or nco_phase is None):
        raise ValueError("nco_dtheta needs wire mode and nco_phase")
    ch, n = (wire_i32 if wire_i32 is not None else xr).shape
    s = stride
    nb = n // s
    g = a_r.shape[1]
    l = s + hist
    assert a_r.shape[0] == l, (a_r.shape, l)

    geom = plan(s, hist, g, nb, ch)
    if geom is None:
        raise ValueError(f"unsupported banded geometry s={s} hist={hist} "
                         f"g={g} nb={nb}")
    cb, tb, s2, mode = geom
    cell = tb * s
    complex_taps = a_i is not None and np.any(a_i)
    wire_args = (wire_norm if wire_i32 is not None else 0.0, wire_gain,
                 nco_dtheta, cell, s2, wire_kind)

    # ragged grid when tb does not divide nb: Pallas masks the partial
    # last tile (plan() prefers exact divisors; nb values like 882 =
    # 2*3^2*7^2 have no div-8 divisor at all)
    grid = (ch // cb, -(-nb // tb))
    bulk_spec = pl.BlockSpec((cb, cell), lambda c, i: (c, i),
                             memory_space=pltpu.VMEM)
    # left halo: the s2 lanes ending at this tile's start; tile 0's map is
    # clamped to block 0 (its content is unused — the kernel takes state)
    halo_spec = pl.BlockSpec(
        (cb, s2),
        lambda c, i: (c, jnp.maximum(i * cell // s2 - 1, 0)),
        memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((cb, hist), lambda c, i: (c, 0),
                              memory_space=pltpu.VMEM)

    parts = -(-l // s)
    if mode == "shift":
        per_mat = [_split_matrix(a_r, s, hist, parts)]
        if complex_taps:
            per_mat.append(_split_matrix(a_i, s, hist, parts))
            kern = functools.partial(_shift_kernel_complex, tb=tb, s=s,
                                     hist=hist, g=g, parts=parts,
                                     pack=pack_fmt, wire=wire_args)
        else:
            kern = functools.partial(_shift_kernel, tb=tb, s=s,
                                     hist=hist, g=g, parts=parts,
                                     pack=pack_fmt, wire=wire_args)
        mats = [jnp.asarray(_split_np(m)) for chunk in per_mat for m in chunk]
        mat_specs = [pl.BlockSpec((2, s, g), lambda c, i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in mats]
    else:
        mats = [jnp.asarray(_split_np(a_r))]
        if complex_taps:
            kern = functools.partial(_banded_kernel_complex, tb=tb, s=s,
                                     hist=hist, g=g, pack=pack_fmt,
                                     wire=wire_args)
            mats.append(jnp.asarray(_split_np(a_i)))
        else:
            kern = functools.partial(_banded_kernel, tb=tb, s=s,
                                     hist=hist, g=g, pack=pack_fmt,
                                     wire=wire_args)
        mat_specs = [pl.BlockSpec((2, l, g), lambda c, i: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in mats]

    out_spec = pl.BlockSpec((cb, tb, g), lambda c, i: (c, i, 0),
                            memory_space=pltpu.VMEM)
    # logical matmuls actually issued (both planes), times contraction depth
    if mode == "shift":
        n_mm, depth = parts * (4 if complex_taps else 2), s
    else:
        n_mm, depth = (4 if complex_taps else 2), l
    flops = 2 * n_mm * nb * depth * g * ch
    if pack_fmt:
        pdt = pack_wire_dtype(pack_fmt)
        out_specs = out_spec
        out_shape = jax.ShapeDtypeStruct((ch, nb, g), pdt)
        out_bytes = ch * nb * g * np.dtype(pdt).itemsize
    else:
        out_specs = (out_spec, out_spec)
        out_shape = (jax.ShapeDtypeStruct((ch, nb, g), jnp.float32),
                     jax.ShapeDtypeStruct((ch, nb, g), jnp.float32))
        out_bytes = 2 * ch * nb * g * 4
    if wire_i32 is not None:
        ph_specs = []
        ph_args = []
        if nco_dtheta:
            ph_specs = [pl.BlockSpec((cb, 1), lambda c, i: (c, 0),
                                     memory_space=pltpu.VMEM)]
            ph_args = [nco_phase]
        in_specs = [bulk_spec, halo_spec, state_spec, state_spec,
                    *ph_specs, *mat_specs]
        args = (wire_i32, wire_i32, state_r, state_i, *ph_args, *mats)
        in_bytes = 4 * ch * n + 2 * 4 * ch * hist
    else:
        in_specs = [bulk_spec, halo_spec, state_spec,
                    bulk_spec, halo_spec, state_spec, *mat_specs]
        args = (xr, xr, state_r, xi, xi, state_i, *mats)
        in_bytes = 4 * 2 * ch * (n + hist)
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=in_bytes + out_bytes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    if pack_fmt:
        return res.reshape(ch, nb * g)
    yr, yi = res
    return yr.reshape(ch, nb * g), yi.reshape(ch, nb * g)


# ---------------- DC-fused banded stage-0 kernel ------------------------------

def _banded_dc_kernel(*refs, tb, s, hist, g, mode, parts, complex_taps,
                      pack, wire_norm, wire_gain, dtheta, a, t,
                      wire_kind="cs16", nco_tab=False):
    """Resampler stage 0 with the whole PRE-stage fused into its
    prologue: packed cs16 wire decode -> DC-block recurrence -> NCO mix
    -> strided-window banded matmul, one HBM read of the wire and one
    write of the stage output.  Replaces the separate fused-pre kernel
    pass for the flagship chain shape (dc + shift + resample): the
    pre-kernel's plane write and stage 0's plane re-read (~16 B/input
    sample) never touch HBM.

    Grid is (channel blocks, time tiles) with the time dim sequential
    ('arbitrary'), so VMEM scratch carries BOTH the DC (x_prev, y_prev)
    state and the previous tile's PROCESSED tail across tiles — the
    banded window's left context must be post-DC/post-NCO values, which
    a raw-wire halo cannot provide.  Tile 0 takes the stream carries:
    dc state from dcst_ref, window context from the stage state (stored
    processed + pre-rotated, as in the plain wire path).  The kernel
    also emits the processed tail (the next step's stage state) and the
    new DC state, so the caller needs NO XLA-side tail recompute.

    DC math is _dc_plane_tile, shared with _dc_kernel — the fused and
    separate paths stay bitwise identical (dc_block.c:24-43 contract).
    """
    refs = list(refs)
    w_ref = refs.pop(0)
    st_r_ref = refs.pop(0)
    st_i_ref = refs.pop(0)
    dcst_ref = refs.pop(0)
    m_ref = refs.pop(0)
    d_ref = refs.pop(0)
    ph_ref = refs.pop(0) if dtheta else None
    tab_ref = refs.pop(0) if (dtheta and nco_tab) else None
    n_mats = ((2 * parts if complex_taps else parts) if mode == "shift"
              else (2 if complex_taps else 1))
    mats = [refs.pop(0) for _ in range(n_mats)]
    outs = [refs.pop(0) for _ in range(1 if pack else 2)]
    tail_r_ref = refs.pop(0)
    tail_i_ref = refs.pop(0)
    dcout_ref = refs.pop(0)
    carry, ybuf_r, ybuf_i, ctx_r, ctx_i = refs

    i = pl.program_id(1)
    cb = w_ref.shape[0]
    cell = tb * s
    w_ctx = ctx_r.shape[-1]

    @pl.when(i == 0)
    def _():
        carry[...] = dcst_ref[...]

    # wire decode (same op order as convert.to_planar)
    xr, xi = _wire_decode(w_ref[...], wire_kind, wire_norm, wire_gain)

    # DC recurrence across the tile (sequential via the carry scratch)
    n_t = cell // t
    m = m_ref[...]
    decay = d_ref[...]
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (cb, cell), 1) == 0
    af = jnp.float32(a)
    xr, xr_l, yr_l = _dc_plane_tile(xr, carry, ybuf_r, 0, m, decay, af,
                                    lane0, cb, n_t, t, a=a)
    xi, xi_l, yi_l = _dc_plane_tile(xi, carry, ybuf_i, 1, m, decay, af,
                                    lane0, cb, n_t, t, a=a)
    carry[:, 0:1] = xr_l
    carry[:, 1:2] = xi_l
    carry[:, 2:3] = yr_l
    carry[:, 3:4] = yi_l
    dcout_ref[...] = carry[...]

    if dtheta:
        base = jnp.int32(i) * jnp.int32(cell)
        xr, xi = _nco_mix_base(ph_ref, base, cb, cell, dtheta, xr, xi,
                               tab_ref=tab_ref)

    # window left context: read the PREVIOUS tile's processed tail
    # before this tile overwrites it
    ctx_r_val = ctx_r[...]
    ctx_i_val = ctx_i[...]
    st_r = st_r_ref[...]
    st_i = st_i_ref[...]

    if mode == "shift":
        cvals = [c[...] for c in mats]
        br = _shift_rows(xr, ctx_r_val, st_r, cb=cb, tb=tb, s=s,
                         hist=hist, parts=parts)
        bi = _shift_rows(xi, ctx_i_val, st_i, cb=cb, tb=tb, s=s,
                         hist=hist, parts=parts)

        def conv(back, cv):
            acc = _mm(back[0], cv[parts - 1], cb, tb, g)
            for mm_ in range(1, parts):
                acc = acc + _mm(back[mm_], cv[parts - 1 - mm_], cb, tb, g)
            return acc

        if complex_taps:
            cr_, ci_ = cvals[:parts], cvals[parts:]
            yr = conv(br, cr_) - conv(bi, ci_)
            yi = conv(bi, cr_) + conv(br, ci_)
        else:
            yr, yi = conv(br, cvals), conv(bi, cvals)
    else:
        win_r = _window_tile(_left(st_r, ctx_r_val, hist), xr, tb, s, hist)
        win_i = _window_tile(_left(st_i, ctx_i_val, hist), xi, tb, s, hist)
        if complex_taps:
            a_r, a_i = mats[0][...], mats[1][...]
            yr = (_mm(win_r, a_r, cb, tb, g) - _mm(win_i, a_i, cb, tb, g))
            yi = (_mm(win_i, a_r, cb, tb, g) + _mm(win_r, a_i, cb, tb, g))
        else:
            a_r = mats[0][...]
            yr = _mm(win_r, a_r, cb, tb, g)
            yi = _mm(win_i, a_r, cb, tb, g)
    _banded_write(outs, yr, yi, pack)

    # save this tile's processed tail: next tile's window context, and
    # (from the last tile) the next step's carried stage state
    ctx_r[...] = xr[:, cell - w_ctx:]
    ctx_i[...] = xi[:, cell - w_ctx:]
    tail_r_ref[...] = xr[:, cell - hist:]
    tail_i_ref[...] = xi[:, cell - hist:]


def banded_apply_dc(state_r: jnp.ndarray, state_i: jnp.ndarray,
                    dc_state: jnp.ndarray, dc_alpha: float,
                    a_r: np.ndarray, a_i: np.ndarray | None,
                    stride: int, hist: int,
                    wire_i32: jnp.ndarray, wire_norm: float,
                    wire_gain: float = 1.0,
                    nco_dtheta: int = 0,
                    nco_phase: jnp.ndarray | None = None,
                    pack_fmt=None,
                    interpret: bool = False,
                    wire_kind: str = "cs16"):
    """Stage-0 banded map with the fused wire-decode + DC + NCO prologue
    (see _banded_dc_kernel).  state_*: (C, hist) PROCESSED stage history
    (post-DC, pre-rotated); dc_state: (C, 4) [xr, xi, yr, yi] prevs.
    Returns (y | wire, tail_r, tail_i, new_dc_state) where tail_* is the
    processed (C, hist) history for the next step.  Gate with
    plan(..., dc=True); raises on unsupported geometry."""
    if not wire_norm:
        raise ValueError("banded_apply_dc requires wire input")
    pack_fmt = "cs16" if pack_fmt is True else (pack_fmt or None)
    nco_dtheta = int(nco_dtheta) & 0xFFFFFFFF
    if nco_dtheta and nco_phase is None:
        raise ValueError("nco_dtheta needs nco_phase")
    ch, n = wire_i32.shape
    s = stride
    nb = n // s
    g = a_r.shape[1]
    l = s + hist
    assert a_r.shape[0] == l, (a_r.shape, l)
    geom = plan(s, hist, g, nb, ch, dc=True)
    if geom is None:
        raise ValueError(f"unsupported dc-banded geometry s={s} "
                         f"hist={hist} g={g} nb={nb}")
    cb, tb, _, mode = geom
    cell = tb * s
    t = _LANES
    parts = -(-l // s)
    w_ctx = (parts - 1) * s if mode == "shift" else hist
    complex_taps = a_i is not None and np.any(a_i)
    a = float(1.0 - dc_alpha)
    m_t, d_vec = _dc_consts(a, t)

    nco_tab = bool(nco_dtheta) and _NCO_TABLES
    kern = functools.partial(
        _banded_dc_kernel, tb=tb, s=s, hist=hist, g=g, mode=mode,
        parts=parts, complex_taps=complex_taps, pack=pack_fmt,
        wire_norm=float(wire_norm), wire_gain=float(wire_gain),
        dtheta=nco_dtheta, a=a, t=t, wire_kind=wire_kind,
        nco_tab=nco_tab)

    if mode == "shift":
        per = [_split_matrix(a_r, s, hist, parts)]
        if complex_taps:
            per.append(_split_matrix(a_i, s, hist, parts))
        mats = [jnp.asarray(_split_np(m)) for chunk in per for m in chunk]
        mat_specs = [pl.BlockSpec((2, s, g), lambda c, i: (0, 0, 0),
                                  memory_space=pltpu.VMEM) for _ in mats]
    else:
        mats = [jnp.asarray(_split_np(a_r))]
        if complex_taps:
            mats.append(jnp.asarray(_split_np(a_i)))
        mat_specs = [pl.BlockSpec((2, l, g), lambda c, i: (0, 0, 0),
                                  memory_space=pltpu.VMEM) for _ in mats]

    grid = (ch // cb, nb // tb)
    bulk_spec = pl.BlockSpec((cb, cell), lambda c, i: (c, i),
                             memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((cb, hist), lambda c, i: (c, 0),
                              memory_space=pltpu.VMEM)
    dc_spec = pl.BlockSpec((cb, 4), lambda c, i: (c, 0),
                           memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec((t, t), lambda c, i: (0, 0),
                          memory_space=pltpu.VMEM)
    const1 = pl.BlockSpec((1, t), lambda c, i: (0, 0),
                          memory_space=pltpu.VMEM)
    ph_specs, ph_args = [], []
    if nco_dtheta:
        ph_specs = [pl.BlockSpec((cb, 1), lambda c, i: (c, 0),
                                 memory_space=pltpu.VMEM)]
        ph_args = [nco_phase]
        if nco_tab:
            ph_specs.append(pl.BlockSpec((8, cell), lambda c, i: (0, 0),
                                         memory_space=pltpu.VMEM))
            ph_args.append(jnp.asarray(_nco_lane_table(nco_dtheta, cell)))
    out_spec = pl.BlockSpec((cb, tb, g), lambda c, i: (c, i, 0),
                            memory_space=pltpu.VMEM)
    if pack_fmt:
        pdt = pack_wire_dtype(pack_fmt)
        y_specs = [out_spec]
        y_shapes = [jax.ShapeDtypeStruct((ch, nb, g), pdt)]
    else:
        y_specs = [out_spec, out_spec]
        y_shapes = [jax.ShapeDtypeStruct((ch, nb, g), jnp.float32),
                    jax.ShapeDtypeStruct((ch, nb, g), jnp.float32)]
    n_mm = (parts * (4 if complex_taps else 2) if mode == "shift"
            else (4 if complex_taps else 2))
    depth = s if mode == "shift" else l
    flops = 2 * n_mm * nb * depth * g * ch + 2 * 2 * n * t * ch
    out_bytes = (ch * nb * g * np.dtype(pdt).itemsize if pack_fmt
                 else 2 * ch * nb * g * 4)
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bulk_spec, state_spec, state_spec, dc_spec,
                  const2, const1, *ph_specs, *mat_specs],
        out_specs=(*y_specs, state_spec, state_spec, dc_spec),
        out_shape=(*y_shapes,
                   jax.ShapeDtypeStruct((ch, hist), jnp.float32),
                   jax.ShapeDtypeStruct((ch, hist), jnp.float32),
                   jax.ShapeDtypeStruct((ch, 4), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((cb, 4), jnp.float32),
                        pltpu.VMEM((cb, cell), jnp.float32),
                        pltpu.VMEM((cb, cell), jnp.float32),
                        pltpu.VMEM((cb, w_ctx), jnp.float32),
                        pltpu.VMEM((cb, w_ctx), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            transcendentals=(0 if not nco_dtheta
                             else 2 * ch * (nb // tb) if nco_tab
                             else 2 * n * ch),
            bytes_accessed=4 * ch * n + out_bytes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(wire_i32, state_r, state_i, dc_state, jnp.asarray(m_t),
      jnp.asarray(d_vec), *ph_args, *mats)
    if pack_fmt:
        wire, tr, ti, st4 = res
        return wire.reshape(ch, nb * g), tr, ti, st4
    yr, yi, tr, ti, st4 = res
    return (yr.reshape(ch, nb * g), yi.reshape(ch, nb * g)), tr, ti, st4


# ---------------------------- DC blocker kernel -------------------------------

def _dc_plane_tile(x, carry, ybuf, pidx, m, decay, af, lane0,
                   cb, n_t, t, a=None):
    """One plane of the two-level DC-block recurrence over a (cb, cell)
    tile: closed-form in-subtile prefixes via ONE triangular matmul
    (m: M^T with M[i,j] = a^(i-j)), a statically unrolled loop over the
    cell's sub-tiles for the carry, (x_prev, y_prev) read from the carry
    scratch columns [pidx, pidx+2].  Shared by _dc_kernel and the
    DC-fused banded kernel so the two paths stay bitwise identical.
    Returns (y values, last x, last y)."""
    cell = n_t * t
    x_prev = carry[:, pidx:pidx + 1]
    y_prev = carry[:, pidx + 2:pidx + 3]
    xm1 = pltpu.roll(x, 1, axis=1)
    b = x - jnp.where(lane0, x_prev, xm1)
    # the carried y[-1] folds into the first element, so the subtile
    # carry loop below starts from ZERO (no double count)
    b = jnp.where(lane0, b + af * y_prev, b)
    # Engine guard (`a` is a Python float at trace time): the cumsum
    # engine scales by a^-j up to a^-(t-1); fine for the 10 Hz pole
    # (~1.004) but exponentially divergent for smaller `a` (a=0.9 ->
    # ~6.5e5 at t=128: catastrophic cancellation).  Fall back to the
    # exact matmul engine whenever the scale factor would exceed 2.
    use_cumsum = (_DC_PREFIX_CUMSUM
                  and a is not None and float(a) ** (t - 1) > 0.5)
    if use_cumsum:
        # lane mask below assumes t is a power of two
        assert t & (t - 1) == 0, f"cumsum engine requires pow2 t, got {t}"
        # In-subtile decayed prefix on the VPU: y[i] = a^i * P[i] with
        # P[i] = sum_{j<=i} a^-j b[j], so the t x t HIGHEST triangular
        # matmul (~6 MXU passes) becomes a masked log-step lane cumsum
        # (7 roll+select+add sweeps) plus two scalings.  Range is safe:
        # |a^-(t-1)| = e^{(t-1)|ln a|} ~ 1.004 for the 10 Hz / 2.048 MHz
        # pole.  Accuracy matches the exact matmul (both accumulate in
        # f32; the carried-offset path below is untouched).
        li = jax.lax.broadcasted_iota(jnp.int32, (cb, cell), 1) & (t - 1)
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        vpos_row = jnp.where(lane_row == 0, jnp.float32(1.0),
                             pltpu.roll(decay, 1, axis=1))   # a^(j%t)
        vneg_row = 1.0 / vpos_row                            # a^-(j%t)
        vpos = jnp.broadcast_to(vpos_row.reshape(1, 1, t),
                                (cb, n_t, t)).reshape(cb, cell)
        vneg = jnp.broadcast_to(vneg_row.reshape(1, 1, t),
                                (cb, n_t, t)).reshape(cb, cell)
        p = b * vneg
        k = 1
        while k < t:
            p = p + jnp.where(li >= k, pltpu.roll(p, k, axis=1),
                              jnp.float32(0.0))
            k *= 2
        y_loc = (p * vpos).reshape(cb, n_t, t)
    else:
        # exact (HIGHEST) matmul: the IIR feedback amplifies matmul
        # rounding by ~1/sqrt(1 - a^2t), so the bf16x3 scheme is not
        # accurate enough here; the triangular matmul is small anyway
        y_loc = jax.lax.dot_general(
            b.reshape(cb * n_t, t), m, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(cb, n_t, t)

    # Closed-form subtile carry: yp_j = sum_{k<=j} end_k (a^t)^(j-k) is
    # a lower-triangular matmul over the subtile END values, so the
    # former 32-step sequential scalar loop becomes ONE tiny exact
    # matmul and n_t INDEPENDENT stores (Mosaic can overlap them; the
    # VMEM-scratch assembly stays — wide multi-piece lane concats
    # miscompile).
    ends = y_loc[:, :, t - 1]                              # (cb, n_t)
    # build M[k, j] = (a^t)^(j-k) for j >= k from iotas (arbitrary array
    # constants do not lower inside Mosaic kernels)
    k_i = jax.lax.broadcasted_iota(jnp.int32, (n_t, n_t), 0)
    j_i = jax.lax.broadcasted_iota(jnp.int32, (n_t, n_t), 1)
    e_ji = (j_i - k_i).astype(jnp.float32)
    log_at = float(t) * float(np.log(np.float64(a)))  # a: python float
    m2 = jnp.where(e_ji >= 0,
                   jnp.exp(e_ji * jnp.float32(log_at)),
                   jnp.float32(0.0))
    yps = jax.lax.dot_general(
        ends, m2, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                # (cb, n_t)
    for j in range(n_t):
        start = yps[:, j - 1:j] if j else jnp.zeros((cb, 1), jnp.float32)
        ybuf[:, j * t:(j + 1) * t] = y_loc[:, j, :] + start * decay
    return ybuf[...], x[:, cell - 1:cell], yps[:, n_t - 1:n_t]


def _wire_decode(v, kind, norm, gain):
    """In-register decode of one packed wire tile (see convert.wire_pack
    for the layouts; convert.decode_packed is the XLA twin — keep the
    operation order identical: (x - off) * norm * gain, all f32)."""
    vi = v if v.dtype == jnp.int32 else v.astype(jnp.int32)
    if kind == "cs16":
        i_val, q_val, off = (vi << 16) >> 16, vi >> 16, 0.0
    elif kind == "cu8":
        i_val, q_val, off = vi & 0xFF, (vi >> 8) & 0xFF, 127.5
    elif kind == "cs8":
        i_val, q_val, off = (vi << 24) >> 24, (vi << 16) >> 24, 0.0
    elif kind == "cu16":
        i_val, q_val, off = vi & 0xFFFF, (vi >> 16) & 0xFFFF, 32767.5
    else:
        raise ValueError(f"unknown packed wire kind {kind!r}")
    xr = i_val.astype(jnp.float32)
    xi = q_val.astype(jnp.float32)
    if off:
        xr = xr - jnp.float32(off)
        xi = xi - jnp.float32(off)
    g = jnp.float32(gain)
    n = jnp.float32(norm)
    return (xr * n) * g, (xi * n) * g


def _dc_kernel(*refs, cb, cell, t, a, with_iq, dtheta, nco_tab=False,
               wire_norm=0.0, wire_gain=1.0, wire_kind="cs16"):
    """Fused DC-block recurrence over one (cb, cell) tile, with optional
    I/Q-imbalance apply and NCO mix postamble (saving two full HBM round
    trips of the chain's pre-stage).

    With ``wire_norm`` set, the input is ONE packed int32 cs16 wire block
    (I in the low 16 bits) de-interleaved and normalized in-register —
    the format conversion's separate read+write of both planes never
    touches HBM at all (sample_convert.c -> pre_processor.c fusion).

    y[n] = a*y[n-1] + x[n] - x[n-1] with closed-form in-subtile prefixes
    via ONE triangular matmul (m_ref: M[i,j] = a^(i-j)), a statically
    unrolled loop over the cell's sub-tiles for the carry, and a VMEM
    scratch carrying (x_prev, y_prev) per plane across grid cells (the
    TPU grid iterates the time dimension innermost, so scratch state
    flows in stream order; cell 0 loads the stream carry from st_ref)."""
    refs = list(refs)
    if wire_norm:
        wire_ref = refs.pop(0)
        xr_ref = xi_ref = None
    else:
        xr_ref = refs.pop(0)
        xi_ref = refs.pop(0)
    st_ref = refs.pop(0)
    m_ref = refs.pop(0)
    d_ref = refs.pop(0)
    iqf_ref = refs.pop(0) if with_iq else None
    ph_ref = refs.pop(0) if dtheta else None
    tab_ref = refs.pop(0) if (dtheta and nco_tab) else None
    outr_ref, outi_ref, stout_ref, carry, ybuf_r, ybuf_i = refs
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carry[...] = st_ref[...]

    n_t = cell // t
    m = m_ref[...]
    decay = d_ref[...]                      # (1, t): a^1..a^t
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (cb, cell), 1) == 0
    af = jnp.float32(a)

    if wire_norm:
        xr_val, xi_val = _wire_decode(wire_ref[...], wire_kind,
                                      wire_norm, wire_gain)
    else:
        xr_val = xr_ref[...]
        xi_val = xi_ref[...]

    yr, xr_l, yr_l = _dc_plane_tile(xr_val, carry, ybuf_r, 0, m, decay,
                                    af, lane0, cb, n_t, t, a=a)
    yi, xi_l, yi_l = _dc_plane_tile(xi_val, carry, ybuf_i, 1, m, decay,
                                    af, lane0, cb, n_t, t, a=a)
    carry[:, 0:1] = xr_l
    carry[:, 1:2] = xi_l
    carry[:, 2:3] = yr_l
    carry[:, 3:4] = yi_l
    stout_ref[...] = carry[...]

    if with_iq:
        # SDR# correction I' = (1+g)I, Q' = Q + phi*I (iq_correct.c:307)
        gf = iqf_ref[:, 0:1]
        phi = iqf_ref[:, 1:2]
        yr, yi = yr * (1.0 + gf), yi + phi * yr
    if dtheta:
        yr, yi = _nco_mix(ph_ref, i, cb, cell, dtheta, yr, yi,
                          tab_ref=tab_ref)
    outr_ref[...] = yr
    outi_ref[...] = yi


def _dc_consts(a: float, t: int):
    """(M^T, decay) constants for the two-level DC recurrence:
    M[i,j] = a^(i-j) lower-triangular (passed transposed so
    y_local = b @ M^T), decay = a^1..a^t row vector."""
    i_idx = np.arange(t)
    e = i_idx[:, None] - i_idx[None, :]
    m = np.where(e >= 0, np.float64(a) ** np.maximum(e, 0), 0.0)
    m_t = np.ascontiguousarray(m.T.astype(np.float32))
    d_vec = (np.float64(a) ** np.arange(1, t + 1)).astype(np.float32)[None, :]
    return m_t, d_vec


def dc_geometry(ch: int, n: int):
    """Static geometry gate for dc_block_apply: (cb, cell) or None.

    Exposed so callers (the sharded fused-pre path) can decide the
    fallback BEFORE tracing anything shard-dependent — a
    traced-but-unused axis_index is enough to make the axon backend
    reject the whole compiled program."""
    t = 128
    if n % t:
        return None
    cb = 8 if ch % 8 == 0 else ch
    # cell: lane-aligned divisor of n, sized to the VMEM budget and capped
    # so the (static) subtile unroll stays small
    max_cell = min(max(t, _VMEM_BUDGET // (6 * 4 * cb)), 32 * t)
    for d in range(max_cell, t - 1, -1):
        if n % d == 0 and d % t == 0:
            return cb, d
    return None


def dc_block_apply(xr: jnp.ndarray, xi: jnp.ndarray, state: jnp.ndarray,
                   alpha: float, iq_factors=None, phase_acc=None,
                   dtheta: int = 0, interpret: bool = False,
                   wire_i32: jnp.ndarray | None = None,
                   wire_norm: float = 0.0, wire_gain: float = 1.0,
                   wire_kind: str = "cs16"):
    """Planar DC blocker with optional fused I/Q apply + NCO mix.

    x*: (C, N); state: (C, 4) f32 rows [xr_prev, xi_prev, yr_prev,
    yi_prev]; iq_factors: (C, 2) f32 [gain, phase] or None; phase_acc:
    (C, 1) uint32 (required when dtheta != 0).  With ``wire_i32`` (and
    wire_norm/wire_gain), the input is instead the packed wire from
    convert.wire_pack — int32 cs16 (I low half, Q high) or, with
    ``wire_kind`` "cu8"/"cs8", int16 byte pairs — and format conversion
    happens in-register; xr/xi may then be None.  Returns (yr, yi,
    new_state).  Returns None when the geometry cannot lower (caller
    falls back)."""
    ch, n = (wire_i32 if wire_i32 is not None else xr).shape
    a = float(1.0 - alpha)
    t = 128
    geo = dc_geometry(ch, n)
    if geo is None:
        return None
    cb, cell = geo

    m_t, d_vec = _dc_consts(a, t)

    with_iq = iq_factors is not None
    dtheta = int(dtheta) & 0xFFFFFFFF
    nco_tab = bool(dtheta) and _NCO_TABLES
    grid = (ch // cb, n // cell)
    kern = functools.partial(_dc_kernel, cb=cb, cell=cell, t=t, a=a,
                             with_iq=with_iq, dtheta=dtheta,
                             nco_tab=nco_tab,
                             wire_norm=(float(wire_norm)
                                        if wire_i32 is not None else 0.0),
                             wire_gain=float(wire_gain),
                             wire_kind=wire_kind)
    x_spec = pl.BlockSpec((cb, cell), lambda c, i: (c, i),
                          memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((cb, 4), lambda c, i: (c, 0),
                           memory_space=pltpu.VMEM)
    if wire_i32 is not None:
        x_in = [wire_i32]
        x_in_specs = [x_spec]
    else:
        x_in = [xr, xi]
        x_in_specs = [x_spec, x_spec]
    extra_in = []
    extra_specs = []
    if with_iq:
        extra_in.append(iq_factors)
        extra_specs.append(pl.BlockSpec((cb, 2), lambda c, i: (c, 0),
                                        memory_space=pltpu.VMEM))
    if dtheta:
        extra_in.append(phase_acc)
        extra_specs.append(pl.BlockSpec((cb, 1), lambda c, i: (c, 0),
                                        memory_space=pltpu.VMEM))
        if nco_tab:
            extra_in.append(jnp.asarray(_nco_lane_table(dtheta, cell)))
            extra_specs.append(pl.BlockSpec((8, cell), lambda c, i: (0, 0),
                                            memory_space=pltpu.VMEM))
    yr, yi, st = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[*x_in_specs, st_spec,
                  pl.BlockSpec((t, t), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, t), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  *extra_specs],
        out_specs=(x_spec, x_spec, st_spec),
        out_shape=(jax.ShapeDtypeStruct((ch, n), jnp.float32),
                   jax.ShapeDtypeStruct((ch, n), jnp.float32),
                   jax.ShapeDtypeStruct((ch, 4), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((cb, 4), jnp.float32),
                        pltpu.VMEM((cb, cell), jnp.float32),
                        pltpu.VMEM((cb, cell), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * t * ch,
            transcendentals=(2 * n * ch if dtheta else 0),
            bytes_accessed=4 * 4 * ch * n),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*x_in, state, jnp.asarray(m_t), jnp.asarray(d_vec), *extra_in)
    return yr, yi, st


# --------------------- overlap-save FFT filter kernel -------------------------
# ifft(fft(window) * H) per 2b-window, entirely in VMEM: the XLA path
# materializes ~8 full-size intermediates in HBM around the four-step
# matmuls (measured 22 ms for config #4's 2175-tap notch); here each
# window is read once, transformed (four-step with n1 = 128 MXU-sized
# factors, H folded in, inverse), and only its valid (non-overlap) tail
# is written — the last b samples at half-window advance, or the last
# 3b/2 at 3/4-window advance (25% overlap) when taps-1 <= b/2.
# Derivation (forward kernel W = e^{-2pi i/N}, N = 2b = n1*n2,
# n = i1*n2 + i2, k = k1 + n1*k2):
#   A[k1,i2] = sum_i1 F1[k1,i1] v[i1,i2]         (as A^T = v^T @ F1)
#   A *= T1[i2,k1] = W^(i2 k1)
#   Z[k1,k2]  = sum_i2 A[k1,i2] F2[i2,k2]
#   Z *= H2[k1,k2] = H[k1 + n1 k2] / N           (1/N folded in)
#   B[k1,i2]  = sum_k2 Z[k1,k2] conj(F2)[k2,i2]
#   B *= conj(T1)^T[k1,i2]
#   y[i1,i2]  = sum_k1 conj(F1)[i1,k1] B[k1,i2]  (as y^T = B^T @ conj(F1))
# Output rows i1 >= (4-aq)*n1/4 are the emitted advance samples (aq =
# quarters advanced per window: 2 or 3).  Matmuls use planar Karatsuba
# (3 real products) with the 3-term bf16 scheme (~4e-5).

_N1 = 128


def _kara_mm(xr, xi, m6_ref):
    """(rows, k) planar @ complex constant, m6 = [Rr_hi, Rr_lo, Ri_hi,
    Ri_lo, Rs_hi, Rs_lo] stacked bf16 (6, k, n)."""
    def rmm(v, ah, al):
        vh = v.astype(jnp.bfloat16)
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (_DOT_BF16(vh, ah) + _DOT_BF16(vl, ah)
                + _DOT_BF16(vh, al))
    m1 = rmm(xr, m6_ref[0], m6_ref[1])
    m2 = rmm(xi, m6_ref[2], m6_ref[3])
    m3 = rmm(xr + xi, m6_ref[4], m6_ref[5])
    return m1 - m2, m3 - m1 - m2


def _cmul(ar, ai, cr, ci):
    return ar * cr - ai * ci, ar * ci + ai * cr


def _osfft_kernel(s0r, s1r, s2r, s3r, s0i, s1i, s2i, s3i,
                  f1, f2, f2c, f1c,
                  t1r, t1i, tcr, tci, h2r, h2i, out_r, out_i,
                  vr_s, vi_s, *, n2, cb, aq):
    q1 = _N1 // 4                  # i1 rows per quarter-window

    def mm3(xr, xi, m6):
        """batched (cb, rows, k) planar @ complex const (k, n)."""
        rows = xr.shape[1]
        yr, yi = _kara_mm(xr.reshape(cb * rows, xr.shape[2]),
                          xi.reshape(cb * rows, xi.shape[2]), m6)
        return (yr.reshape(cb, rows, yr.shape[-1]),
                yi.reshape(cb, rows, yi.shape[-1]))

    sw = lambda a: jnp.swapaxes(a, -1, -2)
    # assemble (cb, n1, n2) windows from the four quarter-wide segments
    # via scratch stores (wide lane concats miscompile in Mosaic)
    for q, (sr, si) in enumerate(((s0r, s0i), (s1r, s1i),
                                  (s2r, s2i), (s3r, s3i))):
        vr_s[:, q * q1:(q + 1) * q1, :] = sr[...].reshape(cb, q1, n2)
        vi_s[:, q * q1:(q + 1) * q1, :] = si[...].reshape(cb, q1, n2)
    # forward: A^T = v^T @ F1, twiddle in (i2, k1) layout
    atr, ati = mm3(sw(vr_s[...]), sw(vi_s[...]), f1)
    atr, ati = _cmul(atr, ati, t1r[...], t1i[...])
    zr, zi = mm3(sw(atr), sw(ati), f2)
    zr, zi = _cmul(zr, zi, h2r[...], h2i[...])
    # inverse
    br, bi = mm3(zr, zi, f2c)
    br, bi = _cmul(br, bi, tcr[...], tci[...])
    ytr, yti = mm3(sw(br), sw(bi), f1c)
    # yt is (cb, i2, i1); the window advances aq quarters per grid step,
    # so the valid (non-overlap) output rows are i1 >= (4-aq)*n1/4
    lo = (4 - aq) * q1
    yr = sw(ytr)[:, lo:, :]
    yi = sw(yti)[:, lo:, :]
    out_r[...] = yr.reshape(cb, aq * q1 * n2)
    out_i[...] = yi.reshape(cb, aq * q1 * n2)


def _pack_complex(m: np.ndarray) -> np.ndarray:
    """complex (k, n) -> stacked (6, k, n) bf16 [Rr, Ri, Rr+Ri] hi/lo."""
    r = np.real(m).astype(np.float32)
    i = np.imag(m).astype(np.float32)
    return np.concatenate([_split_np(r), _split_np(i), _split_np(r + i)])


@functools.lru_cache(maxsize=8)
def _osfft_consts(nfft: int, h_key) -> tuple | None:
    n1 = _N1
    # n2 < 128 makes the kernel's (cb, rows, n2) reshapes' minor dim
    # sub-lane-width: Mosaic rejects the shape cast ("unsupported shape
    # cast", measured at nfft 8192) — fall back to the XLA engine
    if nfft % n1 or nfft // n1 > 256 or nfft // n1 < 128:
        return None
    n2 = nfft // n1
    if n2 & (n2 - 1):
        return None
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    w2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    t1 = np.exp(-2j * np.pi
                * np.outer(np.arange(n2), np.arange(n1)) / nfft)  # (i2, k1)
    h = np.asarray(h_key, np.complex64)
    h2 = (h.reshape(n2, n1).T / nfft).astype(np.complex64)        # (k1, k2)
    return (n2,
            _pack_complex(w1), _pack_complex(w2),
            _pack_complex(np.conj(w2)), _pack_complex(np.conj(w1)),
            np.real(t1).astype(np.float32), np.imag(t1).astype(np.float32),
            np.real(np.conj(t1).T).astype(np.float32),
            np.imag(np.conj(t1).T).astype(np.float32),
            np.real(h2).astype(np.float32), np.imag(h2).astype(np.float32))


def osfft_apply(ext_r: jnp.ndarray, ext_i: jnp.ndarray, h: tuple,
                block: int, advance: int | None = None,
                interpret: bool = False):
    """Full-window overlap-save pass: ext (C, n_full + b) planar (state ++
    samples) -> (C, n_full) filtered planar, or None if the geometry
    cannot lower.  ``h`` is the frequency response as a hashable tuple.

    ``advance`` is the window stride in samples: b (classic 50%-overlap,
    the default) or 3b/2 (25%-overlap, valid when taps-1 <= b/2 — which
    the choose_fft_block doubling rule guarantees for auto-sized
    filters).  3b/2 runs 33% fewer windows for the same output.
    n_full must be a multiple of ``advance``.
    """
    consts = _osfft_consts(2 * block, h)
    if consts is None:
        return None
    (n2, f1, f2, f2c, f1c, t1r, t1i, tcr, tci, h2r, h2i) = consts
    advance = block if advance is None else advance
    g = block // 2                       # quarter-window width
    aq = advance // g                    # quarters advanced per window
    if advance not in (2 * g, 3 * g) or aq * g != advance:
        return None
    ch, total = ext_r.shape
    n_full = total - block
    if n_full <= 0 or n_full % advance:
        return None
    cb = 8 if ch % 8 == 0 else ch
    nw = n_full // advance
    grid = (ch // cb, nw)
    # Each window is assembled from four quarter-wide segments.  Window w
    # must END at x[(w+1)*advance - 1] so its last ``advance`` outputs are
    # x[w*advance : (w+1)*advance]; with ext = state(b) ++ x that puts
    # quarter q of window w at ext element g*(aq*w + q + aq - 2).  Each
    # quarter is fed from a shifted VIEW of the extension at offset
    # (q + aq - 2)*g with a stride-aq index map, keeping the map a plain
    # scale (constant offsets in the index_map trip a closed_call
    # lowering KeyError in this jax version; views sidestep it).
    views = [(ext_r[:, (q + aq - 2) * g:], ext_i[:, (q + aq - 2) * g:])
             for q in range(4)]
    seg = pl.BlockSpec((cb, g), lambda c, w, aq=aq: (c, aq * w),
                       memory_space=pltpu.VMEM)

    def cmat(m):
        return pl.BlockSpec(m.shape, lambda c, w: (0,) * m.ndim,
                            memory_space=pltpu.VMEM)

    mats = [jnp.asarray(m) for m in
            (f1, f2, f2c, f1c, t1r, t1i, tcr, tci, h2r, h2i)]
    out_spec = pl.BlockSpec((cb, advance), lambda c, w: (c, w),
                            memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_osfft_kernel, n2=n2, cb=cb, aq=aq),
        grid=grid,
        in_specs=[seg] * 8 + [cmat(m) for m in mats],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((ch, n_full), jnp.float32),
                   jax.ShapeDtypeStruct((ch, n_full), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((cb, _N1, n2), jnp.float32),
                        pltpu.VMEM((cb, _N1, n2), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=ch * nw * 9 * 4 * 2 * _N1 * _N1 * n2,
            bytes_accessed=ch * (total + n_full) * 8,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*[v[0] for v in views], *[v[1] for v in views], *mats)
    return yr, yi


# --------------------------- fused post-stage kernel ---------------------------

# Host-precomputed NCO lane tables, read at TRACE time: the per-lane
# angle b = lane * dtheta is STATIC (dtheta and the lane iota are
# compile-time), so its cos/sin rows can be computed on the host and
# passed as one padded (8, width) VMEM constant — the in-kernel transcendental
# count drops from 2*(width + cb) to 2*cb per tile.  The extra HBM read
# is 8*width bytes per channel-block per tile (~1 B/sample at cb=8),
# a fraction of the ~30 B/sample wire budget.
_NCO_TABLES = os.environ.get("IQ_NCO_TABLES", "1") == "1"


def set_nco_tables(enabled: bool) -> None:
    """Trace-time switch for the host-precomputed NCO lane tables
    (rebuild chains after switching); tools/mm_ab.py A/Bs it."""
    global _NCO_TABLES
    _NCO_TABLES = bool(enabled)


def _nco_lane_table(dtheta: int, width: int) -> np.ndarray:
    """(8, width) f32 with [cos; sin] in rows 0-1 (rows 2-7 zero pad) of
    the wrapped per-lane NCO angle, matching the in-kernel int32
    wrap-to-angle map (see _nco_mix_base); cos/sin evaluated in f64
    (strictly tighter than the in-kernel f32).  Padded to 8 sublanes:
    a (2, width) VMEM block is sub-native tiling and measured to blow
    Mosaic's compile time up ~4x (148 -> 535 s on the folded C=1
    flagship, round 5) — the 8-row pad restores native (8, 128) tiles
    for 6 * width * 4 bytes of dead VMEM."""
    dth = np.int64(dtheta) - (1 << 32) if dtheta >= (1 << 31) else np.int64(dtheta)
    wrapped = ((np.arange(width, dtype=np.int64) * dth) & 0xFFFFFFFF)
    signed = np.where(wrapped >= (1 << 31), wrapped - (1 << 32), wrapped)
    ang = signed.astype(np.float32).astype(np.float64) * (2.0 * np.pi / 4294967296.0)
    out = np.zeros((8, width), np.float32)
    out[0] = np.cos(ang)
    out[1] = np.sin(ang)
    return out


def _nco_mix_base(ph_ref, base, cb, width, dtheta, yr, yi, tab_ref=None):
    """In-kernel NCO mix at global sample index base + lane (shared by
    _dc_kernel, _post_kernel, and the banded wire decode): wrapping int32
    arithmetic == uint32 mod 2^32, and the SIGNED value maps to the same
    angle mod 2pi (Mosaic cannot cast uint32 -> f32).

    The rotation is computed by angle addition, cos(a+b) =
    cos(a)cos(b) - sin(a)sin(b): ``a`` is the per-channel tile base
    phase ((cb, 1) — 2*cb transcendentals) and ``b`` the per-lane
    increment ((1, width) — 2*width), so the transcendental count drops
    ~cb-fold vs the naive 2*cb*width.  Wrapping int32 phase components
    each map to the same angle mod 2pi, so the split is exact in real
    math; the f32 product error (~2 ulp) sits far below the chain's
    quantization scale (the XLA path casts the summed phase instead —
    both are within the existing fused/XLA ±1-code contract)."""
    dth_i32 = jnp.int32(np.int64(dtheta) - (1 << 32)
                        if dtheta >= (1 << 31) else dtheta)
    scale = jnp.float32(2.0 * np.pi / 4294967296.0)
    if tab_ref is not None:
        cos_b = tab_ref[0:1, :]                            # (1, width)
        sin_b = tab_ref[1:2, :]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        b_ang = (lane * dth_i32).astype(jnp.float32) * scale
        cos_b, sin_b = jnp.cos(b_ang), jnp.sin(b_ang)      # (1, width)
    ph0 = pltpu.bitcast(ph_ref[...], jnp.int32)            # (cb, 1)
    a_ang = (ph0 + base * dth_i32).astype(jnp.float32) * scale
    cos_a, sin_a = jnp.cos(a_ang), jnp.sin(a_ang)          # (cb, 1)
    c_ = cos_a * cos_b - sin_a * sin_b
    s_ = sin_a * cos_b + cos_a * sin_b
    return yr * c_ - yi * s_, yr * s_ + yi * c_


def _nco_mix(ph_ref, block_idx, cb, cell, dtheta, yr, yi, tab_ref=None):
    return _nco_mix_base(ph_ref, jnp.int32(block_idx) * jnp.int32(cell),
                         cb, cell, dtheta, yr, yi, tab_ref=tab_ref)


def _post_kernel(xr_ref, xi_ref, g_ref, *rest, cb, cell, seg_m, dtheta,
                 out_fmt, nco_tab=False):
    """Post-NCO + AGC gain apply + quantize/interleave over one
    (cb, cell) tile: replaces three separate XLA passes over the output-
    rate planes (mix, gain multiply, convert) with ONE HBM round trip.

    Output is the packed interleaved wire (_pack_wire: I code low,
    Q high — bit-identical to the little-endian wire after the caller's
    bitcast; post_processor.c:38-68 + sample_convert.c contract; the
    quantizer constants come from the format table, so the fused and
    XLA quantizers cannot drift apart)."""
    rest = list(rest)
    ph_ref = rest.pop(0) if dtheta else None
    tab_ref = rest.pop(0) if (dtheta and nco_tab) else None
    out_ref = rest[-1]
    i = pl.program_id(1)
    yr = xr_ref[...]
    yi = xi_ref[...]
    if dtheta:
        yr, yi = _nco_mix(ph_ref, i, cb, cell, dtheta, yr, yi,
                          tab_ref=tab_ref)
    if seg_m:
        # per-128-sample segment gains: expand (cb, seg_m) across lanes
        # (the host laid gains out (grid_i, C, seg_m) so this block's last
        # two dims match the array — Mosaic's lane/sublane block rule)
        g3 = g_ref[0][:, :, None]                        # (cb, seg_m, 1)
        yr = (yr.reshape(cb, seg_m, _LANES) * g3).reshape(cb, cell)
        yi = (yi.reshape(cb, seg_m, _LANES) * g3).reshape(cb, cell)
    else:
        g = g_ref[:, 0:1]
        yr = yr * g
        yi = yi * g

    out_ref[...] = _pack_wire(yr, yi, out_fmt)


def post_apply(xr: jnp.ndarray, xi: jnp.ndarray, gains: jnp.ndarray,
               seg: int, phase_acc=None, dtheta: int = 0,
               interpret: bool = False, out_fmt: str = "cs16"):
    """Fused post stage for a packable output format (_PACK_INFO).

    x*: (C, N) f32 planes (post-filter); gains: (C, N//seg) f32 per-
    segment AGC gains (seg == 128) or (C, 1) (seg == 0: one gain — the
    digital profile / no AGC); phase_acc: (C, 1) uint32 when dtheta != 0.
    Ragged N is handled by Pallas block masking; the gains array is
    padded with its last column so the ragged tail uses the final scan
    gain (the sequential chain's tail semantics, ops/agc.py).

    Returns (C, N) packed wire (int32 for 16-bit wires, int16 for
    8-bit — convert.packed_to_wire recovers the byte stream) or None
    when the geometry cannot lower or the format has no packed form."""
    ch, n = xr.shape
    t = _LANES
    if n < t or seg not in (0, t) or out_fmt not in _PACK_INFO:
        return None
    cb = 8 if ch % 8 == 0 else ch
    cell = min(32 * t, t * ((n + t - 1) // t))
    seg_m = cell // t if seg else 0
    grid = (ch // cb, -(-n // cell))
    if seg:
        # Lay the gains out (grid_i, C, seg_m): Mosaic requires a block's
        # last two dims be (mult-of-8 | ==array, mult-of-128 | ==array),
        # and a (cb, seg_m) block of a (C, n//128) array violates the lane
        # rule (seg_m == cell/128 < 128).  The 3-D layout makes the block's
        # trailing dims exactly match the array's; the transpose is an XLA
        # op on a tiny (C, n/128) array.
        have = gains.shape[-1]
        need = grid[1] * seg_m
        if have < need:
            gains = jnp.concatenate(
                [gains, jnp.repeat(gains[:, -1:], need - have, axis=-1)],
                axis=-1)
        gains = gains[:, :need].reshape(ch, grid[1], seg_m).transpose(1, 0, 2)
    x_spec = pl.BlockSpec((cb, cell), lambda c, i: (c, i),
                          memory_space=pltpu.VMEM)
    g_spec = (pl.BlockSpec((1, cb, seg_m), lambda c, i: (i, c, 0),
                           memory_space=pltpu.VMEM) if seg
              else pl.BlockSpec((cb, 1), lambda c, i: (c, 0),
                                memory_space=pltpu.VMEM))
    in_specs = [x_spec, x_spec, g_spec]
    args = [xr, xi, gains]
    dtheta = int(dtheta) & 0xFFFFFFFF
    nco_tab = bool(dtheta) and _NCO_TABLES
    if dtheta:
        if phase_acc is None:
            return None
        in_specs.append(pl.BlockSpec((cb, 1), lambda c, i: (c, 0),
                                     memory_space=pltpu.VMEM))
        args.append(phase_acc)
        if nco_tab:
            in_specs.append(pl.BlockSpec((8, cell), lambda c, i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(jnp.asarray(_nco_lane_table(dtheta, cell)))
    out_spec = pl.BlockSpec((cb, cell), lambda c, i: (c, i),
                            memory_space=pltpu.VMEM)
    # No try/except: pallas_call here only TRACES under the callers' jit
    # (Mosaic compiles later), so catching could never deliver a lowering
    # fallback — it would only swallow real trace-time bugs.  If hardware
    # rejects this kernel, the operational fallback is the
    # IQTOOL_DISABLE_POST_KERNEL env gate in the chain (or the global
    # banded.set_kernels_enabled kill-switch).
    return pl.pallas_call(
        functools.partial(_post_kernel, cb=cb, cell=cell, seg_m=seg_m,
                          dtheta=dtheta, out_fmt=out_fmt, nco_tab=nco_tab),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((ch, n), pack_wire_dtype(out_fmt)),
        cost_estimate=pl.CostEstimate(
            flops=10 * ch * n,
            transcendentals=(0 if not dtheta
                             else 2 * ch * (-(-n // cell)) if nco_tab
                             else 2 * ch * n),
            bytes_accessed=4 * ch * n * 3),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*args)
