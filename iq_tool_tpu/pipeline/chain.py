"""The compiled DSP chain: one jitted step for the whole signal path.

Reference mapping (pre_processor.c:10-55, pipeline.c:492-537,
post_processor.c:9-70):

    convert -> dc_block -> iq_correct -> pre-NCO -> pre-filter
            -> resample -> post-filter -> post-NCO -> AGC -> convert

The reference runs these as 3 threads passing 16384-frame chunks through
queues; here the whole chain is ONE XLA program over a fixed-shape
``(channels, block)`` array, so every elementwise stage fuses and the
"queues" disappear into the compiler's dataflow.  All sequential stream
state lives in an explicit carry pytree (SampleChunk ping-pong buffers ->
SSA values; liquid object state -> carry leaves).

Stream discontinuities (pipeline.c:458-464/503-509/565-571) are a scalar
``reset`` flag input: when set, stateful stages are re-initialized inside
the same compiled step (I/Q factors are kept, matching iq_correct's
persistent learned state; NCO keeps frequency, zeroes phase).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from iq_tool_tpu import constants as C
from iq_tool_tpu.formats import get_format
from iq_tool_tpu.ops import agc as agc_ops
from iq_tool_tpu.ops import banded, convert, dc_block, iq_balance, nco
from iq_tool_tpu.ops.filters import StreamingFilter
from iq_tool_tpu.ops.fir_design import FilterRequest, design_chain, max_filter_freq_hz
from iq_tool_tpu.ops.resample import Resampler, _MatmulStage


# Tests run the fused pre/post-stage Pallas kernels in interpret mode on
# CPU (real-Mosaic coverage is tools/tpu_smoke.py's job).
_FUSED_PRE_INTERPRET = False
_FUSED_POST_INTERPRET = False


@dataclasses.dataclass(frozen=True)
class ChainConfig:
    """User intent for one stream (the AppConfig analog, app_context.h:66-138)."""
    input_format: str
    output_format: str
    input_rate: float
    target_rate: float | None = None          # None -> no resample
    channels: int = 1
    gain: float = 1.0
    dc_block: bool = False
    iq_correction: bool = False
    freq_shift_pre_hz: float = 0.0
    freq_shift_post_hz: float = 0.0
    filters: Sequence[FilterRequest] = ()
    filter_stage: str = "auto"                # auto | pre | post (filter.c:43-92)
    filter_method: str = "auto"               # auto | fir | fft
    filter_fft_size: int | None = None
    filter_taps: int | None = None
    filter_transition_hz: float | None = None
    filter_attenuation_db: float = C.RESAMPLER_ATTENUATION_DB
    agc_profile: str | None = None            # dx | local | digital
    agc_target: float | None = None
    target_block: int = C.DEFAULT_BLOCK_SIZE
    resampler_semilength: int = C.RESAMP_SEMILENGTH
    fuse_filters: bool = True              # fold direct FIRs into resampler stages

    @property
    def resampling(self) -> bool:
        return (self.target_rate is not None
                and abs(self.target_rate - self.input_rate) > 1e-9)

    @property
    def output_rate(self) -> float:
        return self.target_rate if self.resampling else self.input_rate


def _osfft_engages() -> bool:
    """True when the fused overlap-save Pallas kernel can actually run
    (TPU backend, or tests forcing interpret mode)."""
    from iq_tool_tpu.ops import banded, filters
    return banded._on_tpu() or filters._OSFFT_INTERPRET


def _decide_filter_stage(cfg: ChainConfig) -> str:
    """filter.c:43-92: post-resample iff downsampling and the chain fits
    under the output Nyquist; error if it doesn't fit under input Nyquist."""
    if not cfg.filters:
        return "none"
    if cfg.filter_stage in ("pre", "post"):
        return cfg.filter_stage
    if not cfg.resampling:
        return "pre"
    in_rate, out_rate = cfg.input_rate, cfg.target_rate
    mx = max_filter_freq_hz(list(cfg.filters))
    if mx > in_rate / 2.0:
        raise ValueError(
            f"filter chain extends to {mx:.0f} Hz, above the input Nyquist "
            f"{in_rate / 2:.0f} Hz")
    if out_rate < in_rate:
        if mx > out_rate / 2.0:
            raise ValueError(
                f"filter chain extends to {mx:.0f} Hz, but the output rate "
                f"{out_rate:.0f} Hz supports only {out_rate / 2:.0f} Hz "
                "(filter.c:80-86)")
        return "post"
    return "pre"


class Chain:
    """Built, executable chain.  Immutable after construction; the jitted
    step closes over static plans only."""

    def __init__(self, cfg: ChainConfig):
        self.cfg = cfg
        self.fmt_in = get_format(cfg.input_format)
        self.fmt_out = get_format(cfg.output_format)

        stage = _decide_filter_stage(cfg)
        design_rate = cfg.output_rate if stage == "post" else cfg.input_rate
        designed = design_chain(list(cfg.filters), design_rate,
                                cfg.filter_attenuation_db, cfg.filter_taps,
                                cfg.filter_transition_hz) if cfg.filters else None
        self.filter_stage = stage
        self.designed_filter = designed

        filt = None
        if designed is not None:
            filt = StreamingFilter(designed.taps, cfg.filter_method,
                                   cfg.filter_fft_size)
        self.pre_filter = filt if stage == "pre" else None
        self.post_filter = filt if stage == "post" else None
        # any filter riding the FFT overlap-save path (vs banded MXU)?
        # consulted by the wire-input gate in _fused_pre
        self._has_fft_filter = filt is not None and not filt._exec_banded

        # --- block geometry: resampler framing + filter block constraints ---
        tb = cfg.target_block
        for _ in range(10):
            rs = (Resampler(cfg.target_rate / cfg.input_rate, tb,
                            cfg.filter_attenuation_db, cfg.resampler_semilength)
                  if cfg.resampling else None)
            n_in = rs.plan.n_in if rs else tb
            n_out = rs.plan.n_out if rs else tb
            hard, soft = [], []
            for filt, n in ((self.pre_filter, n_in),
                            (self.post_filter, n_out)):
                if filt is not None and filt.method == "fft":
                    hard.append(n >= filt.block)
                    adv = filt.osfft_advance
                    if (not filt._exec_banded and adv > filt.block
                            and _osfft_engages()):
                        # amortize the fused overlap-save kernel: grow
                        # until >= 4 full 3/4-advance windows fit per
                        # step, so its 33%-fewer-windows win engages at
                        # CLI framing too (the reference sizes FFT
                        # blocks freely, filter.c:317-336) — but only up
                        # to OSFFT_FRAME_CAP, never as a hard failure.
                        # TPU/interpret only: off-TPU the kernel never
                        # runs, so growing would cost 8x block memory
                        # and latency for nothing
                        soft.append(n >= 4 * adv)
            if rs is not None and banded._on_tpu():
                # kernel coverage as a soft grow-the-block constraint:
                # small blocks can regroup a stage to a non-lane-aligned
                # stride (16384 -> stage 27/32 at stride 224), which the
                # Mosaic kernel cannot lower ("unsupported shape cast")
                # — the XLA fallback is correct but several times
                # slower, so grow until every stage's kernel engages
                # (or the frame cap is reached; never a hard failure)
                soft.append(rs.kernel_coverage(cfg.channels))
            if all(hard) and (all(soft) or tb >= C.OSFFT_FRAME_CAP):
                break
            tb *= 2
        else:
            if not all(hard):
                raise ValueError(
                    "could not find a block size fitting the filter")
        self.resampler = rs
        self.n_in = n_in
        self.n_out = n_out

        # Design-time operator fusion: a direct-FIR user filter adjacent
        # to a matmul resampler stage is LTI, so it folds into that
        # stage's banded matrix — one fewer device pass and one fewer
        # halo exchange per step, at identical (composed) numerics.
        if (cfg.fuse_filters and rs is not None and rs.stages
                and isinstance(rs.stages[0], _MatmulStage)
                and self.pre_filter is not None
                and self.pre_filter.method == "fir"
                and self.pre_filter.num_taps <= C.FUSE_MAX_TAPS):
            rs.stages[0].compose_input_fir(
                np.asarray(self.pre_filter.taps, np.complex128))
            self.pre_filter = None
        if (cfg.fuse_filters and rs is not None and rs.stages
                and isinstance(rs.stages[-1], _MatmulStage)
                and self.post_filter is not None
                and self.post_filter.method == "fir"
                and self.post_filter.num_taps <= C.FUSE_MAX_TAPS):
            rs.stages[-1].compose_output_fir(
                np.asarray(self.post_filter.taps, np.complex128))
            self.post_filter = None

        self.dc_alpha = dc_block.alpha_for_rate(cfg.input_rate)
        self.dtheta_pre = nco.freq_to_dtheta(cfg.freq_shift_pre_hz, cfg.input_rate)
        self.dtheta_post = nco.freq_to_dtheta(cfg.freq_shift_post_hz,
                                              cfg.output_rate)
        for shift, rate, name in ((cfg.freq_shift_pre_hz, cfg.input_rate, "pre"),
                                  (cfg.freq_shift_post_hz, cfg.output_rate, "post")):
            if abs(shift) > C.FREQ_SHIFT_SANITY_FACTOR * rate:
                raise ValueError(
                    f"{name} frequency shift {shift:.0f} Hz exceeds "
                    f"{C.FREQ_SHIFT_SANITY_FACTOR}x the rate (constants.h:247)")

        self.agc_cfg = (agc_ops.AgcConfig.make(cfg.agc_profile, cfg.output_rate,
                                               cfg.agc_target)
                        if cfg.agc_profile else None)
        self.iq_interval = int(C.IQ_UPDATE_INTERVAL_SEC * cfg.input_rate)

        self.in_wire_len = self.n_in * self.fmt_in.items_per_frame
        self.out_wire_len = self.n_out * self.fmt_out.items_per_frame
        self.in_wire_dtype = convert.wire_dtype(self.fmt_in)
        self.out_wire_dtype = convert.wire_dtype(self.fmt_out)

        self._jitted = None

    # ------------------------------ carry ------------------------------------

    def init_carry(self, channels: int | None = None) -> dict:
        """Build the initial carry ON DEVICE via jit: eager creation of
        complex64 arrays is unimplemented on some PJRT backends (axon), and
        the carry never needs to visit the host."""
        ch = channels or self.cfg.channels
        return jax.jit(functools.partial(self._build_carry, ch))()

    def _build_carry(self, ch: int) -> dict:
        """Carry leaves are PLANAR float32 (real/imag pairs): the whole
        step works on plane arrays — complex64 decomposes to plane math
        under XLA anyway, planar skips the re/im extraction round trips,
        and Pallas kernels have no complex dtype."""
        carry = {"nco_pre": nco.init(ch), "nco_post": nco.init(ch)}
        if self.cfg.dc_block:
            carry["dc"] = dc_block.init_planar(ch)
        if self.cfg.iq_correction:
            carry["iq"] = iq_balance.init(ch)
        if self.pre_filter:
            carry["pre_f"] = self.pre_filter.init_planar(ch)
        if self.resampler:
            carry["rs"] = self.resampler.init_planar(ch)
        if self.post_filter:
            carry["post_f"] = self.post_filter.init_planar(ch)
        if self.agc_cfg:
            carry["agc"] = agc_ops.init(ch)
        return carry

    def _reset_carry(self, carry: dict) -> dict:
        """Discontinuity semantics: reset sample memory, keep learned state."""
        out = dict(carry)
        out["nco_pre"] = nco.reset(carry["nco_pre"])
        out["nco_post"] = nco.reset(carry["nco_post"])
        for key in ("dc", "pre_f", "rs", "post_f"):
            if key in carry:
                out[key] = jax.tree_util.tree_map(jnp.zeros_like, carry[key])
        if "agc" in carry:
            out["agc"] = agc_ops.reset(carry["agc"])
        # "iq": kept (learned factors persist across discontinuities)
        return out

    # ------------------------------ step --------------------------------------

    def _fused_pre(self, raw, carry: dict, new: dict):
        """Format convert (cs16/cu8/cs8: in-register from the packed
        wire) + DC block + I/Q apply + pre-NCO as ONE Pallas pass on TPU.
        Returns (xr, xi) or None when the kernel is unavailable (CPU,
        odd geometry) — the caller then converts and falls back to the
        separate ops.  The I/Q estimator taps the DC'd pre-apply signal,
        so its IQ_FFT_SIZE-sample window is recomputed in XLA from a
        converted PREFIX slice (same recurrence, negligible cost)."""
        from iq_tool_tpu.ops import banded, pallas_kernels
        cfg = self.cfg
        if not (banded._on_tpu() or _FUSED_PRE_INTERPRET):
            return None
        c = raw.shape[0]
        items = self.fmt_in.items_per_frame
        n = raw.shape[-1] // items
        # packed int32 view of the interleaved wire: the kernel
        # de-interleaves and normalizes in-register, so the separate
        # conversion pass never touches HBM (None for non-cs16 formats
        # or under the operational kill-switch).  Exception, measured on
        # v5e: with BOTH iq_correction and an FFT-path filter in the
        # chain, the wire-input form flips XLA's latency-hiding
        # scheduler into a pathological ordering (temp arena 9.6 GB vs
        # 1.0 GB, config #4 1158 vs 1836 Msps) even though the op graph
        # is near-identical — the planar form is faster there.
        skip_wire = (os.environ.get("IQTOOL_DISABLE_WIRE_INPUT")
                     or (cfg.iq_correction and self._has_fft_filter))
        packed = None if skip_wire else convert.wire_pack(raw, self.fmt_in)
        wire, kind = packed if packed is not None else (None, "cs16")
        xr = xi = None
        if wire is None:
            xr, xi = convert.to_planar(raw, self.fmt_in, cfg.gain)
        st = carry["dc"]
        iqf = None
        if cfg.iq_correction:
            m = min(n, C.IQ_FFT_SIZE)
            if wire is None:
                pr, pi_ = xr[:, :m], xi[:, :m]
            else:
                # decode the estimator segment from the WIRE view, not
                # from raw: a second consumer of raw makes XLA keep the
                # whole int16 input live across the step (measured: temp
                # arena 9.6 GB vs 1.0 GB, config #4 1158 vs 1836 Msps)
                pr, pi_ = convert.decode_packed(
                    wire[:, :m], kind, self.fmt_in.normalizer, cfg.gain)
            seg_r, _, _ = dc_block._apply_plane(
                pr, st.xr_prev, st.yr_prev, self.dc_alpha)
            seg_i, _, _ = dc_block._apply_plane(
                pi_, st.xi_prev, st.yi_prev, self.dc_alpha)
            new["iq"] = iq_balance.maybe_update_planar(
                seg_r, seg_i, carry["iq"], self.iq_interval,
                advance_samples=n)
            iqf = new["iq"].factors
        dth = int(self.dtheta_pre)
        pacc = carry["nco_pre"][:, None] if dth else None
        st4 = jnp.stack([st.xr_prev, st.xi_prev,
                         st.yr_prev, st.yi_prev], axis=-1)
        res = pallas_kernels.dc_block_apply(
            xr, xi, st4, self.dc_alpha, iqf, pacc, dth,
            interpret=_FUSED_PRE_INTERPRET, wire_i32=wire,
            wire_norm=self.fmt_in.normalizer, wire_gain=cfg.gain,
            wire_kind=kind)
        if res is None:
            if cfg.iq_correction:
                del new["iq"]     # recomputed by the fallback path
            return None
        yr, yi, st4n = res
        new["dc"] = dc_block.PlanarDcState(
            st4n[:, 0], st4n[:, 1], st4n[:, 2], st4n[:, 3])
        if dth:
            new["nco_pre"] = (carry["nco_pre"]
                              + jnp.uint32(n)
                              * jnp.uint32(dth))
        return yr, yi

    def _fused_post(self, xr, xi, carry: dict, new: dict):
        """Post-NCO + AGC apply + cs16 quantize/interleave as ONE Pallas
        pass (post_processor.c:38-68 order), replacing three XLA passes
        over the output-rate planes.  The AGC gain scan itself stays in
        XLA (tiny); block energies are rotation-invariant so they are
        measured pre-NCO.  Returns the wire array or None (caller runs
        the separate ops)."""
        from iq_tool_tpu.ops import banded, pallas_kernels
        if not pallas_kernels.packable_out(self.fmt_out.name):
            return None
        if os.environ.get("IQTOOL_DISABLE_POST_KERNEL"):
            return None            # operational kill-switch (see post_apply)
        if not (banded._on_tpu() or _FUSED_POST_INTERPRET):
            return None
        dth = int(self.dtheta_post)
        cfg_agc = self.agc_cfg
        if not dth and cfg_agc is None:
            return None            # only the convert would remain: no win
        c, n = xr.shape
        seg = 0
        new_agc = None
        if cfg_agc is not None and cfg_agc.profile != "digital":
            if agc_ops.rms_params(cfg_agc, n)[1] != C.AGC_SEGMENT:
                return None        # tiny blocks: odd segment width
            gains, seg, new_agc = agc_ops.rms_gains(xr, xi, carry["agc"],
                                                    cfg_agc)
        elif cfg_agc is not None:
            # NOTE the digital profile compares hard thresholds (clip,
            # strong); its peak is measured pre-NCO here (rotation-
            # invariant in exact math), so a block whose peak sits within
            # ~1 ulp of a threshold could decide differently from the
            # post-NCO XLA fallback — within the accepted cross-path
            # contract, but not the bounded +-1-code kind
            pk = jnp.sqrt(jnp.max(xr * xr + xi * xi, axis=-1))
            gain_out, new_agc = agc_ops.digital_update(carry["agc"], pk,
                                                       n, cfg_agc)
            gains = gain_out[:, None]
        else:
            gains = jnp.ones((c, 1), jnp.float32)
        pacc = carry["nco_post"][:, None] if dth else None
        res = pallas_kernels.post_apply(xr, xi, gains, seg, pacc, dth,
                                        interpret=_FUSED_POST_INTERPRET,
                                        out_fmt=self.fmt_out.name)
        if res is None:
            return None
        if new_agc is not None:
            new["agc"] = new_agc
        if dth:
            new["nco_post"] = (carry["nco_post"]
                               + jnp.uint32(n) * jnp.uint32(dth))
        return convert.packed_to_wire(res, self.fmt_out)

    def _fused_wire_resample(self, raw, carry: dict, new: dict):
        """Wire -> [DC] -> [NCO] -> resample -> packed wire with nothing
        else in the chain (BASELINE configs #1/#2 and, with dc_block,
        the flagship shape): stage 0 decodes the packed wire in-register
        — and with dc_block runs the DC recurrence in the same prologue
        (banded_apply_dc) — while the last stage quantizes back to the
        wire in its epilogue, so neither conversion pass nor the
        separate pre-stage touches HBM.  Returns the output wire or None
        (caller runs the normal path)."""
        from iq_tool_tpu.ops import banded
        cfg = self.cfg
        if (cfg.iq_correction
                or self.pre_filter is not None or self.resampler is None
                or self.post_filter is not None
                or int(self.dtheta_post) != 0 or self.agc_cfg is not None):
            return None
        if os.environ.get("IQTOOL_DISABLE_WIRE_INPUT"):
            return None
        if cfg.dc_block and os.environ.get("IQTOOL_DISABLE_DC_STAGE0"):
            return None             # kill-switch for the dc-fused stage 0
        # pack-out is independently killable: the wire-INPUT half still
        # runs, finishing with the plain convert
        from iq_tool_tpu.ops import pallas_kernels
        pack_ok = (not os.environ.get("IQTOOL_DISABLE_PACK_OUT")
                   and pallas_kernels.packable_out(self.fmt_out.name))
        if not (banded._on_tpu() or _FUSED_POST_INTERPRET):
            return None
        packed = convert.wire_pack(raw, self.fmt_in)
        if packed is None:
            return None
        wire, kind = packed
        stages = self.resampler.stages
        if not stages or not hasattr(stages[0], "stride"):
            return None
        st0 = stages[0]
        sr, si = carry["rs"][0]
        nb0 = wire.shape[-1] // st0.stride
        if pallas_kernels.plan(st0.stride, st0.hist, st0._a.shape[1],
                               nb0, wire.shape[0],
                               dc=cfg.dc_block) is None:
            return None
        pack0 = self.fmt_out.name if (pack_ok and len(stages) == 1) else None
        dth = int(self.dtheta_pre)
        pacc = carry["nco_pre"][:, None] if dth else None
        items = self.fmt_in.items_per_frame
        n_frames = wire.shape[-1]
        if cfg.dc_block:
            dc_st = carry["dc"]
            st4 = jnp.stack([dc_st.xr_prev, dc_st.xi_prev,
                             dc_st.yr_prev, dc_st.yi_prev], axis=-1)
            res, tr, ti, st4n = pallas_kernels.banded_apply_dc(
                sr, si, st4, self.dc_alpha, st0._a, st0._a_i,
                st0.stride, st0.hist, wire_i32=wire,
                wire_norm=self.fmt_in.normalizer, wire_gain=cfg.gain,
                nco_dtheta=dth, nco_phase=pacc, pack_fmt=pack0,
                interpret=_FUSED_POST_INTERPRET, wire_kind=kind)
            new["dc"] = dc_block.PlanarDcState(
                st4n[:, 0], st4n[:, 1], st4n[:, 2], st4n[:, 3])
            if dth:
                new["nco_pre"] = (carry["nco_pre"]
                                  + jnp.uint32(n_frames & 0xFFFFFFFF)
                                  * jnp.uint32(dth))
        else:
            res = pallas_kernels.banded_apply(
                sr, si, None, None, st0._a, st0._a_i, st0.stride,
                st0.hist, interpret=_FUSED_POST_INTERPRET,
                pack_fmt=pack0, wire_i32=wire,
                wire_norm=self.fmt_in.normalizer,
                wire_gain=cfg.gain, nco_dtheta=dth, nco_phase=pacc,
                wire_kind=kind)
            tr, ti = convert.to_planar(raw[:, -st0.hist * items:],
                                       self.fmt_in, cfg.gain)
            if dth:
                # the carried resampler history is the POST-shift
                # signal: rotate the stored tail at its global indices
                ph_tail = (carry["nco_pre"]
                           + jnp.uint32((n_frames - st0.hist) & 0xFFFFFFFF)
                           * jnp.uint32(dth))
                tr, ti, _ = nco.apply_planar(tr, ti, ph_tail,
                                             self.dtheta_pre)
                new["nco_pre"] = (carry["nco_pre"]
                                  + jnp.uint32(n_frames & 0xFFFFFFFF)
                                  * jnp.uint32(dth))
        new_rs = [(tr, ti)]
        if pack0:
            # single-stage cascade: wire in AND out in one kernel
            new["rs"] = tuple(new_rs)
            return convert.packed_to_wire(res, self.fmt_out)
        xr, xi = res
        for i, stage in enumerate(stages[1:], start=1):
            s_r, s_i = carry["rs"][i]
            if (pack_ok and i == len(stages) - 1
                    and hasattr(stage, "apply_planar_packed")):
                wire_out, nr, ni = stage.apply_planar_packed(
                    xr, xi, s_r, s_i, interpret=_FUSED_POST_INTERPRET,
                    out_fmt=self.fmt_out.name)
                if wire_out is not None:
                    new_rs.append((nr, ni))
                    new["rs"] = tuple(new_rs)
                    return convert.packed_to_wire(wire_out, self.fmt_out)
            xr, xi, nr, ni = stage.apply_planar(xr, xi, s_r, s_i)
            new_rs.append((nr, ni))
        # pack declined/killed: finish with the plain convert
        new["rs"] = tuple(new_rs)
        return convert.from_planar(xr, xi, self.fmt_out)

    def _step(self, carry: dict, raw: jnp.ndarray, reset: jnp.ndarray):
        """raw: (C, n_in * items) wire array -> (carry, (C, n_out * items)).

        The entire step runs on planar float32 (xr, xi) planes; see
        _build_carry for why.
        """
        cfg = self.cfg
        carry = jax.lax.cond(reset, self._reset_carry, lambda c: c, carry)
        new = dict(carry)

        wire_out = self._fused_wire_resample(raw, carry, new)
        if wire_out is not None:
            return new, wire_out

        fused = (self._fused_pre(raw, carry, new)
                 if cfg.dc_block else None)
        if fused is not None:
            xr, xi = fused
        else:
            xr, xi = convert.to_planar(raw, self.fmt_in, cfg.gain)
            if cfg.dc_block:
                xr, xi, new["dc"] = dc_block.apply_planar(
                    xr, xi, carry["dc"], self.dc_alpha)
            if cfg.iq_correction:
                new["iq"] = iq_balance.maybe_update_planar(
                    xr, xi, carry["iq"], self.iq_interval)
                xr, xi = iq_balance.apply_planar(xr, xi, new["iq"].factors)
            if int(self.dtheta_pre) != 0:
                xr, xi, new["nco_pre"] = nco.apply_planar(
                    xr, xi, carry["nco_pre"], self.dtheta_pre)
        if self.pre_filter:
            xr, xi, nr, ni = self.pre_filter.apply_planar(
                xr, xi, *carry["pre_f"])
            new["pre_f"] = (nr, ni)
        if self.resampler:
            if (self.post_filter is None and int(self.dtheta_post) == 0
                    and self.agc_cfg is None
                    and not os.environ.get("IQTOOL_DISABLE_PACK_OUT")):
                # nothing runs after the resampler but the convert: the
                # last stage's kernel epilogue quantizes + interleaves
                # straight to the wire (one fewer write + read of both
                # output-rate planes; BASELINE configs #1/#2 shape)
                wire_pk, new_rs = self.resampler.apply_planar_packed(
                    xr, xi, carry["rs"], interpret=_FUSED_POST_INTERPRET,
                    out_fmt=self.fmt_out.name)
                if wire_pk is not None:
                    new["rs"] = new_rs
                    return new, convert.packed_to_wire(wire_pk, self.fmt_out)
            xr, xi, new["rs"] = self.resampler.apply_planar(
                xr, xi, carry["rs"])
        if self.post_filter:
            if (int(self.dtheta_post) == 0 and self.agc_cfg is None
                    and not os.environ.get("IQTOOL_DISABLE_PACK_OUT")):
                # the filter is the chain's last op before the convert:
                # quantize + interleave in the banded kernel's epilogue
                # (flagship / config #2 shape — one fewer write + read
                # of both output-rate planes)
                res = self.post_filter.apply_planar_packed(
                    xr, xi, *carry["post_f"],
                    interpret=_FUSED_POST_INTERPRET,
                    out_fmt=self.fmt_out.name)
                if res is not None:
                    wire_pk, nr, ni = res
                    new["post_f"] = (nr, ni)
                    return new, convert.packed_to_wire(wire_pk, self.fmt_out)
            xr, xi, nr, ni = self.post_filter.apply_planar(
                xr, xi, *carry["post_f"])
            new["post_f"] = (nr, ni)
        fused_out = self._fused_post(xr, xi, carry, new)
        if fused_out is not None:
            return new, fused_out
        # digital AGC: measure the block peak BEFORE the post-NCO, exactly
        # where the fused kernel path measures it.  Rotation preserves
        # magnitude in exact math, but the digital profile compares hard
        # thresholds (clip/strong, agc.c:180-209): a ~1-ulp rotation
        # rounding could flip a lock/ratchet decision and propagate a
        # different gain forever.  Pinning the measurement point makes
        # the fused and XLA decisions bitwise-identical.
        dig_gain = None
        if self.agc_cfg is not None and self.agc_cfg.profile == "digital":
            pk = jnp.sqrt(jnp.max(xr * xr + xi * xi, axis=-1))
            dig_gain, new["agc"] = agc_ops.digital_update(
                carry["agc"], pk, xr.shape[-1], self.agc_cfg)
        if int(self.dtheta_post) != 0:
            xr, xi, new["nco_post"] = nco.apply_planar(
                xr, xi, carry["nco_post"], self.dtheta_post)
        if self.agc_cfg:
            if dig_gain is not None:
                xr, xi = xr * dig_gain[:, None], xi * dig_gain[:, None]
            else:
                xr, xi, new["agc"] = agc_ops.apply_planar(
                    xr, xi, carry["agc"], self.agc_cfg)
        out = convert.from_planar(xr, xi, self.fmt_out)
        return new, out

    @property
    def step(self):
        """The jitted step (carry donated for in-place buffer reuse)."""
        if self._jitted is None:
            self._jitted = jax.jit(self._step, donate_argnums=(0,))
        return self._jitted

    # --------------------------- accounting -----------------------------------

    def expected_out_frames(self, in_frames: int) -> int:
        """Total output frames the stream should yield for in_frames inputs
        (used by the host to trim the padded final block)."""
        if not self.resampler:
            return in_frames
        p, q = self.resampler.plan.p, self.resampler.plan.q
        return in_frames * p // q
