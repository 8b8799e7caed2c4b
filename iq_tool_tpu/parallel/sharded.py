"""Time- and channel-sharded execution of the DSP chain.

Design (SURVEY.md sections 2f and 5 "long-context" notes):

The stream is an infinite sequence of steps; each step processes a global
block of ``T * n_sub`` samples, laid out over a mesh axis ``time`` with T
shards (and independent channels over axis ``channel``).  Every stateful
stage needs the samples immediately PRECEDING each shard's sub-block:

* for shard i>0 that is the tail of shard i-1's sub-block THIS step -> one
  ``ppermute`` ring shift;
* for shard 0 it is the tail of shard T-1's sub-block from the PREVIOUS
  step -> exactly the value the same ppermute wraps around to shard 0,
  saved in the carry.

So each stateful stage costs ONE ppermute of its (C, H) tail per step, and
the carry is the ppermute result (only shard 0's slot is consumed).

Sequential recurrences that cross shards:

* DC IIR: shard-local scan from zero + exact prefix correction computed
  from all-gathered per-shard summaries (first-order linear recurrence
  composition) — bit-identical to the sequential scan up to f32 rounding;
* RMS AGC: per-segment energies are all-gathered and the gain scan runs
  (redundantly, replicated) over the full segment sequence — identical
  gain trajectory to single-device execution;
* digital AGC: block peak = pmax over time (one block per step);
* NCO: closed-form phase offset idx * n_sub * dtheta (uint32, exact);
* I/Q estimation: shard 0's first 1024 samples are broadcast (masked
  psum) and the deterministic grid update runs replicated.

Wire-fused stage 0 (round 4): when nothing but the pre-stage sits
between the wire and the resampler, every shard's stage 0 consumes the
packed cs16 wire directly (decode + DC recurrence + NCO in the kernel
prologue, banded_apply_dc); the cross-shard DC/window stitching rides
linearity — z·E and W_head corrections post-kernel, one extra ppermute
of the corrected (C, 2·hist) tails — exactly the FoldedChain stitch
with fold rows replaced by time shards (see _wire_stage0_dc).  The
last stage quantizes back to the wire in its epilogue when nothing
follows the resampler, so the sharded flagship runs wire->wire like
the single-chip chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iq_tool_tpu import constants as C
from iq_tool_tpu.ops import agc as agc_ops
from iq_tool_tpu.ops import convert, iq_balance, nco
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig


# Tests set this to run the fused Pallas pre-stage in interpret mode on
# CPU (the real-Mosaic path needs TPU hardware; tools/tpu_smoke.py covers
# it there).
_FUSED_INTERPRET = False


def make_mesh(devices=None, channel_shards: int | None = None,
              time_shards: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if channel_shards is None and time_shards is None:
        channel_shards, time_shards = 1, n
    elif channel_shards is None:
        channel_shards = n // time_shards
    elif time_shards is None:
        time_shards = n // channel_shards
    if channel_shards * time_shards != n:
        raise ValueError(f"{channel_shards}x{time_shards} != {n} devices")
    arr = np.asarray(devices).reshape(channel_shards, time_shards)
    return Mesh(arr, ("channel", "time"))


class ShardedChain:
    """A chain whose step runs under shard_map over a (channel, time) mesh.

    Global geometry: channels = cfg.channels (divisible by the channel
    axis), block = T * per-shard block.  The wire layout is
    (channels, n_in * items) like the single-chip chain, just bigger.
    """

    def __init__(self, cfg: ChainConfig, mesh: Mesh):
        self.mesh = mesh
        self.t = mesh.shape["time"]
        self.c_shards = mesh.shape["channel"]
        if cfg.channels % self.c_shards:
            raise ValueError(
                f"channels {cfg.channels} not divisible by channel axis "
                f"{self.c_shards}")
        self.c_local = cfg.channels // self.c_shards
        # per-shard chain: same config at per-shard block size and local
        # channel count; all plans (filters, resampler) are shard-local.
        local_cfg = ChainConfig(**{**cfg.__dict__,
                                   "channels": self.c_local,
                                   "target_block": cfg.target_block})
        self.local = Chain(local_cfg)
        self.cfg = cfg
        if self.cfg.iq_correction and self.local.n_in < C.IQ_FFT_SIZE:
            raise ValueError("per-shard block too small for I/Q estimation")

        self.n_in = self.local.n_in * self.t
        self.n_out = self.local.n_out * self.t
        self.in_wire_len = self.n_in * self.local.fmt_in.items_per_frame
        self.out_wire_len = self.n_out * self.local.fmt_out.items_per_frame
        self.in_wire_dtype = self.local.in_wire_dtype
        self.out_wire_dtype = self.local.out_wire_dtype
        self._jitted = None

    # Chain-compatible surface so StreamEngine / the CLI can drive a
    # ShardedChain interchangeably (fmt/resampler live on the local chain)
    @property
    def fmt_in(self):
        return self.local.fmt_in

    @property
    def fmt_out(self):
        return self.local.fmt_out

    @property
    def resampler(self):
        return self.local.resampler

    # ------------------------------------------------------------------ carry

    def _carry_struct(self) -> dict:
        """Leaf name -> ('halo', H) for tail leaves or ('rep', make_fn(ch))."""
        lc = self.local
        leaves: dict = {}
        if int(lc.dtheta_pre) != 0:
            leaves["nco_pre"] = ("rep", nco.init)
        if int(lc.dtheta_post) != 0:
            leaves["nco_post"] = ("rep", nco.init)
        # halo leaves are PLANAR: width 2H = real tail ++ imag tail, so one
        # ppermute still moves a stage's whole state
        if lc.cfg.dc_block:
            leaves["dc_x"] = ("halo", 2 * 1)
            leaves["dc_y"] = ("rep",
                              lambda ch: jnp.zeros((ch, 2), jnp.float32))
        if lc.cfg.iq_correction:
            leaves["iq"] = ("rep", iq_balance.init)
        if lc.pre_filter:
            leaves["pre_f"] = ("halo", 2 * lc.pre_filter.block)
        if lc.resampler:
            for si, st in enumerate(lc.resampler.stages):
                # eval_shape, NOT st.init(1): an EAGER complex64 zeros here
                # is an unimplemented per-op program on the axon backend
                # and poisons every subsequent compile in the process —
                # this single line was the root cause of the round-2/3
                # "sharded program rejected UNIMPLEMENTED" forensics
                # (init_carry -> _carry_struct ran it before any step).
                h = jax.eval_shape(lambda s=st: s.init(1)).shape[-1]
                leaves[f"rs{si}"] = ("halo", 2 * h)
        if lc.post_filter:
            leaves["post_f"] = ("halo", 2 * lc.post_filter.block)
        if lc.agc_cfg:
            leaves["agc"] = ("rep", agc_ops.init)
        return leaves

    def init_carry(self, channels: int | None = None):
        if channels is not None and channels != self.cfg.channels:
            raise ValueError(
                f"carry channels {channels} != configured {self.cfg.channels}")
        struct = self._carry_struct()
        ch_global = self.cfg.channels

        def build():
            out = {}
            for name, spec in struct.items():
                if spec[0] == "halo":
                    out[name] = jnp.zeros((ch_global, self.t * spec[1]),
                                          jnp.float32)
                else:
                    # build global-channel-sized replicated leaves by
                    # re-invoking the maker at the global channel count
                    out[name] = spec[1](ch_global)
            return out

        specs = self.carry_specs()
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))
        return jax.jit(build, out_shardings=shardings)()

    def carry_specs(self) -> dict:
        """PartitionSpecs: halo leaves are (C, T*H) sharded (channel, time);
        replicated leaves are channel-sharded, time-replicated."""
        struct = self._carry_struct()
        specs = {}
        for name, spec in struct.items():
            if spec[0] == "halo":
                specs[name] = P("channel", "time")
            else:
                # abstract eval only — see the eager-complex64 note above
                example = jax.eval_shape(lambda s=spec: s[1](1))
                specs[name] = jax.tree_util.tree_map(
                    lambda v: P("channel") if getattr(v, "ndim", 0) >= 1
                    else P(), example)
        return specs

    # ------------------------------------------------------------------- step

    def _halo(self, tail: jnp.ndarray, carry_tail: jnp.ndarray):
        """tail: this shard's (C, H) trailing samples. Returns (use, new_carry):
        use = preceding samples for this shard; new_carry = the wrapped
        ppermute result (consumed by shard 0 next step).  T == 1 is a
        static no-op: the single shard's predecessor IS the carry and
        the wrap target IS its own tail — no collective, no select (a
        channel-only mesh pays zero stitch cost)."""
        t = self.t
        if t == 1:
            return carry_tail, tail
        recv = jax.lax.ppermute(tail, "time",
                                [(i, (i + 1) % t) for i in range(t)])
        idx = jax.lax.axis_index("time")
        use = jnp.where(idx == 0, carry_tail, recv)
        return use, recv

    def _dc_sharded_plane(self, x, x_prev_use, carry_y, alpha):
        """Exact cross-shard first-order IIR, one real plane (see module
        docstring).  Shard-local prefix reuses the two-level MXU scan."""
        from iq_tool_tpu.ops.dc_block import _apply_plane
        n = x.shape[-1]
        if self.t == 1:
            # single time shard: the true carry goes straight into the
            # scan — no zero-start, no all_gather, no prefix compose
            y, _, end = _apply_plane(x, x_prev_use[:, 0], carry_y, alpha)
            return y, end
        # local scan from zero initial y, with the halo'd x[-1]
        y0, _, end0 = _apply_plane(x, x_prev_use[:, 0], jnp.zeros_like(carry_y),
                                   alpha)
        ends = jax.lax.all_gather(end0, "time")            # (T, C)
        a_real = 1.0 - alpha                               # python float
        a_l = jnp.float32(a_real ** n)
        starts = [carry_y]
        for j in range(1, self.t):
            starts.append(ends[j - 1] + a_l * starts[j - 1])
        starts_arr = jnp.stack(starts)                     # (T, C)
        idx = jax.lax.axis_index("time")
        start = starts_arr[idx]
        # a^(n+1) decay vector: numpy constant (a is real in (0,1))
        apow = np.power(a_real, np.arange(1, n + 1), dtype=np.float64)
        apow = apow.astype(np.float32)
        y = y0 + start[:, None] * apow[None, :]
        new_carry_y = ends[self.t - 1] + a_l * starts_arr[self.t - 1]
        return y, new_carry_y

    def _agc_sharded_gains(self, xr, xi, state, cfg, dig_pk=None):
        """(gains (C, n_seg) or (C, 1), seg, new_state): the per-shard
        gain schedule with the gain scan run over the GLOBAL
        (cross-shard) segment order — shared by the XLA apply and the
        fused post kernel (FoldedChain._agc_folded_gains's twin)."""
        if cfg.profile == "digital":
            # dig_pk is the PRE-post-NCO local peak measured in step()
            # (must match the single-device paths' measurement point)
            peak_local = (dig_pk if dig_pk is not None
                          else jnp.sqrt(jnp.max(xr * xr + xi * xi, axis=-1)))
            peak = jax.lax.pmax(peak_local, "time")
            n_total = xr.shape[-1] * self.t
            gain, new_state = agc_ops.digital_update(state, peak, n_total,
                                                     cfg)
            return gain[:, None], 0, new_state
        c, n = xr.shape
        n_seg, seg, beta = agc_ops.rms_params(cfg, n)
        xsr = xr[:, : n_seg * seg].reshape(c, n_seg, seg)
        xsi = xi[:, : n_seg * seg].reshape(c, n_seg, seg)
        e_local = jnp.mean(xsr * xsr + xsi * xsi, axis=-1).T  # (n_seg, C)
        e_all = jax.lax.all_gather(e_local, "time")        # (T, n_seg, C)
        e_flat = e_all.reshape(self.t * n_seg, c)
        gains, g_fin, e2_fin = agc_ops.rms_scan(
            e_flat, state.gain, state.e2, beta, cfg.target)
        idx = jax.lax.axis_index("time")
        my_gains = jax.lax.dynamic_slice_in_dim(gains, idx * n_seg, n_seg, 0)
        new_state = state._replace(
            gain=g_fin, e2=e2_fin,
            samples_seen=state.samples_seen + jnp.uint32(n * self.t))
        return my_gains.T, seg, new_state

    def _agc_sharded(self, xr, xi, state, cfg, dig_pk=None):
        gains, seg, new_state = self._agc_sharded_gains(xr, xi, state, cfg,
                                                        dig_pk)
        if seg == 0:
            g = gains
            return xr * g, xi * g, new_state
        c, n = xr.shape
        n_seg = gains.shape[-1]
        xsr = xr[:, : n_seg * seg].reshape(c, n_seg, seg)
        xsi = xi[:, : n_seg * seg].reshape(c, n_seg, seg)
        gseg = gains[:, :, None]
        yr = (xsr * gseg).reshape(c, n_seg * seg)
        yi = (xsi * gseg).reshape(c, n_seg * seg)
        if n_seg * seg < n:
            # ragged tail uses THIS shard's last gain (matches the
            # sequential per-block behavior of agc._apply_rms)
            g_last = gains[:, -1][:, None]
            yr = jnp.concatenate([yr, xr[:, n_seg * seg:] * g_last], -1)
            yi = jnp.concatenate([yi, xi[:, n_seg * seg:] * g_last], -1)
        return yr, yi, new_state

    def _fused_post_sharded(self, xr, xi, carry: dict, new: dict,
                            t_idx_fn, dig_pk):
        """Fused post-NCO + AGC apply + cs16 quantize over the per-shard
        planes (see Chain._fused_post / FoldedChain._fused_post_folded);
        per-shard NCO phases are the exact closed-form offsets and the
        AGC gain schedule comes from the cross-shard scan
        (_agc_sharded_gains).  Returns the int16 wire or None."""
        import os

        from iq_tool_tpu.ops import banded, pallas_kernels
        from iq_tool_tpu.pipeline import chain as chain_mod
        lc = self.local
        if not pallas_kernels.packable_out(lc.fmt_out.name):
            return None
        if os.environ.get("IQTOOL_DISABLE_POST_KERNEL"):
            return None
        interp = _FUSED_INTERPRET or chain_mod._FUSED_POST_INTERPRET
        if not (banded._on_tpu() or interp):
            return None
        dth = int(lc.dtheta_post)
        cfg_agc = lc.agc_cfg
        if not dth and cfg_agc is None:
            return None
        n = xr.shape[-1]
        new_agc = None
        if cfg_agc is not None:
            if (cfg_agc.profile != "digital"
                    and agc_ops.rms_params(cfg_agc, n)[1] != C.AGC_SEGMENT):
                return None
            gains, seg, new_agc = self._agc_sharded_gains(
                xr, xi, carry["agc"], cfg_agc, dig_pk)
        else:
            gains, seg = jnp.ones((xr.shape[0], 1), jnp.float32), 0
        pacc = None
        if dth:
            pacc = (carry["nco_post"]
                    + t_idx_fn().astype(jnp.uint32) * jnp.uint32(lc.n_out)
                    * jnp.uint32(dth))[:, None]
        res = pallas_kernels.post_apply(xr, xi, gains, seg, pacc, dth,
                                        interpret=interp,
                                        out_fmt=lc.fmt_out.name)
        if res is None:
            return None
        if new_agc is not None:
            new["agc"] = new_agc
        if dth:
            new["nco_post"] = (carry["nco_post"]
                               + jnp.uint32(self.t * lc.n_out)
                               * jnp.uint32(dth))
        return convert.packed_to_wire(res, lc.fmt_out)

    def _fused_pre_sharded(self, xr, xi, x_prev_use, carry: dict, new: dict,
                           t_idx_fn):
        """DC + IQ-apply + pre-NCO as the single fused Pallas kernel, on
        the sharded path.  The DC start value for shard i depends on the
        other shards' data THIS step, so the kernel runs the exact
        recurrence from a ZERO y-state (with the halo'd x_prev) and the
        missing start contribution start_i * a^(k+1) — which rides through
        the IQ apply and NCO rotation LINEARLY — is added afterwards as
        one fused XLA elementwise pass.  Returns (xr, xi) or None to fall
        back to the separate XLA ops (CPU, odd geometry)."""
        from iq_tool_tpu.ops import banded, dc_block, pallas_kernels
        lc = self.local
        cfg = lc.cfg
        if not (banded._on_tpu() or _FUSED_INTERPRET):
            return None
        if pallas_kernels.dc_geometry(xr.shape[0], xr.shape[-1]) is None:
            return None
        # gates passed — materialize the axis index only now (lazy; see
        # the note at t_idx's definition)
        t_idx = t_idx_fn()
        n = xr.shape[-1]
        a_real = 1.0 - lc.dc_alpha
        apow = np.power(a_real, np.arange(1, n + 1),
                        dtype=np.float64).astype(np.float32)
        a_l = jnp.float32(a_real ** n)

        iqf = None
        if cfg.iq_correction:
            # shard 0's first IQ_FFT_SIZE DC'd samples: shard 0's start IS
            # its carry, so the estimator segment is computable before the
            # kernel runs (masked psum broadcasts it to every shard)
            nf = C.IQ_FFT_SIZE
            seg_r, _, _ = dc_block._apply_plane(
                xr[:, :nf], x_prev_use[:, 0], carry["dc_y"][:, 0],
                lc.dc_alpha)
            seg_i, _, _ = dc_block._apply_plane(
                xi[:, :nf], x_prev_use[:, 1], carry["dc_y"][:, 1],
                lc.dc_alpha)
            seg = jnp.concatenate([seg_r, seg_i], axis=-1)
            seg0 = jnp.where(t_idx == 0, seg, jnp.zeros_like(seg))
            seg_b = jax.lax.psum(seg0, "time")
            new["iq"] = iq_balance.maybe_update_planar(
                seg_b[:, :nf], seg_b[:, nf:], carry["iq"], lc.iq_interval,
                advance_samples=self.t * n)
            iqf = new["iq"].factors

        dth = int(lc.dtheta_pre)
        phase = None
        if dth:
            phase = (carry["nco_pre"]
                     + t_idx.astype(jnp.uint32) * jnp.uint32(n)
                     * jnp.uint32(dth))
        st4 = jnp.stack([x_prev_use[:, 0], x_prev_use[:, 1],
                         jnp.zeros_like(x_prev_use[:, 0]),
                         jnp.zeros_like(x_prev_use[:, 1])], axis=-1)
        res = pallas_kernels.dc_block_apply(
            xr, xi, st4, lc.dc_alpha, iqf,
            phase[:, None] if phase is not None else None, dth,
            interpret=_FUSED_INTERPRET)
        if res is None:
            if cfg.iq_correction:
                del new["iq"]     # recomputed by the fallback path
            return None
        yr, yi, st4n = res
        # exact cross-shard prefix: compose zero-start shard ends into the
        # true per-shard start values (first-order linear recurrence)
        ends_r = jax.lax.all_gather(st4n[:, 2], "time")      # (T, C)
        ends_i = jax.lax.all_gather(st4n[:, 3], "time")
        starts_r = [carry["dc_y"][:, 0]]
        starts_i = [carry["dc_y"][:, 1]]
        for j in range(1, self.t):
            starts_r.append(ends_r[j - 1] + a_l * starts_r[j - 1])
            starts_i.append(ends_i[j - 1] + a_l * starts_i[j - 1])
        sr_arr = jnp.stack(starts_r)
        si_arr = jnp.stack(starts_i)
        start_r = sr_arr[t_idx]
        start_i = si_arr[t_idx]
        # the omitted DC term rides linearly through IQ and the rotation
        dr = start_r[:, None] * apow[None, :]
        di = start_i[:, None] * apow[None, :]
        if iqf is not None:
            dr, di = iq_balance.apply_planar(dr, di, iqf)
        if dth:
            dr, di, _ = nco.apply_planar(dr, di, phase, lc.dtheta_pre)
            new["nco_pre"] = (carry["nco_pre"]
                              + jnp.uint32(self.t * n) * jnp.uint32(dth))
        yr = yr + dr
        yi = yi + di
        new["dc_y"] = jnp.stack(
            [ends_r[self.t - 1] + a_l * sr_arr[self.t - 1],
             ends_i[self.t - 1] + a_l * si_arr[self.t - 1]], axis=-1)
        return yr, yi

    def _wire_stage0_dc(self, raw, carry: dict, new: dict, t_idx_fn):
        """DC-fused sharded stage 0 — the distributed twin of
        FoldedChain._wire_stage0_dc: the whole pre-stage (wire decode +
        DC recurrence + NCO) runs in the stage-0 kernel's prologue
        (pallas_kernels.banded_apply_dc) on every time shard, from ZERO
        DC y-state and (shards > 0) ZERO window context, and the
        stitching happens post-kernel through linearity:

        * the missing start·a^(k+1) term is composed across shards
          exactly like _fused_pre_sharded (all_gather of the zero-start
          ends + first-order prefix) and lands on the OUTPUT as z·E,
          with E a design-time constant (resample.dc_stage0_consts) —
          cheaper than the input-rate correction the unfused path pays;
        * shard i's window context (shard i-1's processed tail) is known
          only post-kernel: the corrected tails ride ONE extra ppermute
          of (C, 2·hist) and enter the head windows through the tiny
          exact W_head matmul; shard 0 takes the carried true tail INTO
          the kernel;
        * the wrapped ppermute result is the next step's rs0 carry —
          the same packed planar layout the unfused halo stores, so
          checkpoints interchange across the paths.

        Returns (yr, yi) at the stage-0 output rate, or None (caller
        falls back to the planar path); updates dc_x, dc_y, nco_pre and
        rs0 in ``new``."""
        import os

        from iq_tool_tpu.ops import banded, pallas_kernels, resample
        from iq_tool_tpu.pipeline import chain as chain_mod
        lc = self.local
        cfg = lc.cfg
        if (os.environ.get("IQTOOL_DISABLE_WIRE_INPUT")
                or os.environ.get("IQTOOL_DISABLE_DC_STAGE0")):
            return None
        interp = _FUSED_INTERPRET or chain_mod._FUSED_POST_INTERPRET
        if not (banded._on_tpu() or interp):
            return None
        stages = lc.resampler.stages
        if not stages or not hasattr(stages[0], "stride"):
            return None
        packed = convert.wire_pack(raw, lc.fmt_in)
        if packed is None:
            return None
        wire, kind = packed
        st0 = stages[0]
        hist = st0.hist
        if pallas_kernels.plan(st0.stride, hist, st0._a.shape[1],
                               wire.shape[-1] // st0.stride, raw.shape[0],
                               dc=True) is None:
            return None
        t_idx = t_idx_fn()
        n = lc.n_in
        items = lc.fmt_in.items_per_frame
        # per-shard x_prev: the preceding RAW sample — the unfused
        # path's dc_x halo, fed from the decoded last frame
        lr, li = convert.to_planar(raw[:, -items:], lc.fmt_in, cfg.gain)
        use, new["dc_x"] = self._halo(
            jnp.concatenate([lr, li], axis=-1), carry["dc_x"])
        dth = int(lc.dtheta_pre)
        phase = None
        if dth:
            phase = (carry["nco_pre"]
                     + t_idx.astype(jnp.uint32) * jnp.uint32(n)
                     * jnp.uint32(dth))
        cr0 = carry["rs0"][:, :hist]
        ci0 = carry["rs0"][:, hist:]
        if self.t == 1:
            # single time shard: the TRUE DC y-state and window context
            # go straight into the kernel (exactly Chain's fused path) —
            # the zero-start corrections below (all_gather + z*E +
            # W_head matmul + tail ppermute) are statically skipped, so
            # a 1x1 or channel-only mesh pays no stitch cost
            st4 = jnp.stack([use[:, 0], use[:, 1],
                             carry["dc_y"][:, 0], carry["dc_y"][:, 1]],
                            axis=-1)
            res, tr, ti, st4n = pallas_kernels.banded_apply_dc(
                cr0, ci0, st4, lc.dc_alpha, st0._a, st0._a_i,
                st0.stride, hist, wire_i32=wire,
                wire_norm=lc.fmt_in.normalizer, wire_gain=cfg.gain,
                nco_dtheta=dth,
                nco_phase=phase[:, None] if dth else None,
                pack_fmt=None, interpret=interp, wire_kind=kind)
            new["dc_y"] = st4n[:, 2:4]
            new["rs0"] = jnp.concatenate([tr, ti], axis=-1)
            if dth:
                new["nco_pre"] = (carry["nco_pre"]
                                  + jnp.uint32(n) * jnp.uint32(dth))
            return res
        # window context: shard 0 takes the TRUE carried tail, the rest
        # zeros (head-corrected below)
        at0 = t_idx == 0
        st_r = jnp.where(at0, cr0, jnp.zeros_like(cr0))
        st_i = jnp.where(at0, ci0, jnp.zeros_like(ci0))
        st4 = jnp.stack([use[:, 0], use[:, 1],
                         jnp.zeros_like(use[:, 0]),
                         jnp.zeros_like(use[:, 1])], axis=-1)
        res, tr, ti, st4n = pallas_kernels.banded_apply_dc(
            st_r, st_i, st4, lc.dc_alpha, st0._a, st0._a_i,
            st0.stride, hist, wire_i32=wire,
            wire_norm=lc.fmt_in.normalizer, wire_gain=cfg.gain,
            nco_dtheta=dth,
            nco_phase=phase[:, None] if dth else None,
            pack_fmt=None, interpret=interp, wire_kind=kind)
        yr, yi = res
        e_r, e_i, dt_r, dt_i, w_r, w_i, n_headg = resample.dc_stage0_consts(
            st0, n, lc.dc_alpha, dth)
        # correction 1: true per-shard DC starts (all_gather prefix
        # compose, same as _fused_pre_sharded), rotated by the shard
        # phase, times E
        a_l = jnp.float32((1.0 - lc.dc_alpha) ** n)
        ends_r = jax.lax.all_gather(st4n[:, 2], "time")          # (T, C)
        ends_i = jax.lax.all_gather(st4n[:, 3], "time")
        starts_r = [carry["dc_y"][:, 0]]
        starts_i = [carry["dc_y"][:, 1]]
        for j in range(1, self.t):
            starts_r.append(ends_r[j - 1] + a_l * starts_r[j - 1])
            starts_i.append(ends_i[j - 1] + a_l * starts_i[j - 1])
        sr_arr = jnp.stack(starts_r)
        si_arr = jnp.stack(starts_i)
        start_r = sr_arr[t_idx]
        start_i = si_arr[t_idx]
        new["dc_y"] = jnp.stack(
            [ends_r[self.t - 1] + a_l * sr_arr[self.t - 1],
             ends_i[self.t - 1] + a_l * si_arr[self.t - 1]], axis=-1)
        if dth:
            z_r, z_i, _ = nco.apply_planar(start_r[:, None],
                                           start_i[:, None], phase, 0)
            z_r, z_i = z_r[:, 0], z_i[:, 0]
            new["nco_pre"] = (carry["nco_pre"]
                              + jnp.uint32(self.t * n) * jnp.uint32(dth))
        else:
            z_r, z_i = start_r, start_i
        yr = yr + (z_r[:, None] * e_r[None, :]
                   - z_i[:, None] * e_i[None, :])
        yi = yi + (z_r[:, None] * e_i[None, :]
                   + z_i[:, None] * e_r[None, :])
        # true processed tails (the kernel's are zero-start)
        tr = tr + (z_r[:, None] * dt_r[None, :]
                   - z_i[:, None] * dt_i[None, :])
        ti = ti + (z_r[:, None] * dt_i[None, :]
                   + z_i[:, None] * dt_r[None, :])
        # correction 2: shards 1..T-1 ran with zero window context — add
        # the previous shard's true tail through the head-window matrix.
        # Exact (HIGHEST) matmuls: tiny, and the term carries
        # IIR-composed state.
        recv = jax.lax.ppermute(
            jnp.concatenate([tr, ti], axis=-1), "time",
            [(i, (i + 1) % self.t) for i in range(self.t)])
        new["rs0"] = recv
        prev = jnp.where(at0, jnp.zeros_like(recv), recv)
        prev_r, prev_i = prev[:, :hist], prev[:, hist:]
        mm = lambda a_, b_: jnp.matmul(a_, b_,
                                       precision=jax.lax.Precision.HIGHEST)
        h_r = mm(prev_r, w_r) - mm(prev_i, w_i)
        h_i = mm(prev_r, w_i) + mm(prev_i, w_r)
        yr = yr.at[:, :n_headg].add(h_r)
        yi = yi.at[:, :n_headg].add(h_i)
        return yr, yi

    def _wire_stage0(self, raw, carry: dict, new: dict, t_idx_fn):
        """Sharded stage 0 straight off the packed cs16 wire (nothing
        precedes the resampler; FoldedChain._wire_stage0's distributed
        twin).  EXACT — unlike the DC variant no correction pass is
        needed: without the DC recurrence the stage's true window
        context is the previous shard's decoded (closed-form-rotated)
        raw tail, computable pre-kernel, so the ordinary halo ppermute
        feeds the kernel directly.  With a single-stage cascade and
        nothing after the resampler the SAME kernel also quantizes back
        to the wire in its epilogue (sharded wire->wire, one kernel).
        Returns (out0, out1, packed) or None — packed means out0 is the
        int32 wire and out1 is None; updates nco_pre and rs0 in
        ``new``."""
        import os

        from iq_tool_tpu.ops import banded, pallas_kernels
        from iq_tool_tpu.pipeline import chain as chain_mod
        lc = self.local
        cfg = lc.cfg
        if os.environ.get("IQTOOL_DISABLE_WIRE_INPUT"):
            return None
        interp = _FUSED_INTERPRET or chain_mod._FUSED_POST_INTERPRET
        if not (banded._on_tpu() or interp):
            return None
        stages = lc.resampler.stages
        if not stages or not hasattr(stages[0], "stride"):
            return None
        packed = convert.wire_pack(raw, lc.fmt_in)
        if packed is None:
            return None
        wire, kind = packed
        st0 = stages[0]
        hist = st0.hist
        if pallas_kernels.plan(st0.stride, hist, st0._a.shape[1],
                               wire.shape[-1] // st0.stride,
                               raw.shape[0]) is None:
            return None
        t_idx = t_idx_fn()
        n = lc.n_in
        items = lc.fmt_in.items_per_frame
        lr, li = convert.to_planar(raw[:, -hist * items:], lc.fmt_in,
                                   cfg.gain)
        dth = int(lc.dtheta_pre)
        pacc = None
        if dth:
            base = (carry["nco_pre"]
                    + t_idx.astype(jnp.uint32) * jnp.uint32(n)
                    * jnp.uint32(dth))
            pacc = base[:, None]
            # the carried/halo'd history is the POST-shift signal:
            # rotate the decoded tail at its global sample indices
            ph_tail = (base + jnp.uint32((n - hist) & 0xFFFFFFFF)
                       * jnp.uint32(dth))
            lr, li, _ = nco.apply_planar(lr, li, ph_tail, lc.dtheta_pre)
            new["nco_pre"] = (carry["nco_pre"]
                              + jnp.uint32(self.t * n) * jnp.uint32(dth))
        use, new["rs0"] = self._halo(
            jnp.concatenate([lr, li], axis=-1), carry["rs0"])
        pack0 = (lc.fmt_out.name if (
                 len(stages) == 1 and lc.post_filter is None
                 and int(lc.dtheta_post) == 0 and lc.agc_cfg is None
                 and pallas_kernels.packable_out(lc.fmt_out.name)
                 and not os.environ.get("IQTOOL_DISABLE_PACK_OUT"))
                 else None)
        res = pallas_kernels.banded_apply(
            use[:, :hist], use[:, hist:], None, None, st0._a, st0._a_i,
            st0.stride, hist, interpret=interp, pack_fmt=pack0,
            wire_i32=wire, wire_norm=lc.fmt_in.normalizer,
            wire_gain=cfg.gain, nco_dtheta=dth, nco_phase=pacc,
            wire_kind=kind)
        return (res, None, True) if pack0 else (*res, False)

    def _local_step(self, carry: dict, raw: jnp.ndarray, reset: jnp.ndarray):
        """Runs per time/channel shard inside shard_map.

        raw: (C_local, n_sub * items); halo carry leaves arrive as
        (C_local, H) slices of the (C, T*H) global arrays."""
        lc = self.local
        cfg = lc.cfg
        # Lazy axis_index, kept as a belt-and-braces measure.  Round-2
        # forensics blamed a traced-but-unused axis_index for the axon
        # UNIMPLEMENTED rejections; round 4 found the REAL cause (eager
        # complex64 in _carry_struct poisoning the process — see
        # _carry_struct) and tools/axis_index_recheck.py shows an unused
        # axis_index program PASSES in a clean process.  Materializing
        # the index only when consumed still keeps the jaxpr minimal.
        _t_idx_cache = []

        def t_idx():
            if not _t_idx_cache:
                # T == 1: a literal 0, so every t_idx()==0 select and
                # masked psum folds away at trace/compile time
                _t_idx_cache.append(jnp.int32(0) if self.t == 1
                                    else jax.lax.axis_index("time"))
            return _t_idx_cache[0]

        n_sub = lc.n_in

        def reset_carry(cc):
            out = {}
            for name, v in cc.items():
                if name == "iq":
                    out[name] = v          # learned factors persist
                elif name == "agc":
                    out[name] = agc_ops.init(v.gain.shape[0])
                else:
                    out[name] = jax.tree_util.tree_map(jnp.zeros_like, v)
            return out

        carry = jax.lax.cond(reset, reset_carry, lambda cc: cc, carry)

        def tail2(xr, xi, h):
            """Planar stage tail, packed real ++ imag for one ppermute."""
            return jnp.concatenate([xr[:, -h:], xi[:, -h:]], axis=-1)

        new = dict(carry)

        # wire-fused stage 0 (round 4): nothing between the wire and the
        # resampler but the pre-stage -> stage 0 consumes the packed
        # wire directly, with the DC recurrence and NCO in its kernel
        # prologue when dc_block is on (see _wire_stage0_dc)
        wire_rs = None
        if (lc.resampler is not None and not cfg.iq_correction
                and lc.pre_filter is None):
            if cfg.dc_block:
                wire_rs = self._wire_stage0_dc(raw, carry, new, t_idx)
            else:
                res0 = self._wire_stage0(raw, carry, new, t_idx)
                if res0 is not None and res0[2]:
                    # single-stage cascade: wire in AND out in ONE kernel
                    return new, convert.packed_to_wire(res0[0], lc.fmt_out)
                wire_rs = None if res0 is None else (res0[0], res0[1])

        fused = None
        if wire_rs is not None:
            xr, xi = wire_rs
        else:
            xr, xi = convert.to_planar(raw, lc.fmt_in, cfg.gain)
            if cfg.dc_block:
                use, new["dc_x"] = self._halo(tail2(xr, xi, 1),
                                              carry["dc_x"])
                fused = self._fused_pre_sharded(xr, xi, use, carry, new,
                                                t_idx)
                if fused is not None:
                    xr, xi = fused
                else:
                    yr, cyr = self._dc_sharded_plane(
                        xr, use[:, 0:1], carry["dc_y"][:, 0], lc.dc_alpha)
                    yi, cyi = self._dc_sharded_plane(
                        xi, use[:, 1:2], carry["dc_y"][:, 1], lc.dc_alpha)
                    xr, xi = yr, yi
                    new["dc_y"] = jnp.stack([cyr, cyi], axis=-1)
        if wire_rs is None and fused is None and cfg.iq_correction:
            # broadcast shard 0's leading 1024 samples (masked psum)
            nf = C.IQ_FFT_SIZE
            seg = jnp.concatenate([xr[:, :nf], xi[:, :nf]], axis=-1)
            seg0 = jnp.where(t_idx() == 0, seg, jnp.zeros_like(seg))
            seg_b = jax.lax.psum(seg0, "time")
            new["iq"] = iq_balance.maybe_update_planar(
                seg_b[:, :nf], seg_b[:, nf:], carry["iq"], lc.iq_interval,
                advance_samples=self.t * n_sub)
            xr, xi = iq_balance.apply_planar(xr, xi, new["iq"].factors)
        if wire_rs is None and fused is None and int(lc.dtheta_pre) != 0:
            phase = (carry["nco_pre"]
                     + t_idx().astype(jnp.uint32) * jnp.uint32(n_sub)
                     * lc.dtheta_pre)
            xr, xi, _ = nco.apply_planar(xr, xi, phase, lc.dtheta_pre)
            new["nco_pre"] = (carry["nco_pre"]
                              + jnp.uint32(self.t * n_sub) * lc.dtheta_pre)
        if lc.pre_filter:
            b = lc.pre_filter.block
            use, new["pre_f"] = self._halo(tail2(xr, xi, b), carry["pre_f"])
            xr, xi, _, _ = lc.pre_filter.apply_planar(
                xr, xi, use[:, :b], use[:, b:])
        if lc.resampler:
            import os

            from iq_tool_tpu.pipeline import chain as chain_mod
            from iq_tool_tpu.ops import pallas_kernels as _pk
            pack_last = (lc.post_filter is None
                         and int(lc.dtheta_post) == 0
                         and lc.agc_cfg is None
                         and _pk.packable_out(lc.fmt_out.name)
                         and not os.environ.get("IQTOOL_DISABLE_PACK_OUT"))
            interp = _FUSED_INTERPRET or chain_mod._FUSED_POST_INTERPRET
            stages = lc.resampler.stages
            start = 1 if wire_rs is not None else 0
            for si in range(start, len(stages)):
                stage = stages[si]
                h = carry[f"rs{si}"].shape[-1] // 2
                use, new[f"rs{si}"] = self._halo(tail2(xr, xi, h),
                                                 carry[f"rs{si}"])
                if (pack_last and si == len(stages) - 1
                        and hasattr(stage, "apply_planar_packed")):
                    # the kernel epilogue quantizes + interleaves to the
                    # wire (see Chain._step); can_pack self-gates
                    wire_pk, _, _ = stage.apply_planar_packed(
                        xr, xi, use[:, :h], use[:, h:], interpret=interp,
                        out_fmt=lc.fmt_out.name)
                    if wire_pk is not None:
                        return new, convert.packed_to_wire(wire_pk,
                                                           lc.fmt_out)
                xr, xi, _, _ = stage.apply_planar(
                    xr, xi, use[:, :h], use[:, h:])
        if lc.post_filter:
            b = lc.post_filter.block
            use, new["post_f"] = self._halo(tail2(xr, xi, b), carry["post_f"])
            xr, xi, _, _ = lc.post_filter.apply_planar(
                xr, xi, use[:, :b], use[:, b:])
        # digital AGC: measure the block peak pre-NCO, matching the
        # single-device fused and XLA paths (Chain._step): the profile's
        # hard thresholds must see the same float value everywhere
        dig_pk = None
        if lc.agc_cfg is not None and lc.agc_cfg.profile == "digital":
            dig_pk = jnp.sqrt(jnp.max(xr * xr + xi * xi, axis=-1))
        fused_out = self._fused_post_sharded(xr, xi, carry, new, t_idx,
                                             dig_pk)
        if fused_out is not None:
            return new, fused_out
        if int(lc.dtheta_post) != 0:
            n_out_sub = lc.n_out
            phase = (carry["nco_post"]
                     + t_idx().astype(jnp.uint32) * jnp.uint32(n_out_sub)
                     * lc.dtheta_post)
            xr, xi, _ = nco.apply_planar(xr, xi, phase, lc.dtheta_post)
            new["nco_post"] = (carry["nco_post"]
                               + jnp.uint32(self.t * n_out_sub)
                               * lc.dtheta_post)
        if lc.agc_cfg:
            xr, xi, new["agc"] = self._agc_sharded(xr, xi, carry["agc"],
                                                   lc.agc_cfg, dig_pk)
        out = convert.from_planar(xr, xi, lc.fmt_out)
        return new, out

    @property
    def step(self):
        """jitted sharded step: (carry, raw (C, n_in*items), reset) ->
        (carry, out (C, n_out*items))."""
        if self._jitted is not None:
            return self._jitted
        specs = self.carry_specs()
        in_raw_spec = P("channel", "time")
        out_spec = P("channel", "time")

        f = jax.shard_map(
            self._local_step, mesh=self.mesh,
            in_specs=(specs, in_raw_spec, P()),
            out_specs=(specs, out_spec),
            check_vma=False,
        )
        self._jitted = jax.jit(f, donate_argnums=(0,))
        return self._jitted

    def expected_out_frames(self, in_frames: int) -> int:
        if not self.local.resampler:
            return in_frames
        p, q = self.local.resampler.plan.p, self.local.resampler.plan.q
        return in_frames * p // q
