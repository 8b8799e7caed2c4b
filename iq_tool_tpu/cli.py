"""Command-line interface (src/cli.c + src/main.c surface).

Usage mirrors the reference:

    python -m iq_tool_tpu -i wav -o raw capture.wav out.raw \
        --preset cu8-nrsc5 --freq-shift -100e3 --lowpass 200e3

Options are assembled from the static groups plus every registered
module's contributions, so --help shows exactly what this build supports
(module_manager.c:224-258 behavior).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from iq_tool_tpu import __version__
from iq_tool_tpu import constants as C
from iq_tool_tpu.config import (AppConfig, apply_preset, collect_filter_requests,
                                resolve_rates, validate)
from iq_tool_tpu.formats import complex_formats
from iq_tool_tpu.modules import INPUT_MODULES, OUTPUT_MODULES, get_input, get_output
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
from iq_tool_tpu.pipeline.runtime import StreamEngine
from iq_tool_tpu.presets import load_presets


def _git_hash() -> str:
    """Short commit hash, like the reference's GIT_HASH build define
    (CMakeLists.txt:698-716, cli.c:69-73); 'unknown' outside a checkout."""
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=2).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="iq_tool_tpu",
        description="TPU-native I/Q stream processor "
                    "(resample / shift / filter / AGC)",
    )
    p.add_argument("input_file", nargs="?", help="Input file (file sources)")
    p.add_argument("output_file", nargs="?", help="Output file (file sinks)")
    p.add_argument("--version", action="version",
                   version=f"iq_tool_tpu {__version__} ({_git_hash()})")

    g = p.add_argument_group("Required Input & Output")
    g.add_argument("-i", "--input", required=True, metavar="TYPE",
                   help="Input type {%s}" % "|".join(sorted(INPUT_MODULES)))
    g.add_argument("-o", "--output", required=True, metavar="TYPE",
                   help="Output type {%s}" % "|".join(sorted(OUTPUT_MODULES)))

    g = p.add_argument_group("Output Options")
    g.add_argument("--output-sample-format", metavar="FMT",
                   help="Sample format for output data {%s}" %
                        "|".join(complex_formats()))
    g.add_argument("--force-overwrite", action="store_true",
                   help="Overwrite existing output files without prompting")

    g = p.add_argument_group("Processing Options")
    g.add_argument("--output-rate", type=float, metavar="HZ",
                   help="Output sample rate in Hz (required unless a preset "
                        "or --no-resample is used)")
    g.add_argument("--gain-multiplier", type=float, default=1.0, metavar="G",
                   help="Linear gain multiplier applied to input samples")
    g.add_argument("--freq-shift", type=float, metavar="HZ",
                   help="Frequency shift in Hz (e.g. -100e3)")
    g.add_argument("--shift-after-resample", action="store_true",
                   help="Apply the frequency shift AFTER resampling")
    g.add_argument("--no-resample", action="store_true",
                   help="Process at the native input rate (no resampler)")
    g.add_argument("--raw-passthrough", action="store_true",
                   help="Bypass all processing; copy raw bytes")
    g.add_argument("--iq-correction", action="store_true",
                   help="Enable automatic I/Q imbalance correction")
    g.add_argument("--dc-block", action="store_true",
                   help="Enable DC offset removal")
    g.add_argument("--preset", metavar="NAME", help="Apply a named preset")
    g.add_argument("--list-presets", action="store_true",
                   help="List available presets and exit")

    g = p.add_argument_group("Output Automatic Gain Control (AGC)")
    g.add_argument("--output-agc", action="store_true",
                   help="Enable automatic gain control on the output")
    g.add_argument("--agc-profile", metavar="P",
                   help="AGC profile {dx|local|digital} (default: local)")
    g.add_argument("--agc-target", type=float, metavar="T",
                   help="AGC target magnitude (0.0 - 1.0)")

    g = p.add_argument_group(
        "Filtering Options (chain up to 5 with suffixes -2..-5)")
    for i in range(1, C.FILTER_MAX_CHAIN + 1):
        sfx = "" if i == 1 else f"-{i}"
        show = i == 1
        g.add_argument(f"--lowpass{sfx}", type=float, metavar="HZ",
                       help="Keep -<hz>..+<hz> around DC" if show
                       else argparse.SUPPRESS)
        g.add_argument(f"--highpass{sfx}", type=float, metavar="HZ",
                       help="Reject -<hz>..+<hz> around DC" if show
                       else argparse.SUPPRESS)
        g.add_argument(f"--pass-range{sfx}", metavar="LO:HI",
                       help="Isolate a band, e.g. 102e3:215e3" if show
                       else argparse.SUPPRESS)
        g.add_argument(f"--stopband{sfx}", metavar="LO:HI",
                       help="Notch a band, e.g. -10e3:10e3" if show
                       else argparse.SUPPRESS)

    g = p.add_argument_group("Filter Quality Options")
    g.add_argument("--transition-width", type=float, metavar="HZ",
                   help="Filter sharpness (transition width in Hz)")
    g.add_argument("--filter-taps", type=int, metavar="N",
                   help="Exact filter length (overrides --transition-width)")
    g.add_argument("--attenuation", type=float, metavar="DB",
                   help="Stop-band attenuation in dB (default 60)")
    g.add_argument("--filter-type", metavar="T",
                   help="Filter implementation {fir|fft} (default auto)")
    g.add_argument("--filter-fft-size", type=int, metavar="N",
                   help="FFT size for the fft filter (power of two)")

    g = p.add_argument_group("SDR General Options")
    g.add_argument("--sdr-rf-freq", type=float, metavar="HZ",
                   help="(Required for SDR inputs) Tuner center frequency in Hz")
    g.add_argument("--sdr-sample-rate", type=float, metavar="HZ",
                   help="SDR sample rate in Hz (device-specific default)")
    g.add_argument("--sdr-bias-t", action="store_true",
                   help="Enable Bias-T power")
    g.add_argument("--sdr-buffered", action="store_true",
                   help="Buffered capture mode: frame SDR samples as IQPK "
                        "packets (corruption resync, reset events) through "
                        "the capture ring instead of raw bytes")

    g = p.add_argument_group("Performance Options")
    g.add_argument("--block-size", type=int, default=C.DEFAULT_BLOCK_SIZE,
                   metavar="N", help="Device block size in frames "
                   "(per time shard when --mesh-time > 1)")
    g.add_argument("--pipeline-depth", type=int, default=C.PIPELINE_DEPTH,
                   metavar="N", help="Device steps kept in flight before a "
                   "readback (amortizes dispatch latency)")
    g.add_argument("--channels", type=int, default=1, metavar="N",
                   help="Process N independent streams as one batch. File "
                        "paths then take a {ch} placeholder (in_{ch}.raw) "
                        "or N comma-separated paths; channels run in "
                        "lockstep and end at the shortest stream")
    g.add_argument("--mesh-channel", type=int, metavar="N",
                   help="Shard the channel axis over N devices (default: "
                        "the largest divisor of --channels that fits the "
                        "device budget left by --mesh-time)")
    g.add_argument("--mesh-time", type=int, metavar="N",
                   help="Shard each block over N devices along time "
                        "(halo-exchange sequence parallelism; default: "
                        "remaining devices / --mesh-channel)")
    g.add_argument("--time-fold", type=int, metavar="F",
                   help="Fold each channel's block into F consecutive "
                        "time rows per device step, filling the 8-sublane "
                        "batch a single stream leaves idle (default: auto "
                        "— 8/channels on TPU, off elsewhere; 1 disables)")
    g.add_argument("--profile-dir", metavar="DIR",
                   help="Capture a jax.profiler trace of the run into DIR "
                        "(view with tensorboard/xprof)")

    g = p.add_argument_group("Reliability Options")
    g.add_argument("--log-level", default="info", metavar="L",
                   help="Log level {trace|debug|info|warn|error} (default info)")
    g.add_argument("--checkpoint", metavar="FILE",
                   help="Periodically persist stream state for resume")
    g.add_argument("--checkpoint-interval", type=float, default=30.0,
                   metavar="SEC", help="Checkpoint cadence (default 30 s)")
    g.add_argument("--resume", action="store_true",
                   help="Resume from an existing --checkpoint file")
    g.add_argument("--no-watchdog", action="store_true",
                   help="Disable the stalled-stream watchdog on live inputs")

    for mod in list(INPUT_MODULES.values()) + list(OUTPUT_MODULES.values()):
        mod.add_cli_options(p)
    return p


def config_from_args(args) -> AppConfig:
    cfg = AppConfig(
        input_type=args.input, output_type=args.output,
        input_path=args.input_file, output_path=args.output_file,
        output_format=args.output_sample_format,
        target_rate=args.output_rate,
        no_resample=args.no_resample,
        raw_passthrough=args.raw_passthrough,
        gain=args.gain_multiplier,
        freq_shift_hz=args.freq_shift,
        shift_after_resample=args.shift_after_resample,
        dc_block=args.dc_block, iq_correction=args.iq_correction,
        output_agc=args.output_agc, agc_profile=args.agc_profile,
        agc_target=args.agc_target,
        filters=collect_filter_requests(args),
        transition_width_hz=args.transition_width,
        filter_taps=args.filter_taps,
        attenuation_db=args.attenuation,
        filter_type=args.filter_type,
        filter_fft_size=args.filter_fft_size,
        preset_name=args.preset,
        force_overwrite=args.force_overwrite,
        resume=getattr(args, 'resume', False),
    )
    if cfg.preset_name:
        presets, path = load_presets()
        pr = presets.get(cfg.preset_name.lower())
        if pr is None:
            raise ValueError(
                f"unknown preset '{cfg.preset_name}'"
                + (f" (presets file: {path})" if path else " (no presets file found)"))
        apply_preset(cfg, pr)
    return cfg


def expand_channel_paths(path: str | None, n: int, what: str) -> list:
    """N per-channel paths from a '{ch}' template or a comma-separated
    list (the multi-stream CLI surface for BASELINE config #5)."""
    if n == 1:
        return [path]
    if path is None:
        raise ValueError(f"--channels {n} needs {n} {what} paths")
    if "{ch}" in path:
        return [path.replace("{ch}", str(c)) for c in range(n)]
    parts = [s for s in path.split(",") if s]
    if len(parts) != n:
        raise ValueError(
            f"--channels {n}: give a '{{ch}}' template or {n} "
            f"comma-separated {what} paths (got {len(parts)})")
    return parts


def build_chain(cfg: AppConfig, block_size: int, channels: int = 1,
                mesh_channel: int | None = None,
                mesh_time: int | None = None,
                time_fold: int | None = None) -> Chain | None:
    if cfg.raw_passthrough:
        return None
    shift = cfg.freq_shift_hz if cfg.freq_shift_hz is not None else cfg.nco_shift_hz
    pre = 0.0 if cfg.shift_after_resample else (shift or 0.0)
    post = (shift or 0.0) if cfg.shift_after_resample else 0.0
    agc_profile = (cfg.agc_profile or "local") if cfg.output_agc else None
    make = Chain
    if (mesh_channel or mesh_time) and time_fold and time_fold > 1:
        raise ValueError(
            "--time-fold does not combine with --mesh-channel/--mesh-time "
            "(the sharded path has its own per-shard batching)")
    if not (mesh_channel or mesh_time):
        fold = time_fold
        auto = fold is None
        if auto:
            from iq_tool_tpu.ops import banded
            from iq_tool_tpu.pipeline.folded import auto_fold
            fold = auto_fold(channels) if banded._on_tpu() else 1
        if fold > 1:
            from iq_tool_tpu.pipeline.folded import FoldedChain

            def make(ccfg, _fold=fold, _auto=auto):
                try:
                    return FoldedChain(ccfg, _fold)
                except ValueError:
                    if not _auto:
                        raise        # the user asked for this fold
                    return Chain(ccfg)   # auto: fall back to unfolded
    if mesh_channel or mesh_time:
        import jax

        from iq_tool_tpu.parallel.sharded import ShardedChain, make_mesh
        n_dev = len(jax.devices())
        # an unspecified axis defaults to what the stream supports (the
        # channel axis must divide --channels), over a device SUBSET —
        # "--mesh-time 2" on one channel means 1x2, not (n/2)x2
        mc = mesh_channel
        mt = mesh_time
        if (mc or 1) * (mt or 1) > n_dev or (mc or 1) < 1 or (mt or 1) < 1:
            raise ValueError(
                f"mesh {mc or 1}x{mt or 1} needs {(mc or 1) * (mt or 1)} "
                f"devices, have {n_dev}")
        if mc is None:
            cap = n_dev // mt
            mc = max(d for d in range(1, max(min(channels, cap), 1) + 1)
                     if channels % d == 0)
        if mt is None:
            mt = n_dev // mc
        mesh = make_mesh(jax.devices()[: mc * mt], mc, mt)

        def make(ccfg):
            return ShardedChain(ccfg, mesh)
    return make(ChainConfig(
        channels=channels,
        input_format=cfg.input_format,
        output_format=cfg.output_format,
        input_rate=cfg.input_rate,
        target_rate=None if cfg.no_resample else cfg.target_rate,
        gain=cfg.gain,
        dc_block=cfg.dc_block,
        iq_correction=cfg.iq_correction,
        freq_shift_pre_hz=pre,
        freq_shift_post_hz=post,
        filters=tuple(cfg.filters),
        filter_method=cfg.filter_type or "auto",
        filter_fft_size=cfg.filter_fft_size,
        filter_taps=cfg.filter_taps,
        filter_transition_hz=cfg.transition_width_hz,
        filter_attenuation_db=cfg.attenuation_db or C.RESAMPLER_ATTENUATION_DB,
        agc_profile=agc_profile,
        agc_target=cfg.agc_target,
        target_block=block_size,
    ))


def _print_summary_table(title: str, items: dict, file=sys.stderr) -> None:
    if not items:
        return
    print(f"--- {title} ---", file=file)
    width = max(len(k) for k in items)
    for k, v in items.items():
        print(f"  {k:<{width}} : {v}", file=file)


def _progress(summary, elapsed, total_frames) -> None:
    mb = summary.bytes_out / 1e6
    rate = mb / elapsed if elapsed > 0 else 0.0
    msps = summary.frames_in / 1e6 / elapsed if elapsed > 0 else 0.0
    pct = ""
    if total_frames:
        pct = f" ({100.0 * summary.frames_in / total_frames:5.1f}%)"
    print(f"\r  {summary.frames_out} frames out{pct}  {mb:.1f} MB  "
          f"{rate:.1f} MB/s  {msps:.1f} Msps", end="", file=sys.stderr,
          flush=True)


_NUM_RE = None


def _fix_negative_numbers(argv: list[str]) -> list[str]:
    """argparse rejects '--freq-shift -50e3' and '--stopband -5e3:5e3'
    (a leading '-' looks like an option).  Merge numeric and LO:HI range
    values into '--opt=value' form."""
    global _NUM_RE
    import re
    if _NUM_RE is None:
        num = r"[+-]?\d+(\.\d*)?([eE][+-]?\d+)?"
        _NUM_RE = re.compile(rf"^-\d+(\.\d*)?([eE][+-]?\d+)?(:{num})?$")
    out = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if (tok.startswith("--") and "=" not in tok and i + 1 < len(argv)
                and _NUM_RE.match(argv[i + 1])):
            out.append(f"{tok}={argv[i + 1]}")
            i += 2
        else:
            out.append(tok)
            i += 1
    return out


def _check_preset_pseudo_flags(parser, argv) -> None:
    """The reference registers preset names as pseudo-flags that error
    helpfully when used as options (cli.c:38-45, 177-194): catch
    '--cu8-nrsc5' style mistakes before argparse's generic error."""
    flagged = [t for t in argv if t.startswith("--")]
    if not flagged:
        return
    try:
        presets, _ = load_presets()
    except Exception:
        return
    for tok in flagged:
        name = tok[2:].split("=")[0].lower()
        if name in presets:
            parser.error(
                f"'{tok}' is a preset name, not an option; presets are "
                f"applied with --preset {name}")


def main(argv=None) -> int:
    parser = build_parser()
    argv = _fix_negative_numbers(list(sys.argv[1:] if argv is None else argv))
    _check_preset_pseudo_flags(parser, argv)
    args = parser.parse_args(argv)

    if args.list_presets:
        presets, path = load_presets()
        print(f"Presets from {path}:" if path else "No presets file found.")
        for name, pr in sorted(presets.items()):
            print(f"  {name:<22} {pr.values.get('description', '')}")
        return 0

    from iq_tool_tpu.utils.log import configure as configure_log, get_logger
    configure_log(args.log_level)
    log = get_logger("cli")

    # SIGTERM behaves like Ctrl-C: finalize outputs, print partial summary
    # (signal_handler.c:53-147 semantics)
    import signal

    def _sigterm(_sig, _frm):
        raise KeyboardInterrupt
    try:
        signal.signal(signal.SIGTERM, _sigterm)
    except ValueError:
        pass  # not the main thread (library use)

    watchdog = None
    try:
        import dataclasses as _dc

        cfg = config_from_args(args)
        n_ch = max(1, args.channels)
        in_paths = expand_channel_paths(cfg.input_path, n_ch, "input")
        out_paths = expand_channel_paths(cfg.output_path, n_ch, "output")
        sources, sinks, infos = [], [], []
        for c in range(n_ch):
            src = get_input(cfg.input_type)
            src_cfg = (cfg if n_ch == 1
                       else _dc.replace(cfg, input_path=in_paths[c],
                                        output_path=out_paths[c]))
            infos.append(src.initialize(src_cfg, args))
            sources.append(src)
        source, info = sources[0], infos[0]
        if n_ch > 1:
            if source.is_realtime:
                raise ValueError("--channels needs file/network sources")
            for c, other in enumerate(infos[1:], 1):
                if (other.sample_rate != info.sample_rate
                        or other.sample_format != info.sample_format):
                    raise ValueError(
                        f"channel {c} ({in_paths[c]}) has rate/format "
                        f"{other.sample_rate}/{other.sample_format}, "
                        f"channel 0 has "
                        f"{info.sample_rate}/{info.sample_format}; "
                        "all channels must match")
        cfg.nco_shift_hz = info.nco_shift_hz
        resolve_rates(cfg, info.sample_rate, info.sample_format)
        validate(cfg)
        chain = build_chain(cfg, args.block_size, channels=n_ch,
                            mesh_channel=args.mesh_channel,
                            mesh_time=args.mesh_time,
                            time_fold=args.time_fold)
        for c in range(n_ch):
            snk = get_output(cfg.output_type)
            snk_cfg = (cfg if n_ch == 1
                       else _dc.replace(cfg, input_path=in_paths[c],
                                        output_path=out_paths[c]))
            snk.initialize(snk_cfg, args)
            sinks.append(snk)
        sink = sinks[0]

        # pre-stream I/Q calibration for rewindable sources
        # (iq_correct.c:237-302)
        initial_carry = None
        if chain and cfg.iq_correction:
            cals = [src.calibration_frames(C.IQ_FFT_SIZE) for src in sources]
            if all(c is not None for c in cals):
                import jax
                import numpy as _np

                from iq_tool_tpu.ops import convert, iq_balance
                wire = _np.stack([_np.frombuffer(c, chain.in_wire_dtype)
                                  for c in cals], axis=0)
                factors = jax.jit(lambda r: iq_balance.calibrate(
                    convert.to_cf32(r, chain.fmt_in, cfg.gain)))(wire)
                log.info("pre-stream I/Q calibration complete")
                initial_carry = chain.init_carry(n_ch)
                initial_carry["iq"] = initial_carry["iq"]._replace(
                    factors=factors)

        if source.is_realtime and not args.no_watchdog:
            import time as _time

            from iq_tool_tpu.utils.watchdog import Watchdog
            if hasattr(source, "heartbeat"):
                t_grace = _time.monotonic()
                watchdog = Watchdog(
                    lambda: max(getattr(source, "heartbeat", 0.0), t_grace))
                watchdog.start()

        summary_items = {"Input Type": cfg.input_type,
                         "Input Rate": f"{cfg.input_rate:.6g} Hz",
                         "Output Rate": f"{cfg.output_rate:.6g} Hz",
                         "Output Format": cfg.output_format}
        summary_items.update(source.summary())
        summary_items.update(sink.summary())
        if chain and chain.resampler:
            pl = chain.resampler.plan
            summary_items["Resample Ratio"] = f"{pl.p}/{pl.q} = {pl.p / pl.q:.9g}"
        if sink.requires_output_path:
            _print_summary_table("Configuration Summary", summary_items)

        engine = StreamEngine(chain, sources if n_ch > 1 else source,
                              sinks if n_ch > 1 else sink,
                              raw_passthrough=cfg.raw_passthrough,
                              progress=_progress if sink.requires_output_path else None,
                              progress_total_frames=info.total_frames,
                              checkpoint_path=args.checkpoint,
                              checkpoint_interval_sec=args.checkpoint_interval,
                              resume=args.resume,
                              initial_carry=initial_carry,
                              pipeline_depth=args.pipeline_depth)
        t0 = time.monotonic()
        try:
            if args.profile_dir:
                import jax
                with jax.profiler.trace(args.profile_dir):
                    s = engine.run()
                log.info("profiler trace written to %s", args.profile_dir)
            else:
                s = engine.run()
        finally:
            # finalize even when the stream errors: a partial RF64/WAV
            # with patched sizes beats hours of capture behind a
            # placeholder header; also stop the watchdog before it can
            # hard-exit a process that is already unwinding
            if watchdog:
                watchdog.stop()
            for snk in sinks:
                try:
                    snk.finalize()
                except Exception as fin_err:
                    log.warning("finalize failed: %s", fin_err)
            for src in sources:
                src.close()
        if sink.requires_output_path:
            print(file=sys.stderr)
            _print_summary_table("Final Summary", {
                "Duration": f"{s.duration_sec:.2f} s",
                "Frames In": s.frames_in,
                "Frames Out": s.frames_out,
                "Bytes Out": s.bytes_out,
                "Average Speed": f"{s.avg_mb_per_sec:.2f} MB/s",
                "Status": "interrupted" if s.interrupted else "complete",
            })
        _ = t0
        return 130 if s.interrupted else 0
    except (ValueError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
