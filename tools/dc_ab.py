"""Interleaved A/B of the DC in-subtile prefix engine (cumsum vs matmul).

Back-to-back bench.py runs see real tunnel-condition drift (same binary
measured 4.2-6.4 Gsps across an afternoon), so variant comparisons must
interleave INSIDE one process: both variants are traced and compiled
first (the _DC_PREFIX_CUMSUM module flag is read at trace time), then
timed alternately A/B/A/B with bench.py's forced-execution scheme
(difference of two in-jit scan lengths, checksum readback).

    python tools/dc_ab.py [--reps 5] [--channels 128] [--block 262144]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IN_RATE, OUT_RATE = 2_048_000.0, 1_488_375.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--block", type=int, default=1 << 18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iq_tool_tpu.ops import pallas_kernels
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(
        input_format="cs16", output_format="cs16",
        input_rate=IN_RATE, target_rate=OUT_RATE,
        channels=args.channels, dc_block=True,
        freq_shift_pre_hz=100_000.0,
        filters=[FilterRequest("lowpass", 400_000.0)],
        target_block=args.block)

    rng = np.random.default_rng(0)
    k1, k2 = 3, 13
    variants = {}
    for name in ("cumsum", "matmul"):
        # trace-time switch: each Chain below re-traces under the flag
        pallas_kernels.set_dc_prefix_engine(name)
        chain = Chain(cfg)
        raw = rng.integers(-2 ** 15, 2 ** 15,
                           (args.channels, chain.in_wire_len)).astype(np.int16)
        raw_dev = jax.device_put(raw)

        def make(n_steps, chain=chain):
            @jax.jit
            def run(raw_in):
                def body(carry, _):
                    carry, out = chain._step(carry, raw_in, jnp.bool_(False))
                    return carry, jnp.sum(out[:1, :8].astype(jnp.float32))
                carry0 = chain._build_carry(args.channels)
                _, sums = jax.lax.scan(body, carry0, None, length=n_steps)
                return jnp.sum(sums)
            return run

        f1, f2 = make(k1), make(k2)
        float(f1(raw_dev))   # compile + warm
        float(f2(raw_dev))
        variants[name] = (f1, f2, raw_dev, chain.n_in)
        print(f"compiled {name}", file=sys.stderr)

    best = {name: None for name in variants}
    for rep in range(args.reps):
        for name, (f1, f2, raw_dev, n_in) in variants.items():
            t0 = time.perf_counter()
            float(f1(raw_dev))
            t1 = time.perf_counter()
            float(f2(raw_dev))
            t2 = time.perf_counter()
            per = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
            msps = args.channels * n_in / per / 1e6
            if best[name] is None or msps > best[name]:
                best[name] = msps
            print(f"rep {rep} {name}: {msps:.1f} Msps", file=sys.stderr)
    print(json.dumps({k: round(v, 2) for k, v in best.items()}))


if __name__ == "__main__":
    main()
