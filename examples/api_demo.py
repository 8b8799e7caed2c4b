"""Library-level usage of iq_tool_tpu (no CLI).

Builds the NRSC-5 chain, streams synthetic blocks through it, and shows
the multi-channel + sharded variants.  Run: python examples/api_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iq_tool_tpu.ops.fir_design import FilterRequest
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig


def main():
    # --- single-stream chain ------------------------------------------------
    chain = Chain(ChainConfig(
        input_format="cs16", output_format="cu8",
        input_rate=2_048_000.0, target_rate=1_488_375.0,
        dc_block=True,
        freq_shift_pre_hz=-100_000.0,
        filters=[FilterRequest("lowpass", 400_000.0)],
        agc_profile="digital",
    ))
    print(f"block geometry: {chain.n_in} frames in -> {chain.n_out} out")

    rng = np.random.default_rng(0)
    carry = chain.init_carry()
    for i in range(4):
        raw = rng.integers(-2 ** 15, 2 ** 15,
                           (1, chain.in_wire_len)).astype(np.int16)
        carry, out = chain.step(carry, raw, np.False_)
    print(f"out block: {np.asarray(out).shape} {np.asarray(out).dtype}")

    # --- 64 independent channels in one step (config #5, single chip) -------
    chain64 = Chain(ChainConfig(
        input_format="cs16", output_format="cs16",
        input_rate=2_048_000.0, target_rate=1_488_375.0,
        channels=64, target_block=16384,
    ))
    raw = rng.integers(-2 ** 15, 2 ** 15,
                       (64, chain64.in_wire_len)).astype(np.int16)
    carry = chain64.init_carry()
    carry, out = chain64.step(carry, raw, np.False_)
    print(f"64-channel out: {np.asarray(out).shape}")

    # --- sharded over a device mesh (run with multiple devices) -------------
    import jax
    if len(jax.devices()) > 1:
        from iq_tool_tpu.parallel import ShardedChain, make_mesh
        mesh = make_mesh(jax.devices())
        sc = ShardedChain(ChainConfig(
            input_format="cs16", output_format="cs16",
            input_rate=2_048_000.0, target_rate=1_536_000.0,
            target_block=4096), mesh)
        raw = rng.integers(-2 ** 15, 2 ** 15,
                           (1, sc.in_wire_len)).astype(np.int16)
        carry = sc.init_carry()
        carry, out = sc.step(carry, raw, np.False_)
        print(f"sharded out over {mesh.shape}: {out.shape}")


if __name__ == "__main__":
    main()
