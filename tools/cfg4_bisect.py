"""Bisect the config-#4 regression (1738 r2 -> 1160 r3) on hardware.

Runs the BASELINE config #4 bench in fresh subprocesses, toggling each
round-3 feature off in turn.  Usage: python tools/cfg4_bisect.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SRC = r'''
import sys, time, numpy as np
sys.path.insert(0, %(repo)r)
import os
variant = %(variant)r
if variant == "half_advance_only":
    # force the round-2 single half-advance schedule: the wrapper makes
    # osfft_apply decline every 3b/2 call so the scheduler falls through
    from iq_tool_tpu.ops import pallas_kernels as _pk
    _orig_osfft = _pk.osfft_apply
    def _half_only(xr, xi, h_key, b, advance, **kw):
        if advance != b:
            return None
        return _orig_osfft(xr, xi, h_key, b, advance=advance, **kw)
    _pk.osfft_apply = _half_only
import jax, jax.numpy as jnp
from iq_tool_tpu.ops.fir_design import FilterRequest
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

IN_RATE, OUT_RATE = 2_048_000.0, 1_488_375.0
cfg = ChainConfig(input_format="cs16", output_format="cs16",
                  input_rate=IN_RATE, target_rate=OUT_RATE,
                  channels=128, target_block=1 << 18,
                  dc_block=True, iq_correction=True,
                  freq_shift_pre_hz=100e3, freq_shift_post_hz=-50e3,
                  filters=(FilterRequest("stop-range", 0.0, 10e3),),
                  agc_profile="local")
chain = Chain(cfg)
rng = np.random.default_rng(0)
raw = rng.integers(-2**15, 2**15, (128, chain.in_wire_len)).astype(np.int16)
raw_dev = jax.device_put(raw)

def make(n_steps):
    @jax.jit
    def run(raw_in):
        def body(carry, _):
            carry, out = chain._step(carry, raw_in, jnp.bool_(False))
            return carry, jnp.sum(out[:1, :8].astype(jnp.float32))
        carry0 = chain._build_carry(128)
        _, sums = jax.lax.scan(body, carry0, None, length=n_steps)
        return jnp.sum(sums)
    return run

k1, k2 = 3, 13
f1, f2 = make(k1), make(k2)
float(f1(raw_dev)); float(f2(raw_dev))
per = None
for _ in range(3):
    t0 = time.perf_counter(); float(f1(raw_dev))
    t1 = time.perf_counter(); float(f2(raw_dev))
    t2 = time.perf_counter()
    d = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
    per = d if per is None else min(per, d)
print(f"RESULT {variant} {128 * chain.n_in / per / 1e6:.1f} Msps", flush=True)
'''

VARIANTS = [
    ("baseline", {}),
    ("half_advance_only", {}),
    ("no_post_kernel", {"IQTOOL_DISABLE_POST_KERNEL": "1"}),
    ("no_wire_input", {"IQTOOL_DISABLE_WIRE_INPUT": "1"}),
    ("no_both", {"IQTOOL_DISABLE_POST_KERNEL": "1",
                 "IQTOOL_DISABLE_WIRE_INPUT": "1"}),
]


def main() -> int:
    for name, env in VARIANTS:
        e = dict(os.environ, **env)
        src = SRC % {"repo": REPO, "variant": name}
        r = subprocess.run([sys.executable, "-c", src], env=e,
                           capture_output=True, text=True, timeout=3600)
        out = [ln for ln in (r.stdout + r.stderr).splitlines()
               if "RESULT" in ln or "Error" in ln]
        print("\n".join(out) or f"{name}: rc={r.returncode} "
              + (r.stderr or "")[-200:], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
