"""Config-#4 regression, round 2: which STAGE interacts with wire-input?

Four variants of config #4 with one stage removed, each with wire input
on and off.  Fresh subprocess per measurement.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SRC = r'''
import sys, time, numpy as np
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from iq_tool_tpu.ops.fir_design import FilterRequest
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

drop = %(drop)r
kw = dict(input_format="cs16", output_format="cs16",
          input_rate=2_048_000.0, target_rate=1_488_375.0,
          channels=128, target_block=1 << 18,
          dc_block=True, iq_correction=True,
          freq_shift_pre_hz=100e3, freq_shift_post_hz=-50e3,
          filters=(FilterRequest("stop-range", 0.0, 10e3),),
          agc_profile="local")
if drop == "iq":
    kw["iq_correction"] = False
elif drop == "notch":
    kw["filters"] = ()
elif drop == "agc":
    kw["agc_profile"] = None
elif drop == "shifts":
    kw["freq_shift_pre_hz"] = 0.0
    kw["freq_shift_post_hz"] = 0.0
chain = Chain(ChainConfig(**kw))
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
wire = "off" if %(nowire)r else "on"
print(f"RESULT drop={drop or 'none':6s} wire={wire}: "
      f"{128 * chain.n_in / per / 1e6:.1f} Msps", flush=True)
'''


def main() -> int:
    for drop in ("iq", "notch"):
        for nowire in (False, True):
            env = dict(os.environ)
            if nowire:
                env["IQTOOL_DISABLE_WIRE_INPUT"] = "1"
            src = SRC % {"repo": REPO, "drop": drop, "nowire": nowire}
            r = subprocess.run([sys.executable, "-c", src], env=env,
                               capture_output=True, text=True, timeout=3600)
            out = [ln for ln in (r.stdout + r.stderr).splitlines()
                   if "RESULT" in ln]
            print("\n".join(out) or f"drop={drop} nowire={nowire}: rc="
                  f"{r.returncode} {(r.stderr or '')[-200:]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
