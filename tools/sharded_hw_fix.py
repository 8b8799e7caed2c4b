"""Axon sharded-rejection fix ladder (VERDICT r2 item 3, r3 item 4).

Round-2 forensics (docs/PERF.md "axon-tunnel sharded-program rejection"):
any full ShardedChain.step fails UNIMPLEMENTED on the axon backend at
first readback, while a hand-inlined reconstruction whose compiled
artifacts differ ONLY in debug-location bytes compiles and executes.

Round-4 NEW LEAD: this script's old harness died at
``device_get(sc.init_carry())`` — BEFORE any step ran.  A trivial
zeros-building jit with NamedSharding out_shardings already fails at
readback, so the broken piece may be the TRANSFER of sharding-annotated
arrays, not program execution.  The ladder now separates the two:

  D. minimal: jit zeros + out_shardings=NamedSharding(1x1) -> device_get
     (control: same jit without out_shardings)
  E. transfer workarounds for D's array: device_put to a
     SingleDeviceSharding first; jnp.copy through a plain jit
  F. full sc.step on a 1x1 mesh, HOST-BUILT numpy carries (no sharded
     readback anywhere before), output resharded to single-device
     BEFORE device_get  -> if PASS, the production workaround is an
     output reshard in StreamEngine
  A. baseline sc.step + direct device_get (re-verify the raw failure)
  B. loc-stripped StableHLO compiled via the PJRT client (debug-loc
     hypothesis; harness now builds carries host-side so the test
     actually reaches the compile)
  C. B but keeping loc(unknown) anchors

Run on the TPU host: python tools/sharded_hw_fix.py

NOTE each phase uses a FRESH subprocess: one rejected program poisons
later compiles in the same process (round-2 finding).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PHASE_SRC = r'''
import sys, time, numpy as np
sys.path.insert(0, %(repo)r)
phase = %(phase)r
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, SingleDeviceSharding, PartitionSpec as P
from iq_tool_tpu.ops.fir_design import FilterRequest
from iq_tool_tpu.parallel.sharded import ShardedChain, make_mesh
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

t0 = time.time()
dev = jax.devices()[0]

if phase == "D":
    mesh = make_mesh(jax.devices()[:1], 1, 1)
    sh = NamedSharding(mesh, P("channel", "time"))
    try:
        x = jax.jit(lambda: jnp.zeros((1, 256), jnp.float32))()
        np.asarray(jax.device_get(x))
        print("D control (no out_shardings): PASS", flush=True)
    except Exception as e:
        print(f"D control: FAIL :: {str(e)[:160]}", flush=True)
    try:
        x = jax.jit(lambda: jnp.zeros((1, 256), jnp.float32),
                    out_shardings=sh)()
        np.asarray(jax.device_get(x))
        print("D sharded zeros readback: PASS", flush=True)
    except Exception as e:
        print(f"D sharded zeros readback: FAIL :: {str(e)[:160]}", flush=True)
    sys.exit(0)

if phase == "E":
    mesh = make_mesh(jax.devices()[:1], 1, 1)
    sh = NamedSharding(mesh, P("channel", "time"))
    x = jax.jit(lambda: jnp.arange(256, dtype=jnp.float32).reshape(1, 256),
                out_shardings=sh)()
    try:
        y = jax.device_put(x, SingleDeviceSharding(dev))
        got = np.asarray(jax.device_get(y))
        ok = got[0, 5] == 5.0
        print(f"E device_put reshard: {'PASS' if ok else 'VALUEFAIL'}",
              flush=True)
    except Exception as e:
        print(f"E device_put reshard: FAIL :: {str(e)[:160]}", flush=True)
    try:
        y = jax.jit(jnp.copy, out_shardings=SingleDeviceSharding(dev))(x)
        got = np.asarray(jax.device_get(y))
        ok = got[0, 7] == 7.0
        print(f"E jit-copy reshard: {'PASS' if ok else 'VALUEFAIL'}",
              flush=True)
    except Exception as e:
        print(f"E jit-copy reshard: FAIL :: {str(e)[:160]}", flush=True)
    sys.exit(0)

cfg = ChainConfig(input_format="cs16", output_format="cs16",
                  input_rate=2_048_000.0, target_rate=1_488_375.0,
                  dc_block=True, freq_shift_pre_hz=100e3,
                  filters=(FilterRequest("lowpass", 400e3),),
                  target_block=16384)
sc = ShardedChain(cfg, make_mesh(jax.devices()[:1], 1, 1))
rng = np.random.default_rng(3)
raw = rng.integers(-2**14, 2**14, (1, sc.n_in * 2)).astype(np.int16)

# HOST-BUILT carry (numpy zeros via the carry struct): no sharded
# readback happens before the experiment itself
def host_carry():
    out = {}
    for name, spec in sc._carry_struct().items():
        if spec[0] == "halo":
            out[name] = np.zeros((sc.cfg.channels, sc.t * spec[1]),
                                 np.float32)
        else:
            # plain (unsharded) jit + readback works on axon; only
            # sharding-annotated outputs are under suspicion
            out[name] = jax.tree_util.tree_map(
                np.asarray,
                jax.device_get(jax.jit(lambda s=spec:
                                       s[1](sc.cfg.channels))()))
    return out

def oracle():
    ref_chain = Chain(ChainConfig(**{**cfg.__dict__,
                                     "target_block": sc.local.cfg.target_block}))
    c = ref_chain.init_carry(1)
    c, o = ref_chain.step(c, raw, np.False_)
    return np.asarray(jax.device_get(o))

carry = host_carry()

if phase in ("A", "F"):
    try:
        c, o = sc.step(carry, raw, np.bool_(False))
        if phase == "F":
            o = jax.device_put(o, SingleDeviceSharding(dev))
        got = np.asarray(jax.device_get(o))
        want = oracle()
        ok = np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 4
        print(f"PHASE {phase}: {'PASS' if ok else 'VALUEFAIL'} "
              f"{time.time()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"PHASE {phase}: FAIL {time.time()-t0:.0f}s :: {str(e)[:200]}",
              flush=True)
    sys.exit(0)

# phases B/C: lower, strip locations from the StableHLO text, compile
# through the PJRT client, execute with flat buffers
import re
lowered = jax.jit(lambda c, r, f: sc.step(c, r, f)).lower(
    carry, raw, np.bool_(False))
text = lowered.as_text()
if phase == "B":
    # every inline loc(...) reference AND all #loc definitions
    text = re.sub(r" loc\(#loc\d*\)", "", text)
    text = re.sub(r"^#loc\d* = .*$", "", text, flags=re.M)
    text = re.sub(r"^#loc = .*$", "", text, flags=re.M)
    text = re.sub(r" loc\(unknown\)", "", text)
else:
    # keep loc(unknown) anchors, drop named/file locations only
    text = re.sub(r"#loc\d* = loc\(.*\)$",
                  lambda m: m.group(0).split(" = ")[0] + " = loc(unknown)",
                  text, flags=re.M)
client = dev.client
try:
    from jax._src.interpreters import mlir
    from jax._src.lib import xla_client as xc
    from jaxlib.mlir import ir
    with mlir.make_ir_context():
        module = ir.Module.parse(text)
        opts = xc.CompileOptions()
        dl = xc.DeviceList((dev,))
        exe = client.compile_and_load(module, dl, opts)
    print(f"PHASE {phase} compile: OK {time.time()-t0:.0f}s", flush=True)
except Exception as e:
    print(f"PHASE {phase} compile: FAIL {time.time()-t0:.0f}s :: "
          f"{str(e)[:160]}", flush=True)
    sys.exit(0)

flat, treedef = jax.tree_util.tree_flatten((carry, raw, np.bool_(False)))
bufs = [client.buffer_from_pyval(np.asarray(x)) for x in flat]
t1 = time.time()
try:
    outs = exe.execute(bufs)
    host = [np.asarray(o) for o in outs]
    want = oracle()
    got = next(h for h in host if h.dtype == np.int16)
    ok = np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 4
    print(f"PHASE {phase} execute: {'PASS' if ok else 'VALUEFAIL'} "
          f"{time.time()-t1:.0f}s", flush=True)
except Exception as e:
    print(f"PHASE {phase} execute: FAIL {time.time()-t1:.0f}s :: "
          f"{str(e)[:160]}", flush=True)
'''


def run_phase(phase: str, timeout: float = 3600.0) -> str:
    src = PHASE_SRC % {"repo": REPO, "phase": phase}
    r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                       text=True, timeout=timeout)
    out = (r.stdout + r.stderr).strip()
    print(out)
    return out


def main() -> int:
    phases = sys.argv[1:] or ["D", "E", "F", "A", "B", "C"]
    results = {}
    for phase in phases:
        print(f"--- phase {phase} (fresh process) ---", flush=True)
        try:
            results[phase] = run_phase(phase)
        except subprocess.TimeoutExpired:
            results[phase] = "TIMEOUT"
            print("TIMEOUT")
    return 0


if __name__ == "__main__":
    sys.exit(main())
