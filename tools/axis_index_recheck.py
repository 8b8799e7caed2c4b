"""Re-test the round-2 'unused axis_index' forensic claim (round 4).

Round 2 concluded that a traced-but-unused ``jax.lax.axis_index`` was
"the ONE jaxpr difference" making axon reject compiled sharded
programs, and parallel/sharded.py lazily materializes the index on that
basis.  Round 4 found the REAL process-poisoner (eager complex64 in
_carry_struct, see docs/PERF.md) — which confounded every bisect run in
the same process after a poison.  This script re-runs the minimal
claim in a CLEAN process: a shard_map program over a 1x1 mesh that
traces axis_index('time') and never consumes it.

If it PASSES, the lazy-index dance is harmless but its stated
justification is wrong; the comments should say "kept as a
belt-and-braces measure, original forensics confounded".
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from iq_tool_tpu.parallel.sharded import make_mesh

    mesh = make_mesh(jax.devices()[:1], 1, 1)

    def body(x):
        idx = jax.lax.axis_index("time")     # traced, never consumed
        del idx
        return x * 2.0

    from jax.experimental.shard_map import shard_map
    f = jax.jit(shard_map(body, mesh=mesh,
                          in_specs=P("channel", "time"),
                          out_specs=P("channel", "time")))
    x = np.arange(256, dtype=np.float32).reshape(1, 256)
    try:
        got = np.asarray(jax.device_get(f(x)))
        ok = bool(np.all(got == x * 2.0))
        print(f"unused axis_index program: {'PASS' if ok else 'VALUEFAIL'}")
        return 0 if ok else 1
    except Exception as e:
        print(f"unused axis_index program: FAIL :: {str(e)[:200]}")
        return 1


if __name__ == "__main__":
    sys.exit(main())
