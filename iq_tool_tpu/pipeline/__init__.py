"""Pipeline layer: the compiled block-graph replacing the reference's
5-8-thread stage pipeline (SURVEY.md section 2f mapping).

`chain` builds one jit-compiled ``step(carry, raw_block, reset) ->
(carry, out_block)`` from a ChainConfig; `runtime` is the host-side
streaming engine (I/O, framing, back-pressure, EOS/trim, progress).
"""
