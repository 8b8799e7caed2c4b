"""AGC profiles: convergence, clipping ratchet, lock/hang behavior."""

import numpy as np

from iq_tool_tpu.ops import agc


def _run(profile, x_blocks, rate=1_000_000.0, target=None):
    cfg = agc.AgcConfig.make(profile, rate, target)
    st = agc.init(x_blocks[0].shape[0])
    outs = []
    for xb in x_blocks:
        y, st = agc.apply(xb, st, cfg)
        outs.append(np.asarray(y))
    return outs, st


def _tone_blocks(amp, n_blocks=8, n=16384, c=1):
    t = np.arange(n_blocks * n)
    x = (amp * np.exp(2j * np.pi * 0.01 * t)).astype(np.complex64)
    return [np.tile(x[i * n:(i + 1) * n], (c, 1)) for i in range(n_blocks)]


def test_local_converges_to_target():
    outs, st = _run("local", _tone_blocks(0.05, n_blocks=10))
    rms = np.sqrt(np.mean(np.abs(outs[-1]) ** 2))
    assert abs(rms - 0.5) < 0.05          # AGC_LOCAL_TARGET = 0.5
    assert float(np.asarray(st.gain)[0]) > 5.0


def test_dx_slower_than_local():
    _, st_dx = _run("dx", _tone_blocks(0.05, n_blocks=3))
    _, st_lo = _run("local", _tone_blocks(0.05, n_blocks=3))
    # dx bandwidth is 100x smaller: gain must have moved much less
    assert np.asarray(st_lo.gain)[0] > np.asarray(st_dx.gain)[0]


def test_digital_scan_applies_running_gain():
    outs, st = _run("digital", _tone_blocks(0.1, n_blocks=1))
    peak = np.abs(outs[0]).max()
    assert abs(peak - 0.9) < 0.02          # target/peak gain applied at once
    assert not bool(np.asarray(st.locked)[0])


def test_digital_locks_after_scan_window():
    # 2 s at 1 MHz = 2 M samples; blocks of 16384 -> lock after ~123 blocks
    blocks = _tone_blocks(0.1, n_blocks=130)
    _, st = _run("digital", blocks)
    assert bool(np.asarray(st.locked)[0])


def test_digital_clip_ratchet():
    cfg = agc.AgcConfig.make("digital", 1_000_000.0)
    st = agc.init(1)
    st = st._replace(locked=np.array([True]), gain=np.array([10.0], np.float32))
    x = (0.5 * np.ones((1, 4096))).astype(np.complex64)  # out peak 5.0 -> clip
    y, st2 = agc.apply(x, st, cfg)
    g = float(np.asarray(st2.gain)[0])
    assert abs(g - 0.99 / 0.5) < 1e-3      # 0.99/block_peak
    # the RATCHETED gain applies to this block: peak 0.5 * 0.99/0.5
    assert abs(np.abs(np.asarray(y)).max() - 0.99) < 1e-3


def test_digital_creep_after_hang():
    rate = 100_000.0
    cfg = agc.AgcConfig.make("digital", rate)
    st = agc.init(1)
    st = st._replace(locked=np.array([True]), gain=np.array([1.0], np.float32))
    weak = (0.01 * np.ones((1, 16384))).astype(np.complex64)
    gains = []
    for _ in range(40):                    # 40*16384 samples = 6.5 s > 4 s hang
        _, st = agc.apply(weak, st, cfg)
        gains.append(float(np.asarray(st.gain)[0]))
    assert gains[0] == 1.0                 # still hanging
    assert gains[-1] > 1.0                 # creeping up after hang window
    assert gains[-1] < 1.05                # slowly (1.0005/block)


def test_reset():
    st = agc.init(2)
    st = st._replace(locked=np.array([True, True]),
                     gain=np.array([5.0, 3.0], np.float32))
    r = agc.reset(st)
    assert np.all(np.asarray(r.gain) == 1.0)
    assert not np.any(np.asarray(r.locked))


def test_digital_fused_xla_decision_equivalence(monkeypatch):
    """Adversarial threshold-tie stream: the fused post-kernel path and
    the XLA fallback must make bitwise-identical digital lock/clip/creep
    decisions.  Both paths now measure the block peak PRE-post-NCO
    (rotation preserves magnitude in exact math; pinning the measurement
    point pins the float tie-breaks at agc.c:180-209's hard thresholds),
    so the carried AgcState must match exactly — one flipped decision
    would propagate a different gain forever."""
    import jax

    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    rate = 16384.0
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=rate, target_rate=None,
                      freq_shift_post_hz=1000.0,
                      agc_profile="digital", target_block=16384)
    probe = Chain(cfg)
    n = probe.in_wire_len // 2            # frames per block

    def block(code: int) -> np.ndarray:
        """Constant-magnitude block: I = code, Q = 0 -> exact peak."""
        raw = np.zeros((1, 2 * n), np.int16)
        raw[0, 0::2] = code
        return raw

    # locked gain will be f32(0.9) / 0.5; craft peaks whose product with
    # it sits within ~1 ulp of the clip (1.0) and strong (0.675)
    # thresholds, plus a weak run long enough to reach the creep branch
    g_lock = np.float32(0.9) / np.float32(0.5)
    clip_code = int(round(32768.0 / float(g_lock)))
    strong_code = int(round(0.675 / float(g_lock) * 32768.0))
    codes = ([16384] * 4                                   # scan -> lock
             + [clip_code - 1, clip_code, clip_code + 1]   # clip ties
             + [strong_code - 1, strong_code, strong_code + 1]
             + [2000] * 6                                  # hang -> creep
             + [clip_code, clip_code - 1])
    raws = [block(c) for c in codes]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        states, outs = [], []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            states.append(jax.device_get(carry["agc"]))
            outs.append(np.asarray(jax.device_get(o)))
        return states, outs

    xla_states, xla_outs = run()
    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    fused_states, fused_outs = run()

    for i, (a, b) in enumerate(zip(xla_states, fused_states)):
        for f in a._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                err_msg=f"block {i} (code {codes[i]}) field {f}")
    # and the decisions actually exercised the branches
    assert bool(np.asarray(xla_states[3].locked)[0])
    assert not bool(np.asarray(xla_states[2].locked)[0])
    # outputs stay within the accepted fused-vs-XLA quantize contract
    d = np.abs(np.concatenate(xla_outs, -1).astype(np.int32)
               - np.concatenate(fused_outs, -1).astype(np.int32))
    assert d.max() <= 1, d.max()
