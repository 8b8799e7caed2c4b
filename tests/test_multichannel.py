"""Multi-stream CLI (--channels / --mesh-*): BASELINE config #5 surface.

Contract: with one channel per device (--mesh-channel N) a batched run
writes, per channel, the SAME BYTES as N independent single-channel runs
(the matmul shapes are identical).  Batching >1 channel on one device
changes the matmul M dimension, which legitimately re-associates XLA's
f32 contractions: outputs then match within +-1 output code on a
<0.1% sliver of samples that sit exactly on a quantization boundary
(measured: max 1 code on 0.03% of samples for C=3).
"""

import numpy as np
import pytest

from iq_tool_tpu.cli import main


def _assert_lsb_close(got: bytes, want: bytes, label: str):
    a = np.frombuffer(got, np.int16).astype(np.int32)
    b = np.frombuffer(want, np.int16).astype(np.int32)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    d = np.abs(a - b)
    assert d.max() <= 1, f"{label}: max diff {d.max()} codes"
    assert (d != 0).mean() < 1e-3, f"{label}: {(d != 0).mean():%} differ"


def _write_noise(path, n_frames, seed):
    rng = np.random.default_rng(seed)
    raw = rng.integers(-2 ** 14, 2 ** 14, 2 * n_frames).astype(np.int16)
    path.write_bytes(raw.tobytes())


BASE = ["--raw-file-input-rate", "2048000",
        "--raw-file-input-sample-format", "cs16",
        "--output-rate", "1488375",
        "--freq-shift", "100e3", "--lowpass", "400e3",
        "--output-agc", "--block-size", "2048"]


def _single_runs(tmp_path, n_ch, n_frames, extra=()):
    refs = []
    for c in range(n_ch):
        inp = tmp_path / f"in_{c}.raw"
        if not inp.exists():
            _write_noise(inp, n_frames, seed=100 + c)
        outp = tmp_path / f"ref_{c}.raw"
        rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp)]
                  + BASE + list(extra))
        assert rc == 0
        refs.append(outp.read_bytes())
    return refs


def test_channels_template_matches_single_runs(tmp_path):
    n_ch, n_frames = 3, 16384 * 2 + 5000
    refs = _single_runs(tmp_path, n_ch, n_frames)
    rc = main(["-i", "raw-file", "-o", "raw",
               str(tmp_path / "in_{ch}.raw"), str(tmp_path / "out_{ch}.raw"),
               "--channels", str(n_ch)] + BASE)
    assert rc == 0
    for c in range(n_ch):
        got = (tmp_path / f"out_{c}.raw").read_bytes()
        _assert_lsb_close(got, refs[c], f"channel {c}")


def test_channels_comma_paths(tmp_path):
    n_ch, n_frames = 2, 16384 + 100
    refs = _single_runs(tmp_path, n_ch, n_frames)
    ins = ",".join(str(tmp_path / f"in_{c}.raw") for c in range(n_ch))
    outs = ",".join(str(tmp_path / f"o{c}.raw") for c in range(n_ch))
    rc = main(["-i", "raw-file", "-o", "raw", ins, outs,
               "--channels", str(n_ch)] + BASE)
    assert rc == 0
    for c in range(n_ch):
        _assert_lsb_close((tmp_path / f"o{c}.raw").read_bytes(), refs[c],
                          f"channel {c}")


def test_channels_truncate_to_shortest(tmp_path):
    """Lockstep batch ends at the shortest channel."""
    _write_noise(tmp_path / "in_0.raw", 16384 * 2, seed=100)
    _write_noise(tmp_path / "in_1.raw", 16384 + 777, seed=101)
    rc = main(["-i", "raw-file", "-o", "raw",
               str(tmp_path / "in_{ch}.raw"), str(tmp_path / "out_{ch}.raw"),
               "--channels", "2"] + BASE)
    assert rc == 0
    shortest = 16384 + 777
    want = shortest * 11907 // 16384
    for c in range(2):
        got = len((tmp_path / f"out_{c}.raw").read_bytes()) // 4
        assert got == want, (c, got, want)


def test_channels_sharded_mesh_matches_single_runs(tmp_path):
    """--channels over a (channel, time) device mesh (ShardedChain CLI
    path).  No DC blocker (see tests/test_sharded.py exactness note), so
    every byte matches the unsharded single-channel runs."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n_ch, n_frames = 4, 16384 * 2 + 3000
    refs = _single_runs(tmp_path, n_ch, n_frames)
    rc = main(["-i", "raw-file", "-o", "raw",
               str(tmp_path / "in_{ch}.raw"), str(tmp_path / "mesh_{ch}.raw"),
               "--channels", str(n_ch),
               "--mesh-channel", "4", "--mesh-time", "2"] + BASE)
    assert rc == 0
    for c in range(n_ch):
        got = (tmp_path / f"mesh_{c}.raw").read_bytes()
        assert got == refs[c], f"channel {c} diverged on the mesh"


def test_channels_checkpoint_resume(tmp_path):
    """Interrupted multi-channel job resumed via --checkpoint produces the
    same bytes per channel as an uninterrupted batch run."""
    n_ch, n_frames = 2, 16384 * 4
    for c in range(n_ch):
        _write_noise(tmp_path / f"in_{c}.raw", n_frames, seed=300 + c)
    args = ["-i", "raw-file", "-o", "raw", "--channels", str(n_ch)] + BASE

    assert main([str(tmp_path / "in_{ch}.raw"),
                 str(tmp_path / "full_{ch}.raw")] + args) == 0

    # interrupted first half
    for c in range(n_ch):
        half = (tmp_path / f"in_{c}.raw").read_bytes()[: n_frames // 2 * 4]
        (tmp_path / f"half_{c}.raw").write_bytes(half)
    ck = tmp_path / "mc.ckpt"
    assert main([str(tmp_path / "half_{ch}.raw"),
                 str(tmp_path / "part_{ch}.raw"),
                 "--checkpoint", str(ck)] + args) == 0
    assert ck.exists()
    assert main([str(tmp_path / "in_{ch}.raw"),
                 str(tmp_path / "part_{ch}.raw"),
                 "--checkpoint", str(ck), "--resume"] + args) == 0
    for c in range(n_ch):
        assert ((tmp_path / f"part_{c}.raw").read_bytes()
                == (tmp_path / f"full_{c}.raw").read_bytes()), f"ch {c}"


def test_channels_rejects_wrong_path_count(tmp_path, capsys):
    _write_noise(tmp_path / "a.raw", 1000, seed=1)
    _write_noise(tmp_path / "b.raw", 1000, seed=2)
    rc = main(["-i", "raw-file", "-o", "raw",
               str(tmp_path / "a.raw") + "," + str(tmp_path / "b.raw"),
               str(tmp_path / "oa.raw") + "," + str(tmp_path / "ob.raw"),
               "--channels", "3"] + BASE)
    assert rc == 1
    assert "comma-separated" in capsys.readouterr().err


def test_mesh_time_defaults_to_channel_fit(tmp_path):
    """--mesh-time 2 on ONE channel must build a 1x2 mesh over a device
    subset (not all-devices/2 x 2, which 1 channel cannot fill), and a
    checkpointed sharded run must resume byte-identically, including a
    non-block-aligned EOS cut."""
    n = 16384 * 6 - 3000
    inp = tmp_path / "in.raw"
    _write_noise(inp, n, seed=7)
    base = ["-i", "raw-file", "-o", "raw",
            "--raw-file-input-rate", "2048000",
            "--raw-file-input-sample-format", "cs16",
            "--output-rate", "1488375", "--dc-block",
            "--freq-shift", "50e3", "--lowpass", "400e3",
            "--mesh-time", "2", "--force-overwrite"]
    full = tmp_path / "full.raw"
    assert main([str(inp), str(full)] + base) == 0

    half = tmp_path / "half.raw"
    half.write_bytes(inp.read_bytes()[: (n // 2) * 4])
    part = tmp_path / "part.raw"
    ck = tmp_path / "state.ckpt"
    assert main([str(half), str(part)] + base
                + ["--checkpoint", str(ck)]) == 0
    assert main([str(inp), str(part)] + base
                + ["--checkpoint", str(ck), "--resume"]) == 0
    assert part.read_bytes() == full.read_bytes()
