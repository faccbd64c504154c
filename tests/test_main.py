"""Smoke tests for the demo script (main.py).

The reference ships a demo (/root/reference/main.py) that loads audio,
inverts, and plots; ours mirrors it librosa-free.  These tests drive
main.main() in-process (conftest already pins the CPU platform) through
the three user paths: synthetic demo, WAV-file round trip, and the plot.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import main as demo  # noqa: E402


def _run(argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["main.py"] + argv)
    return demo.main()


def test_demo_synth_to_wav(tmp_path, monkeypatch, capsys):
    out = tmp_path / "recon.wav"
    rc = _run(
        ["griffin_lim", "--n-fft", "512", "--max-iter", "8",
         "--output", str(out)], monkeypatch,
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "spectral convergence" in text
    from specinv_tpu.io import read_wav

    y, sr = read_wav(str(out))
    assert sr == 22050
    # mono demo signal, a few seconds, finite audio
    assert y.size > sr and np.isfinite(y).all()


def test_demo_input_wav_round_trip(tmp_path, monkeypatch, capsys):
    from specinv_tpu.io import read_wav, write_wav

    sr = 22050
    t = np.linspace(0, 1.0, sr, dtype=np.float32)
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    src = tmp_path / "in.wav"
    out = tmp_path / "out.wav"
    write_wav(str(src), x, sr)

    rc = _run(
        ["admm", "--n-fft", "512", "--max-iter", "8",
         "--input", str(src), "--output", str(out)], monkeypatch,
    )
    assert rc == 0
    assert "admm:" in capsys.readouterr().out
    y, sr2 = read_wav(str(out))
    assert sr2 == sr and y.size >= x.size - 512 and np.isfinite(y).all()


def test_demo_plot(tmp_path, monkeypatch):
    pytest.importorskip("matplotlib")
    png = tmp_path / "fig.png"
    rc = _run(
        ["griffin_lim", "--n-fft", "512", "--max-iter", "4",
         "--plot", str(png)], monkeypatch,
    )
    assert rc == 0
    assert png.stat().st_size > 1000  # a real image, not an empty file
