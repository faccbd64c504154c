"""Demo: invert a magnitude spectrogram with each algorithm and plot results.

Equivalent of the reference's demo script (/root/reference/main.py) without
the librosa dependency (not in this image): synthesizes a test signal, builds
a magnitude spectrogram, inverts it with any of the four algorithms, and
reports quality — optionally saving a matplotlib figure.

Usage:
    python main.py [griffin_lim|rtisi_la|admm|l_bfgs] [--plot out.png]
                   [--input in.wav] [--output recon.wav]

Audio I/O goes through the framework's own WAV codec
(specinv_tpu.io — native C++ with a numpy fallback), so no third-party
audio library is needed either way.
"""
import argparse
import sys
import time

import numpy as np


def make_demo_signal(sr=22050, seconds=4.0):
    """A few seconds of synthetic 'music': chirping partials + vibrato."""
    t = np.linspace(0, seconds, int(sr * seconds), dtype=np.float32)
    f0 = 220 * 2 ** (t / 4)  # rising octave sweep
    sig = np.zeros_like(t)
    for k, amp in ((1, 1.0), (2, 0.5), (3, 0.33), (4, 0.25)):
        sig += amp * np.sin(2 * np.pi * k * np.cumsum(f0) / sr + 0.1 * np.sin(2 * np.pi * 5 * t))
    sig *= np.exp(-0.2 * t)
    return (sig / np.abs(sig).max()).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("algorithm", nargs="?", default="griffin_lim",
                    choices=["griffin_lim", "rtisi_la", "admm", "l_bfgs"])
    ap.add_argument("--n-fft", type=int, default=1024)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--plot", type=str, default=None, help="save a figure here")
    ap.add_argument("--input", type=str, default=None,
                    help="invert this WAV file instead of the synthetic demo signal")
    ap.add_argument("--output", type=str, default=None,
                    help="write the reconstruction to this WAV file")
    args = ap.parse_args()

    import jax.numpy as jnp

    import specinv_tpu as si
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops import stft as stft_ops

    if args.input:
        from specinv_tpu.io import read_wav

        x, sr = read_wav(args.input)
        if x.ndim > 1:
            x = x.mean(axis=0)  # downmix to mono like the reference demo
        x = np.ascontiguousarray(x, np.float32)
    else:
        sr = 22050
        x = make_demo_signal(sr)
    window = np.hanning(args.n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(args.n_fft // 2 + 1, np.float32, window=window)
    wj = jnp.asarray(w)
    mag_tm = jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, wj))
    mag = jnp.swapaxes(mag_tm, -1, -2)  # (F, T) reference layout

    t0 = time.time()
    if args.algorithm == "griffin_lim":
        y = si.griffin_lim(mag, max_iter=args.max_iter, verbose=False, window=window)
    elif args.algorithm == "rtisi_la":
        y = si.RTISI_LA(mag, look_ahead=3, max_iter=25, verbose=False, window=window)
    elif args.algorithm == "admm":
        y = si.ADMM(mag, max_iter=args.max_iter, verbose=False, window=window)
    else:
        from specinv_tpu.ops.mel import log_mel_transform

        fn = log_mel_transform(n_fft=args.n_fft, n_mels=128, sample_rate=sr, window=window)
        mel = fn(jnp.asarray(x))
        y = si.L_BFGS(mel, fn, samples=(x.size,), outer_max_iter=args.max_iter // 10,
                      max_iter=10, line_search_fn="strong_wolfe", verbose=False)
    dt = time.time() - t0

    y = np.asarray(y)
    recon = jnp.abs(stft_ops.stft(jnp.asarray(y), cfg, wj))
    sc_db = float(si.sc(recon, mag_tm))
    print(f"{args.algorithm}: {dt:.2f}s, output {y.shape}, spectral convergence {sc_db:.2f} dB")

    if args.output:
        from specinv_tpu.io import write_wav

        write_wav(args.output, y, sr)
        print(f"wrote {args.output}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
        for ax, sig, title in ((axes[0], x, "original"), (axes[1], y, "reconstruction")):
            s = np.asarray(
                jnp.abs(stft_ops.stft(jnp.asarray(sig, dtype=np.float32), cfg, wj))
            ).T
            ax.imshow(20 * np.log10(s + 1e-6), origin="lower", aspect="auto",
                      extent=[0, len(sig) / sr, 0, sr / 2000])
            ax.set_ylabel(f"{title}\nkHz")
        axes[1].set_xlabel("seconds")
        fig.suptitle(f"{args.algorithm}: SC {sc_db:.1f} dB")
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
