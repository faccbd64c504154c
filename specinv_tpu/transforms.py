"""Public STFT analysis/synthesis wrappers in the reference's layout.

The inversion entry points consume magnitudes the user usually produced with
``torch.stft``; these wrappers expose the SAME transform pair this library
inverts against — ``stft`` matches ``torch.stft(..., return_complex=True)``
(golden-tested to float tolerance), ``istft`` matches the reference's
``_istft`` synthesis (/root/reference/torch_specinv/methods.py:135-150,
symmetric conv-transpose trim — NOT torch.istft's ``length`` logic), so
``istft(stft(x)) == x`` up to envelope edge effects.

Layout: ``(F, T)`` / ``(B, F, T)`` at this boundary (frequency-major, like
torch); internally everything is time-major on the 128-lane axis
(see ops/stft.py).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import _as_numpy_window, canonicalize
from .ops import fourier
from .ops import stft as stft_ops


def _real_dtype(dtype) -> np.dtype:
    """fourier's complex->real mapping, plus float32 for non-float input."""
    d = np.dtype(fourier._real_dtype(dtype))
    return d if d.kind == "f" else np.dtype("float32")


def stft(
    x,
    n_fft: int,
    backend: str = "auto",
    precision=None,
    **stft_kwargs,
):
    """Complex STFT of ``x`` (..., L) -> (..., F, T), torch.stft semantics.

    Accepts the torch.stft kwarg surface (``hop_length``, ``win_length``,
    ``window``, ``center``, ``pad_mode``, ``normalized``, ``onesided``) with
    the same default-inference rules as the inversion entry points, plus this
    library's ``backend``/``precision`` DFT knobs.
    """
    x = jnp.asarray(x)
    window = stft_kwargs.get("window")
    complex_in = jnp.iscomplexobj(x) or (
        window is not None and np.iscomplexobj(_as_numpy_window(window))
    )
    onesided = stft_kwargs.get("onesided")
    if onesided is None:
        # torch.stft rule: onesided only when BOTH input and window are real.
        onesided = not complex_in
        stft_kwargs = dict(stft_kwargs, onesided=onesided)
    elif onesided and complex_in:
        raise ValueError(
            "onesided=True is impossible with a complex input or window "
            "(the spectrum is not Hermitian); torch.stft raises here too"
        )
    if onesided:
        if n_fft % 2:
            raise ValueError(
                f"onesided STFT needs an even n_fft (got {n_fft}); pass "
                "onesided=False or an even size"
            )
        bins = n_fft // 2 + 1
    else:
        bins = n_fft
    cfg, w = canonicalize(bins, _real_dtype(x.dtype), **stft_kwargs)
    spec_tm = stft_ops.stft(
        x, cfg, jnp.asarray(w), backend=backend, precision=precision
    )
    return jnp.swapaxes(spec_tm, -1, -2)


def istft(
    spec,
    length: Optional[int] = None,
    backend: str = "auto",
    precision=None,
    **stft_kwargs,
):
    """Inverse STFT of complex ``spec`` (..., F, T) -> (..., L_out).

    ``n_fft`` is inferred from the bin count exactly like the inversion entry
    points (methods.py:21-91 rules).  Output length is the reference's
    symmetric trim ``(T-1)*hop + n_fft - 2*pad_amount``; pass ``length`` to
    crop or zero-pad to an exact sample count (e.g. the original signal's).
    """
    spec = jnp.asarray(spec)
    if not jnp.iscomplexobj(spec):
        raise TypeError(
            "istft needs a complex spectrogram; got a real array — invert "
            "magnitudes with griffin_lim/ADMM/RTISI_LA instead"
        )
    cfg, w = canonicalize(spec.shape[-2], _real_dtype(spec.dtype), **stft_kwargs)
    x = stft_ops.istft(
        jnp.swapaxes(spec, -1, -2), cfg, jnp.asarray(w),
        backend=backend, precision=precision,
    )
    if length is not None:
        if x.shape[-1] >= length:
            x = x[..., :length]
        else:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, length - x.shape[-1])]
            x = jnp.pad(x, pad)
    return x
