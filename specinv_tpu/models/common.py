"""Shared wrapper plumbing for the public (reference-parity) algorithm API.

Handles the reference's rank/layout contract: inputs are ``(F, T)`` or
``(B, F, T)`` spectrograms (``_spec_formatter``, /root/reference/torch_specinv/
methods.py:99-111), magnitude inputs get their phase seeded with
:func:`specinv_tpu.models.phase_init.phase_init_tm`, and outputs squeeze the
batch dim back off unless the caller explicitly passed a 3-D batch-1 input
(methods.py:268-270).

Internally everything runs time-major ``(B, T, F)``; these helpers transpose
once at the boundary.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import STFTConfig, canonicalize


def as_array(x: Any) -> jnp.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    if isinstance(x, (np.ndarray, list, tuple, float, int)):
        x = jnp.asarray(x)
    return x


def prepare_spec_b3(spec: Any, **stft_kwargs) -> Tuple[jnp.ndarray, bool, STFTConfig, jnp.ndarray]:
    """Canonicalize a user spectrogram without changing its layout.

    Returns ``(spec_b3, was_2d, cfg, window)`` where ``spec_b3`` is the
    batched ``(B, F, T)`` array (complex or magnitude, as given).  No device
    compute happens here beyond the batch-dim reshape — the layout transpose
    and phase seeding live inside each algorithm's jitted full run.
    """
    spec = as_array(spec)
    if not 1 < spec.ndim < 4:
        raise ValueError(f"spec must be 2-D (F,T) or 3-D (B,F,T); got rank {spec.ndim}")
    was_2d = spec.ndim == 2
    if was_2d:
        spec = spec[None]
    real_dtype = jnp.zeros((), dtype=spec.dtype).real.dtype
    cfg, window_np = canonicalize(spec.shape[-2], real_dtype, **stft_kwargs)
    window = jnp.asarray(window_np)
    return spec, was_2d, cfg, window


def prepare_spec(spec: Any, **stft_kwargs) -> Tuple[jnp.ndarray, bool, STFTConfig, jnp.ndarray]:
    """Canonicalize a user spectrogram.

    Returns ``(spec_tm, was_2d, cfg, window)`` where ``spec_tm`` is the
    time-major batched ``(B, T, F)`` array (complex or magnitude, as given).
    """
    spec, was_2d, cfg, window = prepare_spec_b3(spec, **stft_kwargs)
    spec_tm = jnp.swapaxes(spec, -1, -2)  # (B, F, T) -> (B, T, F)
    return spec_tm, was_2d, cfg, window


def restore_output(x: jnp.ndarray, was_2d: bool) -> jnp.ndarray:
    """Apply the reference's batch-squeeze rule to a (B, L) waveform."""
    if was_2d and x.shape[0] == 1:
        return x[0]
    return x


def run_with_vmem_demotion(launch, backend: str, fallback_backend, cfg, T: int):
    """Execute ``launch(backend)``, demoting on a whole-run-kernel VMEM OOM.

    The whole-run kernels' VMEM fit model (:func:`...gl_fullrun4.fits`) is
    optimistic past its calibrated budget; when ``backend='pallas4'`` was
    *auto*-selected (``fallback_backend`` set), the first compile doubles as
    the probe — a Mosaic scoped-VMEM exhaustion is caught here, the launch
    shape is recorded in the deny cache (so ``fits`` rejects it from then
    on), and the run retries on ``fallback_backend``.  An explicit
    ``backend='pallas4'`` request (``fallback_backend=None``) still raises.
    """
    if fallback_backend is None or backend != "pallas4":
        return launch(backend)
    try:
        return launch(backend)
    except Exception as e:  # noqa: BLE001 — filtered to VMEM OOMs below
        from ..ops.pallas import gl_fullrun4

        if not gl_fullrun4.is_vmem_oom(e):
            raise
        import warnings

        warnings.warn(
            f"whole-run fused kernel exceeded VMEM at compile time for "
            f"T={T} frames (n_fft={cfg.n_fft}); demoting backend to "
            f"{fallback_backend!r} and caching the rejection",
            stacklevel=3,
        )
        gl_fullrun4.deny(cfg, T)
        return launch(fallback_backend)
