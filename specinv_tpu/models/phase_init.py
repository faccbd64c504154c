"""SPSI-style phase initialization (dense, XLA-friendly rewrite).

Reference: ``phase_init`` at /root/reference/torch_specinv/methods.py:572-615.
The reference uses shape-dynamic ops (``masked_select``/``nonzero``) to gather
spectral peaks, interpolate their true frequency, and scatter the resulting
instantaneous angular increment into the peak bin and its two neighbors before
a cumulative sum over time turns increments into phase.

Dynamic shapes don't exist under XLA, so this is re-derived as dense masked
math over the full (T, F) grid — which is also the faster formulation on TPU
(pure VPU elementwise + one cumsum, no gather/scatter):

* peak mask  = strict local max over the frequency lane axis
* quadratic interpolation ``p = 0.5 (a - r) / (a - 2b + r)`` computed
  everywhere with a guarded denominator, valid exactly on the mask
* the reference's three sequential scatter writes (peak, peak-1, peak+1 —
  methods.py:607-609) have *overwrite* semantics, so the dense equivalent is a
  priority select: a bin one **above** a peak wins (written last), then one
  below, then the peak itself.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import STFTConfig
from .common import as_array, prepare_spec

_PI2 = 2.0 * math.pi


def phase_init_tm(spec_tm: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """Time-major core: magnitude ``(..., T, F)`` -> complex ``(..., T, F)``."""
    s = spec_tm
    # Strict local maxima along frequency; boundary bins can never be peaks.
    interior = (s[..., 1:-1] > s[..., 2:]) & (s[..., 1:-1] > s[..., :-2])
    pad = [(0, 0)] * (s.ndim - 1) + [(1, 1)]
    mask = jnp.pad(interior, pad)

    b = s
    a = jnp.pad(s[..., :-1], [(0, 0)] * (s.ndim - 1) + [(1, 0)])   # s[f-1]
    r = jnp.pad(s[..., 1:], [(0, 0)] * (s.ndim - 1) + [(0, 1)])    # s[f+1]
    denom = a - 2 * b + r
    denom = jnp.where(denom == 0, jnp.ones_like(denom), denom)
    p = 0.5 * (a - r) / denom

    freqs = jnp.arange(s.shape[-1], dtype=s.dtype)
    omega = _PI2 * (freqs + p) / cfg.n_fft * cfg.hop_length
    omega = jnp.where(mask, omega, jnp.zeros_like(omega))

    def shift_down(x):  # x[f] -> x[f-1] view (peak one bin below)
        return jnp.pad(x[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])

    def shift_up(x):  # x[f] -> x[f+1] view (peak one bin above)
        return jnp.pad(x[..., 1:], [(0, 0)] * (x.ndim - 1) + [(0, 1)])

    # Reference write order: peak bins, then peak-1, then peak+1 — later
    # writes overwrite, so priority is: peak below me > peak above me > me.
    increment = jnp.where(
        shift_down(mask),
        shift_down(omega),
        jnp.where(shift_up(mask), shift_up(omega), omega),
    )
    phase = jnp.cumsum(increment, axis=-2)  # over time
    if phase.dtype in (jnp.bfloat16, jnp.float16):
        phase = phase.astype(jnp.float32)  # lax.complex rejects bf16/fp16
        s = s.astype(jnp.float32)
    return s * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def phase_init(spec, **stft_kwargs) -> jnp.ndarray:
    """Reference-parity wrapper: magnitude ``(F, T)``/``(B, F, T)`` -> complex
    spectrogram in the same layout (methods.py:572-615)."""
    spec = as_array(spec)
    if jnp.iscomplexobj(spec):
        raise ValueError("phase_init expects a magnitude (real) spectrogram")
    shape = spec.shape
    spec_tm, _was_2d, cfg, _window = prepare_spec(spec, **stft_kwargs)
    out_tm = phase_init_tm(spec_tm, cfg)
    return jnp.swapaxes(out_tm, -1, -2).reshape(shape)
