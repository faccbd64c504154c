"""Gather-free framing and overlap-add for TPU.

The reference implements analysis framing inside ``torch.stft`` and synthesis
overlap-add as a ``conv_transpose1d`` with a ``diag(window)`` kernel
(/root/reference/torch_specinv/methods.py:94-132).  A diagonal conv kernel is an
O(n_fft^2) matmul that is almost entirely zeros — a poor fit for the MXU — and
scatter-adds serialize on TPU.  Instead both directions use a dense reshape
trick built on the observation that when ``n_fft = k * hop`` every frame is the
concatenation of ``k`` consecutive hop-sized chunks of the signal:

  frame[t] = chunks[t : t+k]        (analysis:  k shifted dense slices)
  out      = sum_j shift(chunk_j)   (synthesis: k shifted dense adds)

Both are pure slices/pads/adds that XLA fuses into a handful of vectorized
copies — no gathers, no scatters, fully static shapes.  When ``hop`` does not
divide ``n_fft`` we pad frames up to the next multiple (zeros are no-ops in
the sum), keeping the same code path.

Internal layout is time-major ``(..., T, n_fft)`` / ``(..., T, F)`` so the
innermost (lane) dimension is the long FFT/frequency axis — the shape the VPU
(8x128) and MXU (128x128) want.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import STFTConfig


def pad_center(x: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """Apply torch.stft-style center padding along the last axis."""
    if not cfg.center:
        return x
    p = cfg.pad_amount
    pad_width = [(0, 0)] * (x.ndim - 1) + [(p, p)]
    if cfg.jnp_pad_mode == "constant":
        return jnp.pad(x, pad_width)
    return jnp.pad(x, pad_width, mode=cfg.jnp_pad_mode)


def frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``x`` (..., L) into overlapping frames (..., T, frame_length)."""
    length = x.shape[-1]
    num_frames = 1 + (length - frame_length) // hop_length
    if num_frames < 1:
        raise ValueError(
            f"signal length {length} shorter than frame length {frame_length}"
        )
    k = math.ceil(frame_length / hop_length)
    padded_frame = k * hop_length
    # Chunks covering every sample any frame can touch.
    needed = (num_frames - 1 + k) * hop_length
    if needed > length:
        pad_width = [(0, 0)] * (x.ndim - 1) + [(0, needed - length)]
        x = jnp.pad(x, pad_width)
    chunks = x[..., :needed].reshape(*x.shape[:-1], num_frames - 1 + k, hop_length)
    parts = [chunks[..., j : j + num_frames, :] for j in range(k)]
    frames = jnp.stack(parts, axis=-2)  # (..., T, k, hop)
    frames = frames.reshape(*frames.shape[:-2], padded_frame)
    if padded_frame != frame_length:
        frames = frames[..., :frame_length]
    return frames


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add frames (..., T, N) into a signal (..., (T-1)*hop + N).

    Dense formulation: split each frame into hop-sized chunks; chunk ``j`` of
    frame ``t`` lands at offset ``(t + j) * hop``, so each ``j`` contributes a
    contiguous, already-vectorized run of ``T*hop`` samples that is simply
    shifted by ``j*hop`` — a static sum of ``k`` padded arrays.
    """
    *batch, num_frames, frame_length = frames.shape
    k = math.ceil(frame_length / hop_length)
    padded_frame = k * hop_length
    if padded_frame != frame_length:
        pad_width = [(0, 0)] * (frames.ndim - 1) + [(0, padded_frame - frame_length)]
        frames = jnp.pad(frames, pad_width)
    chunks = frames.reshape(*batch, num_frames, k, hop_length)
    out_len = (num_frames - 1) * hop_length + padded_frame
    run = num_frames * hop_length
    total = None
    for j in range(k):
        flat = chunks[..., :, j, :].reshape(*batch, run)
        shifted = jnp.pad(
            flat, [(0, 0)] * len(batch) + [(j * hop_length, out_len - run - j * hop_length)]
        )
        total = shifted if total is None else total + shifted
    true_len = (num_frames - 1) * hop_length + frame_length
    return total[..., :true_len]


def ola_envelope(
    window_sq: jnp.ndarray, num_frames: int, hop_length: int
) -> jnp.ndarray:
    """Window-squared OLA normalization envelope, shape ((T-1)*hop + n_fft,).

    Mirrors the reference's lazy envelope (methods.py:130-131): OLA of
    ``window * window`` over all-ones frames, computed once and reused for
    every iteration of the inversion loop.
    """
    tiled = jnp.broadcast_to(window_sq, (num_frames, window_sq.shape[-1]))
    return overlap_add(tiled, hop_length)
