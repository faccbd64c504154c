"""Quality metrics: spectral convergence, SNR, SER.

Same math as the reference's ``torch_specinv/metrics.py:4-43``, as pure jnp
functions (jit/vmap/grad-compatible).  Also exports the alias
``spectral_convergence`` that the reference's README advertises but never
actually defines (doc drift noted in SURVEY.md §2.1).
"""
from __future__ import annotations

import jax.numpy as jnp


def sc(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Spectral convergence in dB: ``20*log10(||X - Y||_F / ||Y||_F)``.

    Reference: metrics.py:4-14.
    """
    num = jnp.linalg.norm((input - target).ravel())
    den = jnp.linalg.norm(target.ravel())
    return 20 * (jnp.log10(num) - jnp.log10(den))


def snr(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """``-10*log10 sum((x_i/||X|| - y_i/||Y||)^2)`` with ||X||=||Y|| as in the
    reference (both sides normalized by the *target* norm — metrics.py:17-29).
    """
    norm = jnp.linalg.norm(target.ravel())
    return -10 * jnp.log10(jnp.sum((input / norm - target / norm) ** 2))


def ser(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """``10*log10(sum x_i^2 / sum (x_i - y_i)^2)``. Reference: metrics.py:32-43."""
    return 10 * (
        jnp.log10(jnp.sum(input**2)) - jnp.log10(jnp.sum((input - target) ** 2))
    )


# Alias fixing the reference's README/docs drift (README.md:36 imports a
# ``spectral_convergence`` that torch_specinv never defines).
spectral_convergence = sc

METRIC_FNS = {"SC": sc, "SNR": snr, "SER": ser}


def get_metric(name: str):
    key = name.upper()
    if key not in METRIC_FNS:
        raise ValueError(f"unknown metric {name!r}; available: {list(METRIC_FNS)}")
    return METRIC_FNS[key]
