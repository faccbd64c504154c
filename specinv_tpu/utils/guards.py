"""Optional checkify-based numeric guards (SURVEY §5: sanitizers/NaN guards).

The reference has no sanitizers; its known numeric traps are the OLA-envelope
divide (methods.py:132 divides blindly — zero envelope => inf/NaN) and the
magnitude-projection divide (guarded by 1e-16 at methods.py:246).  The library
substitutes 1 for exact envelope zeros in the fast path; these guards add
*detection* for debugging:

    from specinv_tpu.utils import guards

    with guards.debug_checks():
        y = guards.checked(si.griffin_lim)(mag, max_iter=100, verbose=False)

``checked(fn)`` functionalizes ``fn`` with ``jax.experimental.checkify``
(float_checks: every NaN/Inf produced anywhere in the computation raises,
with the offending primitive's source line) plus the explicit ``check`` calls
the library plants behind the ``debug_checks`` flag (e.g. zero-envelope
detection in ``ops.stft.istft``).

The flag is read at *trace* time: enable it before the first call of a given
shape, or call ``jax.clear_caches()`` after toggling.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify

_ENABLED = False


def debug_checks_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def debug_checks():
    """Enable the library's planted checkify checks within the context."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = True
    jax.clear_caches()  # planted checks are trace-time; drop stale traces
    try:
        yield
    finally:
        _ENABLED = prev
        jax.clear_caches()


def check(pred, msg: str, **fmt_kwargs) -> None:
    """Plant a checkify check (no-op unless inside ``debug_checks()``)."""
    if _ENABLED:
        checkify.check(pred, msg, **fmt_kwargs)


def checked(fn, errors=checkify.float_checks | checkify.user_checks):
    """Wrap ``fn`` so failed checks / NaN / Inf raise ``JaxRuntimeError``."""

    def wrapper(*args, **kwargs):
        err, out = checkify.checkify(
            lambda *a: fn(*a, **kwargs), errors=errors
        )(*args)
        err.throw()
        return out

    return wrapper
