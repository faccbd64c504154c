"""Checkpoint round-trip, profiling timer, and driver edge cases."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from specinv_tpu.utils.checkpoint import load_state, save_state
from specinv_tpu.utils.profiling import Throughput
from specinv_tpu.utils.runner import iterate


def test_checkpoint_roundtrip_namedtuple():
    from specinv_tpu.models.griffin_lim import GLState

    state = GLState(
        x=jnp.arange(10.0), pre_spec=jnp.ones((2, 3), jnp.complex64) * (1 + 2j)
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.npz")
        save_state(p, state)
        like = GLState(x=jnp.zeros(10), pre_spec=jnp.zeros((2, 3), jnp.complex64))
        restored = load_state(p, like)
    np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(state.x))
    np.testing.assert_array_equal(
        np.asarray(restored.pre_spec), np.asarray(state.pre_spec)
    )


def test_checkpoint_structure_mismatch():
    state = {"a": jnp.zeros(3)}
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.npz")
        save_state(p, state)
        with pytest.raises(ValueError):
            load_state(p, {"a": jnp.zeros(3), "b": jnp.zeros(2)})


def test_throughput_timer():
    tp = Throughput()
    out = tp.measure(lambda: jnp.ones(4) * 2, iters=100)
    assert tp.iters_per_sec > 0 and tp.seconds > 0
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4))


def test_iterate_validates_metric():
    with pytest.raises(ValueError):
        iterate(lambda s: (s, s), jnp.zeros(3), jnp.zeros(3), 5, 0.0, metric="bad")


def test_iterate_while_equals_fori():
    target = jnp.zeros(8)

    def step(s):
        s = s * 0.5
        return s, s

    a = iterate(step, jnp.ones(8), target, 20, 1e-9, eva_iter=2, mode="fori")
    b = iterate(step, jnp.ones(8), target, 20, 1e-9, eva_iter=2, mode="while")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_iterate_rejects_bad_mode():
    with pytest.raises(ValueError):
        iterate(lambda s: (s, s), jnp.zeros(3), jnp.zeros(3), 5, 0.1, mode="nope")


def test_checkify_guards_detect_zero_envelope():
    """SURVEY §5 sanitizer: the planted envelope check fires where the torch
    reference silently emits inf/NaN (center=False + gappy window/hop)."""
    import numpy as np
    import jax.numpy as jnp
    import pytest

    from specinv_tpu import griffin_lim
    from specinv_tpu.utils import guards

    # hop > win_length leaves inter-frame gaps -> zero envelope samples
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal((65, 12))), jnp.float32)
    kw = dict(n_fft=128, win_length=64, hop_length=100, center=False,
              max_iter=2, tol=0.0, verbose=False)
    with guards.debug_checks():
        with pytest.raises(Exception, match="envelope contains zeros"):
            guards.checked(lambda m: griffin_lim(m, **kw))(mag)
    # and a healthy config passes with float checks on
    mag2 = jnp.asarray(np.abs(rng.standard_normal((65, 12))), jnp.float32)
    with guards.debug_checks():
        y = guards.checked(
            lambda m: griffin_lim(m, n_fft=128, max_iter=2, tol=0.0, verbose=False)
        )(mag2)
    assert np.isfinite(np.asarray(y)).all()
