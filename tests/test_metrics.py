"""Metric parity against the reference's torch implementations."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from specinv_tpu import metrics

from .helpers import requires_reference, make_signal


@pytest.mark.parametrize("name", ["sc", "snr", "ser"])
@requires_reference
def test_metric_matches_reference(name):
    from torch_specinv import metrics as ref_metrics

    a = make_signal((3, 257, 40), seed=1)
    b = make_signal((3, 257, 40), seed=2)
    ours = float(getattr(metrics, name)(jnp.asarray(a), jnp.asarray(b)))
    ref = float(
        getattr(ref_metrics, name)(torch.from_numpy(a), torch.from_numpy(b))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_spectral_convergence_alias():
    assert metrics.spectral_convergence is metrics.sc


def test_get_metric_case_insensitive():
    assert metrics.get_metric("SC") is metrics.sc
    assert metrics.get_metric("snr") is metrics.snr
    with pytest.raises(ValueError):
        metrics.get_metric("nope")


def test_metrics_differentiable():
    import jax

    a = jnp.asarray(make_signal((64, 10), dtype=np.float32, seed=3))
    b = jnp.asarray(make_signal((64, 10), dtype=np.float32, seed=4))
    for fn in (metrics.sc, metrics.snr, metrics.ser):
        g = jax.grad(lambda x: fn(x, b))(a)
        assert np.isfinite(np.asarray(g)).all()
