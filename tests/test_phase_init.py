"""Golden parity for the dense phase_init rewrite vs the reference's
masked_select/nonzero/scatter implementation (methods.py:572-615)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from specinv_tpu import phase_init

from .helpers import requires_reference, make_signal, nfft_list, torch_stft


@pytest.mark.parametrize("nfft", nfft_list)
@pytest.mark.parametrize("batched", [False, True])
@requires_reference
def test_phase_init_matches_reference(nfft, batched):
    from torch_specinv.methods import phase_init as ref_phase_init

    shape = (2, 4410) if batched else (4410,)
    x = make_signal(shape)
    mag = np.abs(torch_stft(x, nfft))
    ref = ref_phase_init(torch.from_numpy(mag)).numpy()
    ours = np.asarray(phase_init(mag))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-8)


@pytest.mark.parametrize("hop", [64, 100])
@requires_reference
def test_phase_init_hop_matches_reference(hop):
    from torch_specinv.methods import phase_init as ref_phase_init

    x = make_signal((4410,))
    mag = np.abs(torch_stft(x, 256, hop_length=hop))
    ref = ref_phase_init(torch.from_numpy(mag), hop_length=hop).numpy()
    ours = np.asarray(phase_init(mag, hop_length=hop))
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_phase_init_rejects_complex():
    x = make_signal((4410,))
    spec = torch_stft(x, 256)
    with pytest.raises(ValueError):
        phase_init(spec)


def test_phase_init_preserves_magnitude():
    x = make_signal((4410,))
    mag = np.abs(torch_stft(x, 512))
    out = np.asarray(phase_init(mag))
    np.testing.assert_allclose(np.abs(out), mag, atol=1e-10)
