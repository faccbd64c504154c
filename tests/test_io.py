"""WAV codec: native C++ / numpy equivalence and roundtrips."""
import struct

import numpy as np
import pytest

from specinv_tpu import io as sio


@pytest.fixture(scope="module")
def tone():
    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, 8000, dtype=np.float32)
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(8000).astype(np.float32))


def test_roundtrip_pcm16(tmp_path, tone):
    p = str(tmp_path / "a.wav")
    sio.write_wav(p, tone, 22050, pcm16=True)
    y, sr = sio.read_wav(p)
    assert sr == 22050 and y.shape == tone.shape
    # encode scales by 32767, decode divides by 32768 (the usual asymmetric
    # convention) -> error bound |x|/32768 + half an LSB
    np.testing.assert_allclose(y, np.clip(tone, -1, 1), atol=2 / 32768)


def test_roundtrip_float32_exact(tmp_path, tone):
    p = str(tmp_path / "a.wav")
    sio.write_wav(p, tone, 16000, pcm16=False)
    y, sr = sio.read_wav(p)
    assert sr == 16000
    np.testing.assert_array_equal(y, tone)


def test_roundtrip_stereo(tmp_path, tone):
    p = str(tmp_path / "a.wav")
    st = np.stack([tone, -tone])
    sio.write_wav(p, st, 48000, pcm16=False)
    y, sr = sio.read_wav(p)
    assert y.shape == st.shape and sr == 48000
    np.testing.assert_array_equal(y, st)


def _write_pcm24(path, samples_i32, sr=22050):
    """Hand-rolled PCM24 writer (top 24 bits of the int32 values)."""
    n = len(samples_i32)
    data_bytes = 3 * n
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", data_bytes))
        for v in samples_i32:
            f.write(struct.pack("<i", int(v))[1:])  # drop the low byte


def test_pcm24_decode(tmp_path):
    vals = np.asarray(
        [0, 1 << 8, -(1 << 8), (1 << 30), -(1 << 30), (1 << 31) - 256],
        np.int64,
    )
    p = str(tmp_path / "c.wav")
    _write_pcm24(p, vals)
    y, sr = sio.read_wav(p)
    ref = (vals.astype(np.int64) & ~0xFF).astype(np.float32) / 2147483648.0
    np.testing.assert_array_equal(y, ref.astype(np.float32))


def test_native_matches_numpy(tmp_path, tone):
    """When the native codec built, its decode must be bit-identical to the
    numpy codec on the same files."""
    if sio.backend() != "native":
        pytest.skip("no toolchain — numpy fallback already the only path")
    for pcm16 in (True, False):
        p = str(tmp_path / f"n{pcm16}.wav")
        sio.write_wav(p, tone, 22050, pcm16=pcm16)
        y_native, sr = sio.read_wav(p)
        y_np, ch, sr2 = sio._np_read(p)
        assert (sr, 1) == (sr2, ch)
        np.testing.assert_array_equal(y_native, y_np)


def test_numpy_writer_matches_native(tmp_path, tone):
    if sio.backend() != "native":
        pytest.skip("no toolchain")
    p1 = str(tmp_path / "w1.wav")
    p2 = str(tmp_path / "w2.wav")
    sio.write_wav(p1, tone, 22050, pcm16=True)  # native
    sio._np_write(
        p2, np.ascontiguousarray(tone), tone.shape[0], 1, 22050, True
    )
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_bad_file_raises(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav at all")
    with pytest.raises(ValueError):
        sio.read_wav(p)


def test_truncated_fmt_chunk_raises_valueerror(tmp_path):
    """Malformed fmt chunks must raise ValueError on BOTH codecs (the numpy
    path used to leak struct.error)."""
    p = str(tmp_path / "trunc.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 20) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00abcd")
    with pytest.raises(ValueError):
        sio._np_read(p)
    with pytest.raises(ValueError):
        sio.read_wav(p)


def test_lying_data_size_clamped(tmp_path, tone):
    """A data chunk declaring 0xFFFFFFFF bytes (streaming encoders) or more
    than the file holds decodes the actual payload instead of raising an
    opaque frombuffer error (ADVICE r2)."""
    p = tmp_path / "lie.wav"
    sio.write_wav(str(p), tone, 22050, pcm16=True)
    raw = bytearray(p.read_bytes())
    assert raw[36:40] == b"data"
    raw[40:44] = struct.pack("<I", 0xFFFFFFFF)
    p.write_bytes(bytes(raw))
    data, ch, sr = sio._np_read(str(p))
    assert sr == 22050 and ch == 1 and data.shape[0] == tone.shape[0]

    # truncated mid-sample: decodes the whole frames, drops the ragged tail
    p2 = tmp_path / "trunc.wav"
    p2.write_bytes(bytes(raw[: 44 + 2 * 100 + 1]))
    data2, _, _ = sio._np_read(str(p2))
    assert data2.shape[0] == 100


def test_write_too_large_raises_valueerror(tmp_path):
    """Both codec paths reject >4 GiB audio with ValueError instead of a
    wrapped RIFF header (native) / struct.error (numpy) (ADVICE r2)."""
    import ctypes

    p = tmp_path / "big.wav"
    with pytest.raises(ValueError, match="RIFF uint32 limit"):
        sio._np_write(str(p), np.zeros(4, np.float32), 2**31, 1, 22050, False)
    lib = sio._load()
    if lib is not None:
        buf = np.zeros(4, np.float32)
        rc = lib.wav_write_f32(
            str(p).encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            2**31, 1, 22050, 0,
        )
        assert rc == -10  # checked before any write: small buf never read
        assert not p.exists()
