"""Audio file I/O: native C++ WAV codec with a pure-numpy fallback.

The reference's demo requires librosa for audio loading
(/root/reference/main.py:1,16); this framework ships its own I/O:
``read_wav`` / ``write_wav`` decode PCM16/PCM24/PCM32/float32 and encode
PCM16/float32.  The hot path is :mod:`specinv_tpu.native`'s ``wav_io.cpp``,
compiled lazily with g++ into a cached shared object and driven through
ctypes; when no toolchain is available the numpy codec below takes over with
identical semantics (tests pin the two against each other bit-for-bit).
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile
import warnings
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "wav_io.cpp")
_LIB_PATH = os.path.join(_NATIVE_DIR, "_build", "libwav_io.so")

_lib = None
_backend = None  # "native" | "numpy"


def _try_build() -> Optional[str]:
    """Compile wav_io.cpp if the cached .so is absent or stale."""
    try:
        if os.path.exists(_LIB_PATH) and os.path.getmtime(
            _LIB_PATH
        ) >= os.path.getmtime(_SRC):
            return _LIB_PATH
        os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
        # Build to a temp name then rename: concurrent builders stay safe.
        fd, tmp = tempfile.mkstemp(
            suffix=".so", dir=os.path.dirname(_LIB_PATH)
        )
        os.close(fd)
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, _LIB_PATH)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return _LIB_PATH
    except Exception as exc:  # noqa: BLE001 — any failure -> numpy fallback
        warnings.warn(f"native wav codec unavailable ({exc}); using numpy")
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _backend
    if _backend is not None:
        return _lib
    path = _try_build()
    if path is None:
        _backend = "numpy"
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.wav_read_f32.restype = ctypes.c_int
        lib.wav_write_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.wav_write_f32.restype = ctypes.c_int
        _lib, _backend = lib, "native"
    except OSError as exc:
        warnings.warn(f"native wav codec failed to load ({exc}); using numpy")
        _lib, _backend = None, "numpy"
    return _lib


def backend() -> str:
    """``'native'`` (C++ codec) or ``'numpy'`` (fallback)."""
    _load()
    return _backend


# ---------------------------------------------------------------- numpy path

def _np_read(path: str) -> Tuple[np.ndarray, int, int]:
    with open(path, "rb") as f:
        if f.read(4) != b"RIFF":
            raise ValueError(f"{path}: not a RIFF file")
        f.read(4)
        if f.read(4) != b"WAVE":
            raise ValueError(f"{path}: not a WAVE file")
        fmt = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                raise ValueError(f"{path}: no data chunk")
            cid, sz = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                payload = f.read(sz + (sz & 1))
                if len(payload) < 16:
                    raise ValueError(f"{path}: truncated fmt chunk")
                tag, ch, sr = struct.unpack("<HHI", payload[:8])
                bits = struct.unpack("<H", payload[14:16])[0]
                if tag == 0xFFFE:  # extensible: real tag leads SubFormat
                    if len(payload) < 26:
                        raise ValueError(
                            f"{path}: truncated extensible fmt chunk"
                        )
                    tag = struct.unpack("<H", payload[24:26])[0]
                fmt = (tag, ch, sr, bits)
            elif cid == b"data":
                # Streaming encoders write sz=0xFFFFFFFF, and truncated files
                # declare more than they hold: clamp to what the file actually
                # has left (mirrors the native reader's incremental loop)
                # instead of attempting a multi-GB read.
                pos = f.tell()
                end = f.seek(0, 2)
                f.seek(pos)
                avail = max(end - pos, 0)
                raw = f.read(min(sz, avail))
                break
            else:
                f.seek(sz + (sz & 1), 1)
        if fmt is None:
            raise ValueError(f"{path}: no fmt chunk")
        tag, ch, sr, bits = fmt
        # a truncated tail that isn't a whole frame is dropped, not an
        # opaque np.frombuffer itemsize error
        frame_bytes = max((bits // 8) * ch, 1)
        raw = raw[: len(raw) - (len(raw) % frame_bytes)]
        if tag == 3 and bits == 32:
            data = np.frombuffer(raw, "<f4").astype(np.float32)
        elif tag == 1 and bits == 16:
            data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif tag == 1 and bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            v = (
                (b[:, 0].astype(np.int32) << 8)
                | (b[:, 1].astype(np.int32) << 16)
                | (b[:, 2].astype(np.int8).astype(np.int32) << 24)
            )
            data = v.astype(np.float32) / 2147483648.0
        elif tag == 1 and bits == 32:
            data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"{path}: unsupported format tag={tag} bits={bits}")
        return data.astype(np.float32), ch, sr


def _np_write(path, flat, frames, channels, sr, pcm16):
    bytes_per = 2 if pcm16 else 4
    data_bytes = frames * channels * bytes_per
    if data_bytes > 0xFFFFFFFF - 36:
        # RIFF sizes are uint32; match the native path's ValueError instead
        # of leaking a struct.error
        raise ValueError(
            f"{path}: audio too large for WAV ({data_bytes} data bytes "
            "exceeds the RIFF uint32 limit)"
        )
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVEfmt ")
        f.write(
            struct.pack(
                "<IHHIIHH",
                16,
                1 if pcm16 else 3,
                channels,
                sr,
                sr * channels * bytes_per,
                channels * bytes_per,
                16 if pcm16 else 32,
            )
        )
        f.write(b"data" + struct.pack("<I", data_bytes))
        if pcm16:
            clipped = np.clip(flat, -1.0, 1.0) * 32767.0
            q = np.where(clipped >= 0, clipped + 0.5, clipped - 0.5)
            f.write(q.astype("<i2").tobytes())
        else:
            f.write(flat.astype("<f4").tobytes())


# --------------------------------------------------------------- public API

def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode a WAV file to float32.

    Returns ``(data, sample_rate)`` where ``data`` is ``(frames,)`` for mono
    or ``(channels, frames)`` for multichannel — the layout
    :func:`specinv_tpu.griffin_lim` & co. take directly.
    """
    lib = _load()
    if lib is None:
        data, ch, sr = _np_read(path)
    else:
        frames = ctypes.c_int64()
        ch32 = ctypes.c_int32()
        sr32 = ctypes.c_int32()
        bits = ctypes.c_int32()
        tag = ctypes.c_int32()
        rc = lib.wav_info(
            path.encode(), ctypes.byref(frames), ctypes.byref(ch32),
            ctypes.byref(sr32), ctypes.byref(bits), ctypes.byref(tag),
        )
        if rc != 0:
            raise ValueError(f"{path}: wav_info failed (code {rc})")
        n = frames.value * ch32.value
        data = np.empty(n, np.float32)
        rc = lib.wav_read_f32(
            path.encode(),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )
        if rc != 0:
            raise ValueError(f"{path}: wav_read_f32 failed (code {rc})")
        ch, sr = ch32.value, sr32.value
    if ch > 1:
        data = data.reshape(-1, ch).T.copy()
    return data, int(sr)


def write_wav(path: str, data, sample_rate: int, pcm16: bool = True) -> None:
    """Encode float32 audio: ``(frames,)`` mono or ``(channels, frames)``.

    ``pcm16=True`` (default) clips to [-1, 1] and quantizes with
    round-half-away (matching the native codec bit-for-bit);
    ``pcm16=False`` stores IEEE float32 verbatim.
    """
    arr = np.asarray(data, np.float32)
    if arr.ndim == 1:
        channels, frames = 1, arr.shape[0]
        flat = np.ascontiguousarray(arr)
    elif arr.ndim == 2:
        channels, frames = arr.shape
        flat = np.ascontiguousarray(arr.T).reshape(-1)
    else:
        raise ValueError("data must be (frames,) or (channels, frames)")
    lib = _load()
    if lib is None:
        _np_write(path, flat, frames, channels, sample_rate, pcm16)
        return
    rc = lib.wav_write_f32(
        path.encode(),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames,
        channels,
        sample_rate,
        1 if pcm16 else 0,
    )
    if rc != 0:
        raise ValueError(f"{path}: wav_write_f32 failed (code {rc})")
