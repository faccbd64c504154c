"""Four-step matmul-FFT building blocks for the fused Pallas kernels.

The direct DFT-as-matmul costs ``n_fft * f_pad`` MACs per frame per
direction; factoring ``N = m * 128`` (four-step FFT, validated in
scripts/proto_fourstep.py and tests/test_pallas.py) cuts that ~4x for
n_fft=2048.

Chunk decimation (chosen so every reshape keeps 128 as the minor dim —
Mosaic cannot shape-cast a minor dim into sub-lane pieces, and (…, m, 128)
spectrum tiles use the full lane width):

  n = 128*a + b   (a in [0,m): chunk index, b in [0,128))
  k = d + m*e     (d in [0,m), e in [0,128))

  forward (natural frames (bt, n_fft) -> permuted spectrum (bt, m, 128)):
      M[a, b]  = frame[128*a + b]                 # plain reshape
      A[d, b]  = sum_a M[a, b] * Wm[a, d]         # batched mid-dot, contract m
      B[d, b]  = A[d, b] * W_N^{b*d}              # elementwise twiddle
      S[d, e]  = sum_b B[d, b] * W128[b, e]       # batched mid-dot, contract 128
  spectrum lives in the PERMUTED layout ``S[d, e] = FFT(frame)[d + m*e]``
  (Griffin-Lim's momentum and magnitude projection are elementwise per bin,
  so the whole iteration runs in permuted space; the target magnitude is
  Hermitian-extended + permuted once outside the kernel).

  inverse (permuted spectrum -> natural frames, real part only):
      Q[d, b] = sum_e S[d, e] * conj(W128)[e, b]  # contract 128
      R[d, b] = Q[d, b] * conj(W_N)^{b*d}
      out[a, b] = Re(sum_d R[d, b] * conj(Wm)[d, a])   # contract m
      frame[128*a + b] = out[a, b]                # one swapaxes + reshape

Mosaic handles the batched 3-D dots and the (128, m) swapaxes natively
(scripts/exp_mosaic_caps.py).  All dots run at the library's precision
scheme (HIGH = hand-rolled 3-pass bf16, or the 2-pass variants).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .gl_fused import _dot3

LANE = 128


@functools.lru_cache(maxsize=16)
def fourstep_tables(n_fft: int, normalized: bool):
    """Real/imag parts of Wm, twiddle, W128 + inverse variants (numpy f32).

    The forward scale (1 or 1/sqrt(N)) is folded into W128; the inverse
    scale (1/N or 1/sqrt(N)) into the inverse W128.
    """
    m = n_fft // LANE
    b = np.arange(LANE)
    a = np.arange(m)
    wm = np.exp(-2j * np.pi * np.outer(a, a) / m)            # (a, d)
    twt = np.exp(-2j * np.pi * np.outer(a, b) / n_fft)       # (d, b)
    w128 = np.exp(-2j * np.pi * np.outer(b, b) / LANE)       # (b, e)
    fscale = 1.0 / math.sqrt(n_fft) if normalized else 1.0
    iscale = 1.0 / math.sqrt(n_fft) if normalized else 1.0 / n_fft
    f32 = lambda x: np.ascontiguousarray(x, np.float32)  # noqa: E731
    return dict(
        # wm/iwm are consumed as compile-time scalar literals (f64 numpy) by
        # the unrolled small-DFT stages — never shipped to the device
        wm_re=wm.real.copy(), wm_im=wm.imag.copy(),
        iwm_re=wm.real.copy(), iwm_im=(-wm.imag).copy(),
        twt_re=f32(twt.real), twt_im=f32(twt.imag),
        # lane-flat twiddles for the lane-major kernels: (1, m*128), lane
        # index 128*d + b — the (m, 128) table flattened row-major
        twtf_re=f32(twt.real.reshape(1, m * LANE)),
        twtf_im=f32(twt.imag.reshape(1, m * LANE)),
        w128_re=f32(w128.real * fscale), w128_im=f32(w128.imag * fscale),
        w128_sum=f32((w128.real + w128.imag) * fscale),   # Karatsuba 3rd op
        # inverse: conj, inverse scale on the W128 stage; the inverse twiddle
        # is derived from twt_re/twt_im by negation
        iw128_re=f32(w128.real * iscale), iw128_im=f32(-w128.imag * iscale),
        iw128_sum=f32((w128.real - w128.imag) * iscale),
    )


# tables that live on-device (the rest are compile-time literals)
DEVICE_TABLE_KEYS = (
    "twt_re", "twt_im", "w128_re", "w128_im", "w128_sum",
    "iw128_re", "iw128_im", "iw128_sum",
)

# device tables for the lane-major kernels (flat twiddles instead of (m, 128))
LANE_TABLE_KEYS = (
    "twtf_re", "twtf_im", "w128_re", "w128_im", "w128_sum",
    "iw128_re", "iw128_im", "iw128_sum",
)


def _dot2(x, w, scheme):
    """Plain 2-D matmul at the precision scheme — the Mosaic-optimal shape
    (big row count, 128-deep contraction)."""
    return _dot3(x, w, (((1,), (0,)), ((), ())), scheme)


def _small_dft_rows(f3, wmat, neg=None, prune_eps: float = 1e-12):
    """``out[:, d, :] = sum_a wmat[a, d] * f3[:, a, :]`` with the (m, m)
    weights unrolled as compile-time scalar literals.

    This is the four-step's m-point DFT stage.  Mosaic lowers both a
    (bt, m, 128) swapaxes and a batched 3-D dot to something ~30 us for
    these shapes, while m^2 literal-weighted VPU FMAs over 128-minor slices
    cost ~2-8 us — so the small stage deliberately stays off the MXU.
    Exact-zero weights (m is a power of two, so a quarter of the trig table)
    are pruned at trace time.  ``neg``, when given, is a second (f3n, wmatn)
    pair subtracted in the same accumulation (used for the complex->real
    inverse stage).
    """
    bt, m, lane = f3.shape
    cols = []
    for d in range(wmat.shape[1]):
        acc = None

        def add(acc, sl, c):
            if abs(c) < prune_eps:
                return acc
            term = sl if c == 1.0 else (-sl if c == -1.0 else sl * c)
            return term if acc is None else acc + term

        for a in range(m):
            acc = add(acc, f3[:, a, :], float(wmat[a, d]))
        if neg is not None:
            f3n, wmatn = neg
            for a in range(m):
                acc = add(acc, f3n[:, a, :], -float(wmatn[a, d]))
        if acc is None:
            acc = jnp.zeros((bt, lane), f3.dtype)
        cols.append(acc[:, None, :])
    return jnp.concatenate(cols, axis=1)


# ---------------------------------------------------------------------------
# Radix m-point stage: the naive literal stage costs ~2m^2 VPU FMAs per
# 128-lane slice per direction (the kernel's VPU hotspot at n_fft >= 2048 —
# see benchmarks.md roofline).  A recursive radix-2 Cooley-Tukey over the
# same (bt, 128) slices with compile-time-literal twiddles cuts that to
# O(m log m): the butterflies share sub-expressions structurally, XLA's CSE
# dedupes the recursion's repeated evens/odds work, and its DCE drops the
# imaginary parts of the final inverse stage (only the real output is
# consumed).  Weights within 1e-12 of 0/+-1 are pruned to adds/negs exactly
# like the naive stage.  Selectable via SPECINV_MSTAGE=naive for A/B.

_MSTAGE = None  # resolved lazily so tests can monkeypatch the env


def _mstage_mode():
    global _MSTAGE
    if _MSTAGE is None:
        import os

        _MSTAGE = os.environ.get("SPECINV_MSTAGE", "radix")
    return _MSTAGE


def _cmul_lit(p, cr, ci, eps=1e-12):
    """(re, im) slice pair times the literal complex scalar cr + j*ci.

    Parts are jnp arrays or None (exact zero); 0/+-1 coefficients prune to
    copies/negations so pure-rotation twiddles (+-1, +-j) cost nothing.
    """
    re, im = p

    def term(sl, c):
        if sl is None or abs(c) < eps:
            return None
        if abs(c - 1.0) < eps:
            return sl
        if abs(c + 1.0) < eps:
            return -sl
        return sl * c

    def comb(a, b):  # a - b with None as zero
        if a is None:
            return None if b is None else -b
        return a if b is None else a - b

    def comb2(a, b):  # a + b
        if a is None:
            return b
        return a if b is None else a + b

    return (comb(term(re, cr), term(im, ci)),
            comb2(term(re, ci), term(im, cr)))


def _cadd(p, q):
    pr, pi = p
    qr, qi = q
    add = lambda a, b: b if a is None else (a if b is None else a + b)  # noqa: E731
    return (add(pr, qr), add(pi, qi))


def _csub(p, q):
    return _cadd(p, _cmul_lit(q, -1.0, 0.0))


def _clist_fft(xs, inverse):
    """Radix-2 DIT FFT over a list of (re, im) slice pairs, literal
    twiddles, natural-order output.  No scale (matches wm/iwm)."""
    m = len(xs)
    if m == 1:
        return list(xs)
    if m % 2:  # non-power-of-two m never occurs (n_fft = m * 128, m = 2^k)
        raise ValueError(f"radix m-stage needs even m, got {m}")
    ev = _clist_fft(xs[0::2], inverse)
    od = _clist_fft(xs[1::2], inverse)
    h = m // 2
    sgn = 1.0 if inverse else -1.0
    out = [None] * m
    for k in range(h):
        ang = sgn * 2.0 * np.pi * k / m
        t = _cmul_lit(od[k], float(np.cos(ang)), float(np.sin(ang)))
        out[k] = _cadd(ev[k], t)
        out[k + h] = _csub(ev[k], t)
    return out


def _stack_parts(parts, bt, lane, dtype):
    cols = [
        (jnp.zeros((bt, lane), dtype) if p is None else p)[:, None, :]
        for p in parts
    ]
    return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)


def _m_dft_fwd(f3):
    """m-point forward DFT of real rows: (bt, m, 128) -> (a_re, a_im)."""
    bt, m, lane = f3.shape
    ys = _clist_fft([(f3[:, a, :], None) for a in range(m)], inverse=False)
    return (_stack_parts([y[0] for y in ys], bt, lane, f3.dtype),
            _stack_parts([y[1] for y in ys], bt, lane, f3.dtype))


def _m_idft_real(r_re, r_im):
    """m-point inverse DFT (no scale), real part only: -> (bt, m, 128)."""
    bt, m, lane = r_re.shape
    ys = _clist_fft(
        [(r_re[:, d, :], r_im[:, d, :]) for d in range(m)], inverse=True
    )
    return _stack_parts([y[0] for y in ys], bt, lane, r_re.dtype)


def fwd4(frames_nat, t, scheme):
    """Forward four-step: natural frames (bt, n_fft) f32 -> permuted
    spectrum (s_re, s_im), each (bt, m, 128).

    The two 128-contraction stages are large 2-D matmuls; the m-point stage
    is literal-weighted VPU work (radix-2 by default, naive-sum via
    SPECINV_MSTAGE=naive — see _small_dft_rows).  No transposes, no
    batched dots, every tensor 128-minor.
    """
    bt, n_fft = frames_nat.shape
    m = n_fft // LANE
    f3 = frames_nat.reshape(bt, m, LANE)                     # M[a, b]
    if _mstage_mode() == "radix":
        a_re, a_im = _m_dft_fwd(f3)                          # (bt, m_d, 128_b)
    else:
        a_re = _small_dft_rows(f3, t["wm_re"])               # (bt, m_d, 128_b)
        a_im = _small_dft_rows(f3, t["wm_im"])
    t_re = (a_re * t["twt_re"] - a_im * t["twt_im"]).reshape(bt * m, LANE)
    t_im = (a_re * t["twt_im"] + a_im * t["twt_re"]).reshape(bt * m, LANE)
    # Karatsuba complex matmul: 3 dots instead of 4
    #   d1 = tr@wr, d2 = ti@wi, d3 = (tr+ti)@(wr+wi)
    #   s_re = d1 - d2, s_im = d3 - d1 - d2
    d1 = _dot2(t_re, t["w128_re"], scheme)
    d2 = _dot2(t_im, t["w128_im"], scheme)
    d3 = _dot2(t_re + t_im, t["w128_sum"], scheme)
    s_re = d1 - d2
    s_im = d3 - d1 - d2
    return s_re.reshape(bt, m, LANE), s_im.reshape(bt, m, LANE)


def inv4_real(p_re, p_im, t, scheme):
    """Inverse four-step, real part only: permuted spectrum (bt, m, 128)
    -> natural frames (bt, n_fft) f32."""
    bt, m, _ = p_re.shape
    p_re2 = p_re.reshape(bt * m, LANE)                       # rows (t, d)
    p_im2 = p_im.reshape(bt * m, LANE)
    # Karatsuba (iw128_sum = re + im of the conjugated, scaled W128)
    d1 = _dot2(p_re2, t["iw128_re"], scheme)
    d2 = _dot2(p_im2, t["iw128_im"], scheme)
    d3 = _dot2(p_re2 + p_im2, t["iw128_sum"], scheme)
    q_re = d1 - d2
    q_im = d3 - d1 - d2
    q_re = q_re.reshape(bt, m, LANE)                         # (bt, m_d, 128_b)
    q_im = q_im.reshape(bt, m, LANE)
    r_re = q_re * t["twt_re"] + q_im * t["twt_im"]           # conj twiddle
    r_im = -q_re * t["twt_im"] + q_im * t["twt_re"]
    # real part only: out[:, a, :] = sum_d (r_re iwm_re - r_im iwm_im)[d, a]
    if _mstage_mode() == "radix":
        o = _m_idft_real(r_re, r_im)
    else:
        o = _small_dft_rows(r_re, t["iwm_re"], neg=(r_im, t["iwm_im"]))
    return o.reshape(bt, m * LANE)                           # n = 128a + b


# ---------------------------------------------------------------------------
# Lane-major four-step (whole-run lane kernels, see fullrun_lane.py).
#
# The (bt, m, 128) layout's m-axis slices each cost a full sublane relayout
# in Mosaic (round-4 attribution: ~30 us/iter of the north star).  Here
# frames and spectrum stay (bt, n_fft) LANE-major: the radix recursion's
# leaves are 128-aligned lane slices (free vreg column selects), and the
# spectrum's flat lane index is 128*d + e — exactly ``reshape(-1)`` of the
# permuted (m, 128) layout, so drivers convert with a free reshape.  The
# m-point stage is always the radix expression tree (same op order as
# _m_dft_fwd — bitwise-identical values, different physical layout).


def _cat_lane(parts, bt, dtype):
    cols = [jnp.zeros((bt, LANE), dtype) if p is None else p for p in parts]
    return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)


def fwd4_lane(frames_nat, t, scheme, leaf_dots: bool = True):
    """Forward four-step, lane-major: natural frames (bt, n_fft) f32 ->
    flat-permuted spectrum (s_re, s_im), each (bt, n_fft), lane 128*d + e.

    ``leaf_dots``: run the Karatsuba W128 dots per 128-lane leaf
    ((bt, 128) @ (128, 128) x m) instead of one merged (bt*m, 128) dot —
    the merge costs a (bt, m*128) -> (bt*m, 128) relayout each direction
    that measures ~2x the whole kernel's residue at m=16.
    """
    bt, n_fft = frames_nat.shape
    m = n_fft // LANE
    ys = _clist_fft(
        [(frames_nat[:, a * LANE : (a + 1) * LANE], None) for a in range(m)],
        inverse=False,
    )
    a_re = _cat_lane([y[0] for y in ys], bt, frames_nat.dtype)
    a_im = _cat_lane([y[1] for y in ys], bt, frames_nat.dtype)
    t_re = a_re * t["twtf_re"] - a_im * t["twtf_im"]
    t_im = a_re * t["twtf_im"] + a_im * t["twtf_re"]
    # Sub-8-row dots are merged regardless: XLA:CPU's matmul is row-UNstable
    # below M=8 (same rows give 1-ulp-different results at different M, which
    # breaks batch-chunking bitwise invariance in interpret mode), and tiny
    # leaf dots have no relayout to save anyway.
    if leaf_dots and bt >= 8:
        pr, pi = [], []
        for d in range(m):
            tr = t_re[:, d * LANE : (d + 1) * LANE]
            ti = t_im[:, d * LANE : (d + 1) * LANE]
            d1 = _dot2(tr, t["w128_re"], scheme)
            d2 = _dot2(ti, t["w128_im"], scheme)
            d3 = _dot2(tr + ti, t["w128_sum"], scheme)
            pr.append(d1 - d2)
            pi.append(d3 - d1 - d2)
        return (
            _cat_lane(pr, bt, frames_nat.dtype),
            _cat_lane(pi, bt, frames_nat.dtype),
        )
    tr = t_re.reshape(bt * m, LANE)
    ti = t_im.reshape(bt * m, LANE)
    d1 = _dot2(tr, t["w128_re"], scheme)
    d2 = _dot2(ti, t["w128_im"], scheme)
    d3 = _dot2(tr + ti, t["w128_sum"], scheme)
    return (d1 - d2).reshape(bt, n_fft), (d3 - d1 - d2).reshape(bt, n_fft)


def inv4_real_lane(p_re, p_im, t, scheme, leaf_dots: bool = True):
    """Inverse four-step, lane-major, real part only: flat-permuted
    (bt, n_fft) spectrum -> natural real frames (bt, n_fft)."""
    bt, n_fft = p_re.shape
    m = n_fft // LANE
    if leaf_dots and bt >= 8:  # sub-8-row dots merge (see fwd4_lane)
        qr, qi = [], []
        for d in range(m):
            pr = p_re[:, d * LANE : (d + 1) * LANE]
            pi = p_im[:, d * LANE : (d + 1) * LANE]
            d1 = _dot2(pr, t["iw128_re"], scheme)
            d2 = _dot2(pi, t["iw128_im"], scheme)
            d3 = _dot2(pr + pi, t["iw128_sum"], scheme)
            qr.append(d1 - d2)
            qi.append(d3 - d1 - d2)
        q_re = _cat_lane(qr, bt, p_re.dtype)
        q_im = _cat_lane(qi, bt, p_re.dtype)
    else:
        pr = p_re.reshape(bt * m, LANE)
        pi = p_im.reshape(bt * m, LANE)
        d1 = _dot2(pr, t["iw128_re"], scheme)
        d2 = _dot2(pi, t["iw128_im"], scheme)
        d3 = _dot2(pr + pi, t["iw128_sum"], scheme)
        q_re = (d1 - d2).reshape(bt, n_fft)
        q_im = (d3 - d1 - d2).reshape(bt, n_fft)
    r_re = q_re * t["twtf_re"] + q_im * t["twtf_im"]       # conj twiddle
    r_im = -q_re * t["twtf_im"] + q_im * t["twtf_re"]
    ys = _clist_fft(
        [
            (r_re[:, d * LANE : (d + 1) * LANE],
             r_im[:, d * LANE : (d + 1) * LANE])
            for d in range(m)
        ],
        inverse=True,
    )
    return _cat_lane([y[0] for y in ys], bt, p_re.dtype)


def tables_as_jnp(n_fft: int, normalized: bool):
    """Device tables as jnp arrays; wm/iwm stay numpy (compile-time literals)."""
    t = dict(fourstep_tables(n_fft, normalized))
    for k in DEVICE_TABLE_KEYS:
        t[k] = jnp.asarray(t[k])
    return t


# ---------------------------------------------------------------------------
# Layout conversion helpers (XLA side, used by the kernel drivers)


def extend_hermitian_mag(target_os: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Onesided magnitude (..., F) -> full (..., n_fft) (mirror, no conj)."""
    return jnp.concatenate([target_os, target_os[..., -2:0:-1]], axis=-1)


def extend_hermitian_spec(spec_os: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Onesided complex spectrum (..., F) -> full (..., n_fft)."""
    return jnp.concatenate(
        [spec_os, jnp.conj(spec_os[..., -2:0:-1])], axis=-1
    )


def to_permuted(full: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Full-spectrum layout (..., n_fft) -> permuted (..., m, 128):
    out[..., d, e] = full[..., d + m*e]."""
    m = n_fft // LANE
    return jnp.swapaxes(full.reshape(*full.shape[:-1], LANE, m), -1, -2)


def from_permuted(perm: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Permuted (..., m, 128) -> full-spectrum layout (..., n_fft)."""
    m = n_fft // LANE
    return jnp.swapaxes(perm, -1, -2).reshape(*perm.shape[:-2], n_fft)
