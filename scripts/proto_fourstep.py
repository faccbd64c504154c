"""Numpy prototype of the four-step matmul-FFT for the GL kernel redesign.

Factorization (N = n_fft = m * 128, a in [0,m), b in [0,128), k = c + 128*d
with c in [0,128), d in [0,m)):

  forward (input: frame in TRANSPOSED layout F_t[a, b] = x[a + m*b]):
      G[a, c] = sum_b F_t[a, b] * W128[b, c]          (batched dot, contract 128)
      T[a, c] = G[a, c] * W_N^{a*c}                   (elementwise twiddle)
      X[c, d] = sum_a T[a, c] * Wm[a, d]              (batched dot, contract m)
    spectrum layout: S_mat[c, d] = X[c + 128*d]       ("permuted layout")

  inverse (input: spectrum in permuted layout, output frames in F_t layout):
      Q[c, a] = sum_d S[c, d] * conj(Wm)[d, a]
      R[c, a] = Q[c, a] * conj(W_N)^{a*c}
      x[a + m*b] = (1/N) * sum_c R[c, a] * conj(W128)[c, b]   -> out[a, b]

Wait — the derivation in-session used n = a + m*b?? Verify numerically below;
this file IS the verification.  Also validates the full-spectrum Hermitian
GL iteration == onesided reference iteration.
"""
import numpy as np

rng = np.random.default_rng(0)


def wmat(n, sign=-1):
    idx = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(idx, idx) / n)


def fourstep_fwd(x, m):
    """x: (..., N) real/complex -> permuted-layout spectrum (..., 128, m):
    S[..., c, d] = FFT(x)[c + 128*d]."""
    N = x.shape[-1]
    assert N == m * 128
    a_idx = np.arange(m)
    c_idx = np.arange(128)
    W128 = wmat(128)                       # (b, c)
    Wm = wmat(m)                           # (a, d)
    twiddle = np.exp(-2j * np.pi * np.outer(a_idx, c_idx) / N)  # (a, c)
    # transposed-layout frame: F_t[a, b] = x[a + m*b]
    F_t = x.reshape(*x.shape[:-1], 128, m)  # [b, a] natural
    F_t = np.swapaxes(F_t, -1, -2)          # [a, b]
    G = F_t @ W128                          # (a, c)
    T = G * twiddle
    X = np.swapaxes(T, -1, -2) @ Wm         # (c, a) @ (a, d) -> (c, d)
    return X


def fourstep_inv(S, m):
    """Permuted-layout spectrum (..., 128, m) -> x (..., N) (complex)."""
    N = m * 128
    a_idx = np.arange(m)
    c_idx = np.arange(128)
    W128c = wmat(128, +1)                   # (c, b)... check orientation below
    Wmc = wmat(m, +1)                       # (d, a)
    twiddlec = np.exp(+2j * np.pi * np.outer(c_idx, a_idx) / N)  # (c, a)
    Q = S @ Wmc                             # (c, d) @ (d, a) -> (c, a)
    R = Q * twiddlec
    out = np.swapaxes(R, -1, -2) @ W128c    # (a, c) @ (c, b) -> (a, b)
    out = out / N
    # x[a + m*b] = out[a, b]
    x = np.swapaxes(out, -1, -2).reshape(*S.shape[:-2], N)
    return x


def check_transforms():
    for m in (4, 8, 16, 32):
        N = m * 128
        x = rng.standard_normal((3, N))
        S = fourstep_fwd(x, m)
        ref = np.fft.fft(x, axis=-1)
        ref_mat = np.swapaxes(ref.reshape(3, m, 128), -1, -2)  # [c, d]? k=c+128d
        # k = c + 128*d -> ref.reshape(m, 128) is [d, c]; transpose -> [c, d]
        err = np.max(np.abs(S - ref_mat))
        xi = fourstep_inv(S, m)
        err2 = np.max(np.abs(xi - x))
        print(f"m={m:3d} fwd err {err:.3e} roundtrip err {err2:.3e}")


def check_gl_equivalence():
    """Full-spectrum Hermitian GL iteration == onesided iteration."""
    N, m, hop, T = 2048, 16, 512, 7
    L = (T - 1) * hop + N
    win = np.hanning(N + 1)[:-1]
    x = rng.standard_normal(L)

    def frames_of(sig):
        return np.stack([sig[t * hop : t * hop + N] * win for t in range(T)])

    def ola(fr):
        out = np.zeros(L)
        for t in range(T):
            out[t * hop : t * hop + N] += fr[t] * win
        return out

    target_os = np.abs(np.fft.rfft(frames_of(x), axis=-1)) * (
        1 + 0.1 * rng.standard_normal((T, N // 2 + 1))
    )
    # onesided reference iteration
    lr = 0.5
    pre_os = np.zeros((T, N // 2 + 1), complex)
    sig_os = x.copy()
    # full-spectrum permuted iteration
    tgt_full = np.concatenate([target_os, target_os[:, -2:0:-1]], axis=-1)
    # permuted layout of the target: [d, c] -> [c, d]
    tgt_p = np.swapaxes(tgt_full.reshape(T, m, 128), -1, -2)
    pre_p = np.zeros((T, 128, m), complex)
    sig_p = x.copy()

    for it in range(4):
        # onesided
        S = np.fft.rfft(frames_of(sig_os), axis=-1)
        S = S - lr * pre_os
        pre_os = S
        P = S * (target_os / (np.abs(S) + 1e-16))
        fr = np.fft.irfft(P, n=N, axis=-1)
        sig_os = ola(fr)
        # full permuted
        Sp = fourstep_fwd(frames_of(sig_p), m)
        Sp = Sp - lr * pre_p
        pre_p = Sp
        Pp = Sp * (tgt_p / (np.abs(Sp) + 1e-16))
        frp = fourstep_inv(Pp, m).real
        sig_p = ola(frp)
    print("GL equivalence err:", np.max(np.abs(sig_os - sig_p)))


if __name__ == "__main__":
    check_transforms()
    check_gl_equivalence()
