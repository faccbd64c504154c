"""Mosaic capability probe for the four-step matmul-FFT kernel design.

Each case compiles + runs a tiny Pallas kernel on the real chip and checks
the result against numpy.  Prints one line per case.  Run alone on the chip.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

BT, M, L = 8, 16, 128


def run_case(name, kernel, out_shape, inputs, ref_fn):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*inputs)
        got = np.asarray(out)
        want = ref_fn(*[np.asarray(x) for x in inputs])
        err = float(np.max(np.abs(got - want)))
        print(f"{name}: OK maxerr={err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = repr(e).replace("\n", " ")[:200]
        print(f"{name}: FAIL {msg}", flush=True)


def main():
    rng = np.random.default_rng(0)
    a3 = jnp.asarray(rng.standard_normal((BT, M, L)).astype(np.float32))
    w_l = jnp.asarray(rng.standard_normal((L, L)).astype(np.float32))
    w_m = jnp.asarray(rng.standard_normal((M, M)).astype(np.float32))
    a2 = jnp.asarray(rng.standard_normal((M, L)).astype(np.float32))

    # 1. batched dot: (BT, M, L) x (L, L) contract last dim
    def k1(a_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run_case(
        "batched_dot_lastdim (BT,M,L)x(L,L)", k1, (BT, M, L), (a3, w_l),
        lambda a, w: np.einsum("bml,lk->bmk", a, w),
    )

    # 2. batched dot contracting the MIDDLE dim: (BT, M, L) x (M, M)
    def k2(a_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run_case(
        "batched_dot_middim (BT,M,L)x(M,M)->(BT,L,M)", k2, (BT, L, M),
        (a3, w_m), lambda a, w: np.einsum("bml,mk->blk", a, w),
    )

    # 3. swapaxes of last two dims (BT, M, L) -> (BT, L, M)
    def k3(a_ref, o_ref):
        o_ref[...] = jnp.swapaxes(a_ref[...], 1, 2)

    run_case(
        "swapaxes12 (BT,M,L)->(BT,L,M)", k3, (BT, L, M), (a3,),
        lambda a: np.swapaxes(a, 1, 2),
    )

    # 4. 2D transpose (M, L) -> (L, M)
    def k4(a_ref, o_ref):
        o_ref[...] = a_ref[...].T

    run_case("transpose2d (M,L)->(L,M)", k4, (L, M), (a2,),
             lambda a: a.T)

    # 5. lhs-dim0 contraction: (M, L) with (M, M) over dim0 -> (L, M)
    def k5(a_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], w_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run_case(
        "lhsT_dot (M,L)^T x (M,M) -> (L,M)", k5, (L, M), (a2, w_m),
        lambda a, w: np.einsum("ml,mk->lk", a, w),
    )

    # 6. reshape (BT*M, L) view of a (BT, M, L) block
    def k6(a_ref, o_ref):
        o_ref[...] = a_ref[...].reshape(BT * M, L)

    run_case("reshape3d->2d", k6, (BT * M, L), (a3,),
             lambda a: a.reshape(BT * M, L))

    # 7. batched dot with explicit batch dims: (BT,M,L)x(BT,L,L)
    wb = jnp.broadcast_to(w_l, (BT, L, L))
    def k7(a_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], w_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    run_case(
        "true_batched_dot (BT,M,L)x(BT,L,L)", k7, (BT, M, L),
        (a3, jnp.asarray(wb)), lambda a, w: np.einsum("bml,blk->bmk", a, w),
    )


if __name__ == "__main__":
    main()
