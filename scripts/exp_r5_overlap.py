"""Round-5 probe: does Mosaic/TPU overlap MXU dots with VPU work when two
independent chains are interleaved in program order?

Decides whether the VERDICT-r4 item-2 refactor (software-pipelining the
lane engine's half-blocks so block k+1's Karatsuba dots issue during block
k's radix stage) can pay at all.

Kernels (one grid step, C chain steps in an in-kernel fori_loop):
  serial1  — one chain:   x = vpu(mxu(x))            (C steps)
  serial2  — two chains run back-to-back: x chain then y chain (2C steps
             of dependent work, same op mix)
  inter2   — two chains INTERLEAVED per step: push x-dot, push y-dot,
             then x-vpu, y-vpu (2C steps of work, but x-vpu can overlap
             y-dot if the compiler/hardware pipelines)

If t(inter2) ≈ t(serial2): no overlap — record the pipelining item as a
measured negative.  If t(inter2) << t(serial2) (toward max(mxu, vpu)):
the refactor is worth building.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS, LANES = 64, 128
C = 64  # chain steps per grid step


def vpu_stage(x):
    # ~radix-ish VPU work: a handful of adds/muls/selects per element
    a = x * 1.000001 + 0.5
    b = a * a - x
    c = jnp.where(b > 0, b, a)
    return c * 0.999999 - 0.25


def _kernel(x_ref, w_ref, o_ref, *, mode):
    w = w_ref[...]

    def dot(v):
        return jax.lax.dot_general(
            v, w, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    x0 = x_ref[0]
    y0 = x_ref[1]

    if mode == "serial1":
        def body(_, x):
            return vpu_stage(dot(x))

        xf = jax.lax.fori_loop(0, C, body, x0)
        o_ref[0] = xf
        o_ref[1] = y0
    elif mode == "serial2":
        def body(_, x):
            return vpu_stage(dot(x))

        xf = jax.lax.fori_loop(0, C, body, x0)
        yf = jax.lax.fori_loop(0, C, body, y0)
        o_ref[0] = xf
        o_ref[1] = yf
    else:  # inter2
        def body(_, xy):
            x, y = xy
            dx = dot(x)
            dy = dot(y)
            return vpu_stage(dx), vpu_stage(dy)

        xf, yf = jax.lax.fori_loop(0, C, body, (x0, y0))
        o_ref[0] = xf
        o_ref[1] = yf


def launch(mode, n_steps):
    kern = functools.partial(_kernel, mode=mode)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, ROWS, LANES)),
        jnp.float32) * 0.01
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((LANES, LANES)),
        jnp.float32) * 0.05

    f = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((2, ROWS, LANES), lambda i: (0, 0, 0)),
                  pl.BlockSpec((LANES, LANES), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((2, ROWS, LANES), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, ROWS, LANES), jnp.float32),
    )

    @jax.jit
    def run():
        return jnp.sum(f(x, w))

    return run


def timed(run):
    for k in range(4):
        t0 = time.perf_counter()
        try:
            float(np.asarray(run()))
            return time.perf_counter() - t0
        except Exception:  # noqa: BLE001
            if k == 3:
                raise
            time.sleep(2.0)


def main():
    rounds = 5
    lo, hi = 200, 3200
    runs = {}
    for mode in ("serial1", "serial2", "inter2"):
        runs[mode] = {it: launch(mode, it) for it in (lo, hi)}
        for it in (lo, hi):
            timed(runs[mode][it])
        print(f"# warm {mode}", flush=True)
    t = {m: {lo: [], hi: []} for m in runs}
    for r in range(rounds):
        for m in runs:
            t[m][lo].append(timed(runs[m][lo]))
            t[m][hi].append(timed(runs[m][hi]))
        print(f"# round {r} done", flush=True)
    for m in runs:
        d = min(t[m][hi]) - min(t[m][lo])
        per_step = d / (hi - lo)
        print(json.dumps({
            "mode": m,
            "us_per_grid_step": round(per_step * 1e6, 3),
            "us_per_chain_step": round(
                per_step / C * 1e6 / (1 if m == "serial1" else 2), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
