"""B-scaling probe on the whole-run GL kernel (direct fused_gl_run calls).

Isolates the B=64 batched-occupancy regression (VERDICT r3 weak #3) from
the public-API glue: same 2 s clips as exp_r4 sec_batch, but the marginal
is measured on the raw kernel launch so phase_init / layout transposes /
readback size are out of the loop (they cancel in the marginal anyway —
this pins the in-kernel per-iteration scaling itself).

Usage: python scripts/exp_b64probe.py [--rounds N] [--packs 1,2,4]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_common import readback  # noqa: E402
from exp_r4 import gl_inputs, interleave  # noqa: E402


def main():
    from specinv_tpu.ops.pallas.gl_fullrun4 import choose_pack, fused_gl_run

    rounds = 7
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    packs = (1, 2)
    if "--packs" in sys.argv:
        packs = tuple(
            int(p) for p in sys.argv[sys.argv.index("--packs") + 1].split(","))

    lr = jnp.float32(0.99 / 1.99)
    for B in (16, 32, 64):
        cfg, wj, geo, T, tgt, x_pad, inv_env = gl_inputs(
            seconds=2, n_fft=2048, B=B)
        auto = choose_pack(cfg, T, B, block_t=geo.block_t, with_mag=False)
        print(json.dumps({
            "B": B, "T": T, "block_t": geo.block_t, "t_pad": geo.t_pad,
            "auto_pack": auto}), flush=True)
        variants = {}
        for pack in packs:
            if B % pack:
                continue
            # Reduce to a scalar INSIDE the jit so the readback moves 4
            # bytes, not a (B, Lx) waveform — a 13 MB readback through the
            # ~14 MB/s tunnel is ~1 s of jitter that swamps the contrast.
            run = jax.jit(functools.partial(
                lambda it, pack: jnp.sum(fused_gl_run(
                    x_pad, tgt, tgt * 0.25, tgt, wj, inv_env, lr, cfg,
                    geo.e, n_iters=it, block_t=geo.block_t,
                    emit_state=True, with_mag=False, pack=pack)[0]),
                pack=pack), static_argnums=0)
            variants[f"B{B}p{pack}"] = run
        # contrast sized for >=1.5 s of kernel compute at every B
        out = interleave(
            variants, rounds, lo=50, hi=50 + max(2000, 150000 // B))
        for name, us in out.items():
            print(json.dumps({
                "variant": name,
                "us_per_clip_iter": round(us / B, 3)}), flush=True)


if __name__ == "__main__":
    main()
