"""Generate the self-golden quality trajectories (VERDICT r4 weak #4).

Records OUR OWN SC/SNR/SER trajectories — all four algorithms on the
deterministic speech-like corpus at several horizons — into
``tests/goldens/self_quality.json``.  ``tests/test_quality.py``'s
self-golden suite replays the identical calls and asserts the metrics to a
tight band, so a future kernel/engine change that costs quality fails
loudly even when it stays inside the reference-parity Lyapunov bands
(which only guarantee equal-quality CONVERGENCE, not an unchanged
trajectory).

Run under the test environment (CPU x64, 8-dev virtual mesh) so the
goldens capture the exact configuration the tests replay:

    python scripts/gen_self_goldens.py

The recorded numbers pin the XLA (CPU) trajectories; the Pallas kernels
are pinned to these same trajectories transitively through the bitwise
kernel-vs-XLA parity suites in tests/test_pallas.py.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "goldens", "self_quality.json"
)


def main():
    # Import INSIDE main so the env setup above runs first (tests/ is a
    # package, so the relative imports inside test_quality resolve).
    from tests.test_quality import self_golden_cases

    recs = {}
    for name, fn in self_golden_cases().items():
        recs[name] = fn()
        print(f"{name}: {recs[name]}", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(recs, f, indent=1, sort_keys=True)
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
