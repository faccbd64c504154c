"""Shared helpers for the on-chip experiment scripts.

The axon tunnel throws transient errors on readbacks (UNIMPLEMENTED /
FAILED_PRECONDITION); every measurement readback retries a few times with a
short sleep before giving up.  One definition here so the retry policy can't
silently diverge across sweeps.
"""
import time

import numpy as np


def readback(a, tries=3, sleep_s=2.0):
    for attempt in range(tries):
        try:
            return np.asarray(a)
        except Exception:  # noqa: BLE001 — transient tunnel errors
            if attempt == tries - 1:
                raise
            time.sleep(sleep_s)
