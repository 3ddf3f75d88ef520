#!/usr/bin/env python3
"""Dispatch-pipelining probe: does issuing a jit call return before the
device finishes (async dispatch), or does the host block in the relay RPC
for the whole execution (docs/PERF.md round-2 #4 said it blocks)?

Decides whether the streaming server can hide the per-dispatch floor by
keeping TWO dispatches in flight (double-dispatch) or whether deeper
lax.scan micro-batches are the only lever.

Prints one JSON line:
  serial_ms    per-call wall with a fetch-sync after every call
  burst_ms     per-call wall for 8 back-to-back calls, ONE sync at the end
  issue_ms     wall for the dispatch call alone (no sync)
  pipelining   burst/serial < 0.75 -> calls overlap; ~1.0 -> serial

Run as a short fresh process on the TPU (CLAUDE.md rule 4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    @jax.jit
    def work(x):
        def body(c, _):
            return c @ c * 1e-3 + x, ()

        c, _ = jax.lax.scan(body, x, None, length=200)
        return c

    x = jnp.asarray(np.eye(512, dtype=np.float32))

    def sync(r):
        np.asarray(r.ravel()[0])

    sync(work(x))  # compile + claim

    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(work(x))
    serial = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = work(x)
    sync(r)
    burst = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    r = work(x)
    issue = time.perf_counter() - t0
    sync(r)

    print(json.dumps({
        "serial_ms": round(serial * 1e3, 3),
        "burst_ms": round(burst * 1e3, 3),
        "issue_ms": round(issue * 1e3, 3),
        "pipelining": bool(burst < 0.75 * serial),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
