#!/usr/bin/env python3
"""Interleaved same-claim A/B probe — the ONLY valid way to compare jit
variants in this environment (docs/PERF.md round-5 #5): claim condition
drifts over MINUTES inside one process, so two bench fields measured
sequentially can differ 1.5x while an interleaved round-robin measures
them identical. Warm every variant first, then time them round-robin,
min-of-reps.

Ships with the round-5 demonstration case: four scan32 streaming variants
differing only in per-step OUTPUT emission (lean wire+residual; full
wire+wire_ref+packed telemetry; no-ref; no-telem). Round-robin result:
all within ±2% — per-step scan output emission costs nothing (the
historical 0.61-0.66 "sharded serving ratio" was drift, not emission).

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/probe_interleaved_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np

from coherent_rtlsdr_tpu.pipeline import PipelineConfig, init_state, step
from coherent_rtlsdr_tpu.pipeline.state import (
    pack_state,
    pack_state_host,
    pack_telemetry,
    unpack_state,
)

N, L, K, CHAIN, REPS = 21, 8192, 32, 4, 3


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0])


def make_variant(cfg, variant):
    def run(pstate, sigs, refs, gate, seqs):
        state = unpack_state(*pstate)

        def body(s, blk):
            s2, out = step(cfg, s, blk[0], blk[1], gate, seq=blk[2])
            if variant == "lean":
                o = (out.wire, out.telemetry.residual)
            elif variant == "full":
                o = (out.wire, out.wire_ref, pack_telemetry(out.telemetry))
            elif variant == "noref":
                o = (out.wire, pack_telemetry(out.telemetry))
            else:  # notelem
                o = (out.wire, out.wire_ref)
            return s2, o

        state, outs = jax.lax.scan(body, state, (sigs, refs, seqs))
        return pack_state(state), outs

    return jax.jit(run)


def main():
    cfg = PipelineConfig(n_channels=N, block_len=L, fft_impl="fused",
                         lag_method="phase_zoom")
    rng = np.random.default_rng(0)
    sigs = jnp.asarray(rng.integers(0, 256, (K, N, 2 * L), dtype=np.uint8))
    refs = jnp.asarray(rng.integers(0, 256, (K, 2 * L), dtype=np.uint8))
    seqs = jnp.broadcast_to(
        jnp.arange(1, K + 1, dtype=jnp.uint32)[:, None], (K, N)
    )
    gate = jnp.array(True)
    ps0 = pack_state_host(init_state(cfg))

    fns = {v: make_variant(cfg, v)
           for v in ("lean", "full", "noref", "notelem")}
    for fn in fns.values():  # warm EVERY variant before any timing
        s, o = fn(ps0, sigs, refs, gate, seqs)
        _sync(o)
    res = {}
    for _ in range(REPS):  # round-robin: adjacent-in-time comparisons only
        for v, fn in fns.items():
            t0 = time.perf_counter()
            s = ps0
            o = None
            for _ in range(CHAIN):
                s, o = fn(s, sigs, refs, gate, seqs)
            _sync(o)
            res[v] = min(res.get(v, 1e9),
                         (time.perf_counter() - t0) / (CHAIN * K))
    print(json.dumps({
        v: {"ms_per_blk": round(dt * 1e3, 3),
            "Gsamp_per_s": round(N * L / dt / 1e9, 3)}
        for v, dt in res.items()
    }))


if __name__ == "__main__":
    main()
