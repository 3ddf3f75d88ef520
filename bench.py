"""Benchmark: aligned IQ samples/s/chip at 21 channels (BASELINE.json metric).

Runs the full coherent-alignment pipeline on the real chip and prints ONE
JSON line. The baseline is the reference C++ system's real-time operating
point — 21 channels x 2.048 Msps (its maximum demonstrated configuration,
README.md:42 / SURVEY.md §6) — i.e. 43.008e6 aligned complex samples/s.

Paths measured:
  * offline engine (measure->smooth->apply over a 32-block slab) — the
    throughput path and the headline number;
  * streaming, 8-block micro-batch (lax.scan inside one program — the
    online path with 8 blocks of latency, 32 ms at 2.048 Msps);
  * streaming, single block per dispatch (latency-optimal).

Timing note: on this backend ``block_until_ready`` does not actually drain
the execution queue; a small host fetch from the last output does. All
timings are fetch-synchronized.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np

from coherent_rtlsdr_tpu.ops.convert import c64_to_i8_iq
from coherent_rtlsdr_tpu.pipeline import PipelineConfig, align_offline, init_state, step

N_CH = 21
L = 8192
T_BLOCKS = 32  # blocks per offline slab
SCAN_K = 8     # streaming micro-batch depth
BASELINE_SAMPLES_PER_S = 21 * 2.048e6  # reference real-time operating point


def _sync(out):
    """Drain the in-order device queue (block_until_ready is unreliable on
    this backend — a tiny host fetch is the only real barrier)."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0])


def _inputs(T=None):
    rng = np.random.default_rng(0)
    if T is None:
        sig = rng.integers(0, 256, (N_CH, L, 2), dtype=np.uint8)
        ref = rng.integers(0, 256, (L, 2), dtype=np.uint8)
    else:
        sig = rng.integers(0, 256, (T, N_CH, L, 2), dtype=np.uint8)
        ref = rng.integers(0, 256, (T, L, 2), dtype=np.uint8)
    return jnp.asarray(sig), jnp.asarray(ref)


def bench_offline(n_iters=8, **cfg_kw):
    cfg = PipelineConfig(n_channels=N_CH, block_len=L, **cfg_kw)
    sig, ref = _inputs(T_BLOCKS)

    @jax.jit
    def run(sig, ref):
        res = align_offline(cfg, sig, ref, smoothing="global")
        return c64_to_i8_iq(res.aligned), res.delay, res.mag

    out = run(sig, ref)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run(sig, ref)
    _sync(out)
    dt = (time.perf_counter() - t0) / n_iters
    return (T_BLOCKS - 1) * N_CH * L / dt


def bench_streaming_scan(n_iters=8, **cfg_kw):
    cfg = PipelineConfig(n_channels=N_CH, block_len=L, **cfg_kw)
    sig, ref = _inputs(SCAN_K)
    gate = jnp.array(True)

    def scan_fn(state, sigs, refs):
        def body(s, blk):
            s2, out = step(cfg, s, blk[0], blk[1], gate)
            wire = out.wire if out.wire is not None else c64_to_i8_iq(out.aligned)
            return s2, (wire, out.telemetry.residual)
        return jax.lax.scan(body, state, (sigs, refs))

    run = jax.jit(scan_fn, donate_argnums=(0,))
    state = init_state(cfg)
    state, outs = run(state, sig, ref)
    _sync(outs)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, outs = run(state, sig, ref)
    _sync(outs)
    dt = (time.perf_counter() - t0) / n_iters / SCAN_K
    return N_CH * L / dt


def bench_streaming_single(n_iters=32, **cfg_kw):
    cfg = PipelineConfig(n_channels=N_CH, block_len=L, **cfg_kw)
    sig, ref = _inputs()
    gate = jnp.array(True)

    @jax.jit
    def run(state, sig, ref):
        state, out = step(cfg, state, sig, ref, gate)
        wire = out.wire if out.wire is not None else c64_to_i8_iq(out.aligned)
        return state, wire, out.telemetry.residual

    state = init_state(cfg)
    state, wire, r = run(state, sig, ref)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, wire, r = run(state, sig, ref)
    _sync(r)
    dt = (time.perf_counter() - t0) / n_iters
    return N_CH * L / dt


FUSED = dict(fft_impl="fused", lag_method="phase_zoom")


def main():
    offline = bench_offline()
    offline_fused = bench_offline(**FUSED)
    scan = bench_streaming_scan()
    scan_fused = bench_streaming_scan(**FUSED)
    single = bench_streaming_single()
    best_off = max(offline, offline_fused)
    best_scan = max(scan, scan_fused)
    value = max(best_off, best_scan)
    print(
        json.dumps(
            {
                "metric": "aligned_iq_samples_per_s_per_chip_21ch",
                "value": round(value, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(value / BASELINE_SAMPLES_PER_S, 3),
                "offline_samples_per_s": round(offline, 1),
                "offline_fused_samples_per_s": round(offline_fused, 1),
                "streaming_scan8_samples_per_s": round(scan, 1),
                "streaming_scan8_fused_samples_per_s": round(scan_fused, 1),
                "streaming_single_samples_per_s": round(single, 1),
                "streaming_realtime_factor": round(
                    best_scan / BASELINE_SAMPLES_PER_S, 3
                ),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
