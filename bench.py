"""Benchmark: aligned IQ samples/s/chip at 21 channels (BASELINE.json metric).

Runs the full coherent-alignment pipeline on the real chip and prints ONE
JSON line. The baseline is the reference C++ system's real-time operating
point — 21 channels x 2.048 Msps (its maximum demonstrated configuration,
README.md:42 / SURVEY.md §6) — i.e. 43.008e6 aligned complex samples/s.

Two paths are measured:
  * offline engine (measure->smooth->apply, batched over blocks) — the
    throughput path; this is the headline number.
  * streaming step (block-at-a-time, feedback state) — must beat real time.
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
BASELINE_SAMPLES_PER_S = 21 * 2.048e6  # reference real-time operating point


def _inputs(T=None):
    rng = np.random.default_rng(0)
    if T is None:
        sig = rng.integers(0, 256, (N_CH, L, 2), dtype=np.uint8)
        ref = rng.integers(0, 256, (L, 2), dtype=np.uint8)
    else:
        sig = rng.integers(0, 256, (T, N_CH, L, 2), dtype=np.uint8)
        ref = rng.integers(0, 256, (T, L, 2), dtype=np.uint8)
    return jnp.asarray(sig), jnp.asarray(ref)


def bench_offline(n_iters=8):
    cfg = PipelineConfig(n_channels=N_CH, block_len=L)
    sig, ref = _inputs(T_BLOCKS)

    @jax.jit
    def run(sig, ref):
        res = align_offline(cfg, sig, ref, smoothing="global")
        # Wire-format output (int8) — what the packetizer publishes; also
        # avoids complex host transfers, unsupported on this backend.
        return c64_to_i8_iq(res.aligned), res.delay, res.mag

    out = jax.block_until_ready(run(sig, ref))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run(sig, ref)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    samples = (T_BLOCKS - 1) * N_CH * L
    return samples / dt


def bench_streaming(n_iters=64):
    cfg = PipelineConfig(n_channels=N_CH, block_len=L)
    sig, ref = _inputs()
    gate = jnp.array(True)

    @jax.jit
    def run(state, sig, ref):
        state, out = step(cfg, state, sig, ref, gate)
        return state, c64_to_i8_iq(out.aligned)

    state = init_state(cfg)
    state, wire = jax.block_until_ready(run(state, sig, ref))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, wire = run(state, sig, ref)
    jax.block_until_ready(wire)
    dt = (time.perf_counter() - t0) / n_iters
    return N_CH * L / dt


def main():
    offline = bench_offline()
    streaming = bench_streaming()
    value = max(offline, streaming)
    print(
        json.dumps(
            {
                "metric": "aligned_iq_samples_per_s_per_chip_21ch",
                "value": round(value, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(value / BASELINE_SAMPLES_PER_S, 3),
                "offline_samples_per_s": round(offline, 1),
                "streaming_samples_per_s": round(streaming, 1),
                "streaming_realtime_factor": round(
                    streaming / BASELINE_SAMPLES_PER_S, 3
                ),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
