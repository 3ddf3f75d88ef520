#!/usr/bin/env python3
"""Roofline probe: decide whether the fused engine's ~5% of HBM peak is an
ENVIRONMENT floor or a fixable kernel property (VERDICT r4 weak #2 / next
#2 — the r1 #2b per-block DMA-floor hypothesis was never re-probed after
the kernels moved to grid-pipelined BlockSpecs).

Measures, in ONE process / ONE claim (same-claim A/B is the only valid
comparison on this backend):

  1. pure-DMA ceiling: a Pallas identity-copy kernel over the exact fused
     block geometry ([T, N, m/2, 2m] i8 in -> out), at several T — the
     highest GB/s any Pallas kernel of this shape can reach here;
  2. XLA-copy ceiling: the same bytes through a jitted XLA elementwise op
     (x ^ 0x80) — the compiler's own DMA pipeline as a second reference;
  3. MXU ceiling: a large bf16 matmul chain — achievable TFLOP/s;
  4. the fused measure/apply kernels at T = 64/128/256 — per-window wall
     time, modeled GB/s (bench.fused_cost_model constants) and the
     fraction of the PROBED (not datasheet) ceilings.

All timings fetch-synchronized (CLAUDE.md rule 5). Run as a short fresh
process on the real chip:

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/probe_roofline.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CH = 21
L = 8192
M = int(round((2 * L) ** 0.5))  # 128


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[0])


def _best(call, n=4):
    _sync(call())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = call()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...]


def probe_pallas_copy(T):
    """Identity copy at the fused block geometry: read+write 2 * T*N*2L
    bytes. GB/s here is the Pallas DMA ceiling for this shape."""
    x = jnp.asarray(
        np.random.default_rng(0).integers(
            -128, 128, (T, N_CH, M // 2, 2 * M), dtype=np.int8
        )
    )
    spec = pl.BlockSpec((1, 1, M // 2, 2 * M), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    fn = jax.jit(lambda a: pl.pallas_call(
        _copy_kernel, grid=(T, N_CH), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
    )(a))
    dt = _best(lambda: fn(x))
    gb = 2 * x.size / 1e9
    return gb / dt


def probe_pallas_copy_nc(T, nc=7):
    """Same copy with nc channels per grid step (the fused kernels' grid
    batching) — isolates per-grid-step overhead."""
    x = jnp.asarray(
        np.random.default_rng(0).integers(
            -128, 128, (T, N_CH, M // 2, 2 * M), dtype=np.int8
        )
    )
    spec = pl.BlockSpec((1, nc, M // 2, 2 * M), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    fn = jax.jit(lambda a: pl.pallas_call(
        _copy_kernel, grid=(T, N_CH // nc), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
    )(a))
    dt = _best(lambda: fn(x))
    gb = 2 * x.size / 1e9
    return gb / dt


def probe_xla_copy(T):
    x = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (T, N_CH, 2 * L), dtype=np.uint8
        )
    )
    fn = jax.jit(lambda a: a ^ np.uint8(0x80))
    dt = _best(lambda: fn(x))
    gb = 2 * x.size / 1e9
    return gb / dt


def probe_mxu(n=4096, reps=8):
    """Chained bf16 matmuls: achievable MXU TFLOP/s in this environment."""
    a = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)),
                    jnp.bfloat16)

    @jax.jit
    def fn(a):
        def body(c, _):
            return jnp.dot(c, a, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16) * jnp.bfloat16(1e-2), ()
        c, _ = jax.lax.scan(body, a, None, length=reps)
        return c

    dt = _best(lambda: fn(a))
    return reps * 2 * n**3 / dt / 1e12


def probe_fused(T):
    """The actual measure+apply mega-kernel pair at slab depth T."""
    from bench import fused_cost_model
    from coherent_rtlsdr_tpu.kernels.pallas_fused import FusedPipelineKernels

    k = FusedPipelineKernels(2 * L)
    rng = np.random.default_rng(2)
    raw = jnp.asarray(rng.integers(-128, 128, (T, N_CH, M // 2, 2 * M),
                                   dtype=np.int8))
    ref = jnp.asarray(rng.integers(-128, 128, (T, M // 2, 2 * M),
                                   dtype=np.int8))

    @jax.jit
    def engine(raw, ref):
        lag, zre, zim, mag, papr, dre, dim = k.measure_i8_spec(raw, ref)
        wire = k.apply_spec_i8(dre, dim, lag, mag, papr)  # args arbitrary f32
        return wire, mag

    dt = _best(lambda: engine(raw, ref))
    samples = (T - 1) * N_CH * L
    rate = samples / dt
    bps, fps = fused_cost_model(N_CH, L)
    return dict(
        T=T,
        us_per_window=1e6 * dt / ((T - 1) * N_CH),
        samples_per_s=rate,
        modeled_GBps=rate * bps / 1e9,
        modeled_TFLOPs=rate * fps / 1e12,
    )


def main():
    out = {"device": str(jax.devices()[0])}
    out["pallas_copy_GBps"] = {
        T: round(probe_pallas_copy(T), 1) for T in (64, 256)
    }
    out["pallas_copy_nc7_GBps"] = round(probe_pallas_copy_nc(256), 1)
    out["xla_copy_GBps"] = {T: round(probe_xla_copy(T), 1) for T in (64, 256)}
    out["mxu_TFLOPs"] = round(probe_mxu(), 1)
    out["fused"] = [probe_fused(T) for T in (64, 128, 256)]
    for f in out["fused"]:
        for kk in f:
            f[kk] = round(f[kk], 2) if isinstance(f[kk], float) else f[kk]
    # the verdicts: fraction of the PROBED ceilings
    copy = out["pallas_copy_GBps"][256]
    f256 = out["fused"][-1]
    out["fused_frac_of_probed_dma"] = round(f256["modeled_GBps"] / copy, 3)
    out["fused_frac_of_probed_mxu"] = round(
        f256["modeled_TFLOPs"] / out["mxu_TFLOPs"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
