"""Localize the shard_map serving overhead (same claim): burst-rate of the
single sharded step vs unsharded step, and sharded scan vs unsharded scan
with IDENTICAL outputs (wire, wire_ref, packed telem)."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from coherent_rtlsdr_tpu.parallel import make_mesh
from coherent_rtlsdr_tpu.parallel.sharded import make_sharded_server_jits
from coherent_rtlsdr_tpu.pipeline import PipelineConfig, init_state, step
from coherent_rtlsdr_tpu.pipeline.state import pack_telemetry
from coherent_rtlsdr_tpu.ops.convert import c64_to_i8_iq

N, L, K = 21, 8192, 32
cfg = PipelineConfig(n_channels=N, block_len=L, fft_impl="fused",
                     lag_method="phase_zoom")
rng = np.random.default_rng(0)
sig = jnp.asarray(rng.integers(0, 256, (N, 2*L), dtype=np.uint8))
ref = jnp.asarray(rng.integers(0, 256, (2*L,), dtype=np.uint8))
sigs = jnp.asarray(rng.integers(0, 256, (K, N, 2*L), dtype=np.uint8))
refs = jnp.asarray(rng.integers(0, 256, (K, 2*L), dtype=np.uint8))
seq = jnp.ones((N,), jnp.uint32)
seqs = seq[None] + jnp.arange(K, dtype=jnp.uint32)[:, None]
gate = jnp.array(True)

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[-1].ravel()[0])

# unsharded twins with the SAME outputs as the server jits
@partial(jax.jit, donate_argnums=(0,))
def u_step(state, sig, ref, gate, s):
    st, out = step(cfg, state, sig, ref, gate, seq=s)
    w = out.wire if out.wire is not None else c64_to_i8_iq(out.aligned)
    wr = out.wire_ref if out.wire is not None else c64_to_i8_iq(out.ref)
    return st, w, wr, pack_telemetry(out.telemetry)

@partial(jax.jit, donate_argnums=(0,))
def u_scan(state, sigs, refs, gate, seqs):
    def body(s, blk):
        st, w, wr, t = u_step.__wrapped__(s, blk[0], blk[1], gate, blk[2])
        return st, ((w, wr), t)
    st, (p, t) = jax.lax.scan(body, state, (sigs, refs, seqs))
    return st, p, t

s_step, s_scan = make_sharded_server_jits(cfg, make_mesh(1, 1), scan_depth=K)

def burst(fn, args_fn, reps):
    st = init_state(cfg)
    out = fn(st, *args_fn())
    sync(out[-1])
    best = 1e9
    for _ in range(3):
        st2 = init_state(cfg)
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            r = fn(st2, *args_fn())
            st2, o = r[0], r[-1]
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best

r = {}
r["u_step_ms"] = round(burst(u_step, lambda: (sig, ref, gate, seq), 16)*1e3, 3)
r["s_step_ms"] = round(burst(s_step, lambda: (sig, ref, gate, seq), 16)*1e3, 3)
r["u_scan_ms_per_blk"] = round(burst(u_scan, lambda: (sigs, refs, gate, seqs), 4)*1e3/K, 3)
r["s_scan_ms_per_blk"] = round(burst(s_scan, lambda: (sigs, refs, gate, seqs), 4)*1e3/K, 3)
print(json.dumps(r))
