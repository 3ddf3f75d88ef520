"""Is the scan-under-shard_map overhead tied to the fused backend's i8
state carries (layout pinning) or structural? Same-claim A/B: xla backend
sharded vs unsharded scan, fused sharded vs unsharded scan."""
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
rng = np.random.default_rng(0)

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[-1].ravel()[0])

def unsharded_scan(cfg):
    gate = jnp.array(True)
    def body_fn(s, blk):
        st, out = step(cfg, s, blk[0], blk[1], gate, seq=blk[2])
        w = out.wire if out.wire is not None else c64_to_i8_iq(out.aligned)
        wr = out.wire_ref if out.wire is not None else c64_to_i8_iq(out.ref)
        return st, ((w, wr), pack_telemetry(out.telemetry))
    @partial(jax.jit, donate_argnums=(0,))
    def run(state, sigs, refs, seqs):
        st, (p, t) = jax.lax.scan(body_fn, state, (sigs, refs, seqs))
        return st, p, t
    return run

def burst(fn, cfg, sigs, refs, seqs, reps=4, gate_arg=False):
    st = init_state(cfg)
    out = fn(st, sigs, refs, jnp.array(True), seqs) if gate_arg else fn(st, sigs, refs, seqs)
    sync(out[-1])
    best = 1e9
    for _ in range(3):
        st2 = init_state(cfg)
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            r = (fn(st2, sigs, refs, jnp.array(True), seqs) if gate_arg
                 else fn(st2, sigs, refs, seqs))
            st2, o = r[0], r[-1]
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3 / K

res = {}
for name, kw in [("fused", dict(fft_impl="fused", lag_method="phase_zoom")),
                 ("xla", dict())]:
    cfg = PipelineConfig(n_channels=N, block_len=L, **kw)
    flat = kw.get("fft_impl") == "fused"
    sigs = jnp.asarray(rng.integers(0, 256, (K, N, 2*L) if flat else (K, N, L, 2), dtype=np.uint8))
    refs = jnp.asarray(rng.integers(0, 256, (K, 2*L) if flat else (K, L, 2), dtype=np.uint8))
    seqs = jnp.ones((N,), jnp.uint32)[None] + jnp.arange(K, dtype=jnp.uint32)[:, None]
    u = unsharded_scan(cfg)
    res[f"u_{name}_ms_blk"] = round(burst(u, cfg, sigs, refs, seqs), 3)
    _, s_scan = make_sharded_server_jits(cfg, make_mesh(1, 1), scan_depth=K)
    res[f"s_{name}_ms_blk"] = round(burst(s_scan, cfg, sigs, refs, seqs, gate_arg=True), 3)
print(json.dumps(res))
