#!/usr/bin/env python3
"""Offline capture alignment: capture .npz in -> aligned .npz + quality
report out. The measure->smooth->apply engine (pipeline/offline.py), the
capability the reference cannot express (it can only stream).

Usage:
  python apps/align_offline.py capture.npz -o aligned.npz [--smoothing ema]
  python apps/align_offline.py --synth 8 --blocks 32 -o aligned.npz  # demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("capture", nargs="?", default=None)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--smoothing", choices=["global", "ema"], default="global")
    ap.add_argument("--synth", type=int, default=None, help="generate N synthetic channels instead")
    ap.add_argument("--blocks", type=int, default=32)
    ap.add_argument("--block-len", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from coherent_rtlsdr_tpu.ops.convert import c2f, c64_to_i8_iq
    from coherent_rtlsdr_tpu.pipeline import PipelineConfig, align_offline

    if args.synth:
        from coherent_rtlsdr_tpu.signal import make_truth, synth_capture

        with jax.default_device(jax.devices("cpu")[0]):
            truth = make_truth(args.synth, seed=0, max_delay=40.0, snr_db=30.0)
            cap = synth_capture(
                jax.random.PRNGKey(0), truth, n_blocks=args.blocks,
                block_len=args.block_len,
            )
            sig_u8, ref_u8 = np.asarray(cap.sig_u8), np.asarray(cap.ref_u8)
        print(f"synthetic capture: true delays {truth.delays.round(3)}")
        fs = 2.048e6
    else:
        from coherent_rtlsdr_tpu.io.streamio import load_capture

        c = load_capture(args.capture)
        sig_u8, ref_u8, fs = c.sig_u8, c.ref_u8, c.fs

    T, N, L, _ = sig_u8.shape
    cfg = PipelineConfig(n_channels=N, block_len=L)

    @jax.jit
    def run(s, r):
        res = align_offline(cfg, s, r, smoothing=args.smoothing)
        # Real-dtype outputs only (TPU boundary rule).
        return (
            c64_to_i8_iq(res.aligned),
            c64_to_i8_iq(res.ref),
            res.delay,
            res.mag,
            res.papr,
            c2f(res.phase),
        )

    aligned_i8, ref_i8, delay, mag, papr, phase_f = jax.block_until_ready(
        run(jnp.asarray(sig_u8), jnp.asarray(ref_u8))
    )
    delay, mag = np.asarray(delay), np.asarray(mag)
    phase = np.asarray(phase_f)
    phase_c = phase[..., 0] + 1j * phase[..., 1]

    np.savez_compressed(
        args.out,
        aligned_i8=np.asarray(aligned_i8),
        ref_i8=np.asarray(ref_i8),
        delay=delay,
        mag=mag,
        papr=np.asarray(papr),
        phase=phase_c,
        fs=np.float64(fs),
    )
    print(f"aligned {T-1} blocks x {N} ch -> {args.out}")
    print(f"final delays: {delay[-1].round(3)}")
    print(f"mean corr:    {mag.mean(axis=0).round(3)}")
    ang = np.degrees(np.angle(phase_c * np.conj(phase_c.mean(axis=0, keepdims=True))))
    print(f"phase stability (deg RMS over blocks): {np.sqrt(np.mean(ang**2)):.3f}")


if __name__ == "__main__":
    main()
