#!/usr/bin/env python3
"""Phase-drift monitor — the :5557 debug-stream client.

The reference's one real telemetry consumer is phasecorrectionplot.m
(matlabclient/phasecorrectionplot.m:12-51): subscribe the debug PUB port,
record every frame's per-channel complex phase-correction factor for a long
window (30-min plots in the paper workflow), and plot the drift. This is
that tool as a shippable app:

  python apps/phase_drift.py -a tcp://localhost:5557 --frames 200
  python apps/phase_drift.py --seconds 1800 --npz drift.npz --mat drift.mat
  python apps/phase_drift.py --follow            # live one-line updates

Outputs per-channel drift statistics (RMS about the mean, peak excursion),
an ASCII phase-vs-time plot, and optional .npz / .mat exports with relative
timestamps (same payload layout the MATLAB script builds: frames x channels
phases in degrees).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coherent_rtlsdr_tpu.io.wire import unpack_debug


def collect(addr: str, frames=None, seconds=None, timeout_ms=5000,
            on_frame=None):
    """SUB-subscribe the debug port; returns (phases [T, N] complex64,
    t_rel [T] seconds). Stops at `frames`, `seconds`, or receive timeout."""
    import zmq

    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    sub.setsockopt(zmq.RCVTIMEO, timeout_ms)
    sub.connect(addr)
    out, ts = [], []
    t0 = None
    try:
        while True:
            if frames is not None and len(out) >= frames:
                break
            if t0 is not None and seconds is not None and \
                    time.perf_counter() - t0 >= seconds:
                break
            try:
                buf = sub.recv()
            except zmq.Again:
                break
            now = time.perf_counter()
            if t0 is None:
                t0 = now
            ph = unpack_debug(buf)
            out.append(ph)
            ts.append(now - t0)
            if on_frame is not None:
                on_frame(len(out), ph)
    finally:
        sub.close(0)
    if not out:
        return np.zeros((0, 0), np.complex64), np.zeros(0)
    n = min(len(p) for p in out)  # channel count can change on hot add/del
    return np.stack([p[:n] for p in out]), np.asarray(ts)


def drift_stats(phases: np.ndarray):
    """Per-channel drift about the window mean, on the unwrapped phase
    timeline (phasecorrectionplot.m plots angle(phasecorr) over time).

    Statistics run in float64: angle(complex64) is float32, and NumPy's
    strided axis-0 reduction over a [T, N] float32 array accumulates
    naively — at 30-min recordings (~120k frames of ~-112 deg) the mean
    was off by ~0.14 deg, dwarfing the real ~0.02 deg RMS drift (caught
    against the round-5 soak artifact)."""
    deg = np.degrees(np.unwrap(np.angle(phases).astype(np.float64), axis=0))
    dev = deg - deg.mean(axis=0, keepdims=True)
    return deg, np.sqrt((dev**2).mean(axis=0)), np.abs(dev).max(axis=0)


def ascii_plot(t, deg, width=72, height=16):
    """Phase-vs-time ASCII chart, one glyph per channel."""
    lo, hi = float(deg.min()), float(deg.max())
    span = (hi - lo) or 1.0
    grid = [[" "] * width for _ in range(height)]
    glyphs = "0123456789abcdefghijklmnopqrstuvwxyz"
    tmax = float(t[-1]) if len(t) and t[-1] > 0 else 1.0
    for c in range(deg.shape[1]):
        for i in range(deg.shape[0]):
            x = min(width - 1, int(t[i] / tmax * (width - 1)))
            y = min(height - 1, int((hi - deg[i, c]) / span * (height - 1)))
            grid[y][x] = glyphs[c % len(glyphs)]
    lines = [f"{hi:+8.2f} deg"] + ["  |" + "".join(row) for row in grid]
    lines.append(f"{lo:+8.2f} deg  ({tmax:.1f} s window)")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-a", "--address", default="tcp://localhost:5557")
    ap.add_argument("--frames", type=int, default=None,
                    help="stop after this many debug frames")
    ap.add_argument("--seconds", type=float, default=None,
                    help="observation window (the reference plots 30 min)")
    ap.add_argument("--timeout", type=float, default=5.0,
                    help="receive timeout ending the collection (s)")
    ap.add_argument("--npz", default=None, help="save phases/timestamps .npz")
    ap.add_argument("--mat", default=None,
                    help="save a MATLAB .mat (phasedeg [T, N], t [T])")
    ap.add_argument("--follow", action="store_true",
                    help="live mode: print a drift line every second")
    ap.add_argument("--plot", action="store_true", help="ASCII phase plot")
    args = ap.parse_args()
    if args.frames is None and args.seconds is None:
        args.frames = 100

    last = [0.0]

    def live(i, ph):
        now = time.perf_counter()
        if now - last[0] < 1.0:
            return
        last[0] = now
        ang = np.degrees(np.angle(ph))
        print(f"[{i}] phase(deg): " +
              " ".join(f"{a:+7.2f}" for a in ang), flush=True)

    phases, t = collect(
        args.address, frames=args.frames, seconds=args.seconds,
        timeout_ms=int(args.timeout * 1000),
        on_frame=live if args.follow else None,
    )
    if phases.size == 0:
        print("no debug frames received (is the server publishing on "
              f"{args.address}?)", file=sys.stderr)
        return 1
    deg, rms, peak = drift_stats(phases)
    n_frames, n_ch = deg.shape
    print(f"{n_frames} frames x {n_ch} channels over {t[-1]:.2f} s "
          f"(ch 0 = reference)")
    for c in range(n_ch):
        print(f"  ch{c}: drift {rms[c]:7.3f} deg RMS   "
              f"peak {peak[c]:7.3f} deg   mean {deg[:, c].mean():+8.2f} deg")
    worst = int(rms[1:].argmax()) + 1 if n_ch > 1 else 0
    print(f"worst signal channel: ch{worst} ({rms[worst]:.3f} deg RMS)")
    if args.plot:
        print(ascii_plot(t, deg))
    if args.npz:
        np.savez(args.npz, phases=phases, phase_deg=deg, t=t)
        print(f"saved {args.npz}")
    if args.mat:
        from scipy.io import savemat

        savemat(args.mat, {"phasedeg": deg, "t": t,
                           "phasecorr": phases.astype(np.complex64)},
                appendmat=False)
        print(f"saved {args.mat}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
