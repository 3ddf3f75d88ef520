#!/usr/bin/env python3
"""Capture recorder — the matlabclient/matsave.cc + measurement_script.m
save-path analog: subscribes to the aligned frame stream and writes a
replayable .npz capture (io/streamio.py layout).

Usage:
  python apps/record.py -a tcp://127.0.0.1:5555 --frames 64 -o capture.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-a", "--address", default="tcp://127.0.0.1:5555")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--fs", type=float, default=2.048e6)
    ap.add_argument("--fcenter", type=float, default=1024e6)
    ap.add_argument("--timeout-ms", type=int, default=600000)
    args = ap.parse_args()

    import numpy as np
    import zmq

    from coherent_rtlsdr_tpu.io.streamio import Capture, detect_seqnum_gaps, save_capture
    from coherent_rtlsdr_tpu.io.wire import unpack_frame

    ctx = zmq.Context()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    sub.setsockopt(zmq.RCVTIMEO, args.timeout_ms)
    sub.connect(args.address)

    sig, ref, seqs = [], [], []
    for _ in range(args.frames):
        f = unpack_frame(sub.recv())
        iq_u8 = (f.iq.astype(np.int16) + 128).astype(np.uint8)  # wire int8 -> capture u8
        ref.append(iq_u8[0])
        sig.append(iq_u8[1:])
        seqs.append(f.seqnums[1:])

    cap = Capture(
        sig_u8=np.stack(sig),
        ref_u8=np.stack(ref),
        seqnums=np.stack(seqs),
        fs=args.fs,
        fcenter=args.fcenter,
    )
    save_capture(args.out, cap)
    gaps = detect_seqnum_gaps(cap.seqnums)
    print(
        f"recorded {cap.n_blocks} blocks x {cap.n_channels} ch "
        f"(+ref) -> {args.out}; dropped blocks detected: {int(gaps.sum())}"
    )


if __name__ == "__main__":
    main()
