#!/usr/bin/env python3
"""Capture recorder — the matlabclient/matsave.cc + measurement_script.m
save-path analog: subscribes to the aligned frame stream and writes either a
replayable .npz capture (io/streamio.py layout) or a MATLAB .mat file.

``-o capture.mat`` produces the measurement_script.m save layout
(measurement_script.m:48-52: variables ``X`` [Nframes*L, C] complex single
with the reference in column 1, ``gseq`` [Nframes], ``seq`` [Nframes, C]),
so the reference's own analysis scripts (pmusicplot etc.) load it
unmodified; samples are scaled 1/128 exactly like the MEX client
(zmqsdr.c:128-135).

Usage:
  python apps/record.py -a tcp://127.0.0.1:5555 --frames 64 -o capture.npz
  python apps/record.py -a tcp://127.0.0.1:5555 --frames 64 -o capture.mat
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

    sig, ref, seqs, gseqs, frames = [], [], [], [], []
    for _ in range(args.frames):
        f = unpack_frame(sub.recv())
        iq_u8 = (f.iq.astype(np.int16) + 128).astype(np.uint8)  # wire int8 -> capture u8
        ref.append(iq_u8[0])
        sig.append(iq_u8[1:])
        seqs.append(f.seqnums[1:])
        gseqs.append(f.globalseqn)
        frames.append(f)

    if args.out.endswith(".mat"):
        import time as _time

        from scipy.io import savemat

        from coherent_rtlsdr_tpu.io.wire import frame_to_matrix

        # measurement_script.m layout: X = [Xc of each frame; ...] with
        # Xc = [L, C] (zmqsdr.c returns r x c column-major), ref = column 1.
        X = np.concatenate(
            [frame_to_matrix(f).T for f in frames], axis=0
        ).astype(np.complex64)                       # [Nframes*L, C]
        savemat(
            args.out,
            {
                "X": X,
                "gseq": np.asarray(gseqs, np.uint32)[:, None],
                "seq": np.stack([f.seqnums for f in frames]).astype(np.uint32),
                # heatmap2d2.cpp:matsave also stamps a time string
                "time": _time.strftime("%c"),
            },
        )
        print(
            f"recorded {len(frames)} frames x {X.shape[1]} ch "
            f"-> {args.out} (MATLAB: X [{X.shape[0]}x{X.shape[1]}] "
            f"single complex, gseq, seq, time)"
        )
        return

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
