"""Synthetic multichannel signal model — the hardware-free backend.

The reference has no fake backend and no automated tests (SURVEY.md §4); all
its validation is hardware-in-the-loop MATLAB. This package generates exactly
the physical situation the hardware creates — N channels that are delayed,
phase-rotated, clock-skewed, noisy copies of a shared reference-noise signal —
with known ground truth, so lag estimation, phase correction, and the control
loop are unit-testable, and benchmarks are reproducible.
"""

from coherent_rtlsdr_tpu.signal.synth import (
    ChannelTruth,
    SynthCapture,
    make_truth,
    synth_capture,
    quantize_u8,
)

__all__ = [
    "ChannelTruth",
    "SynthCapture",
    "make_truth",
    "synth_capture",
    "quantize_u8",
]
