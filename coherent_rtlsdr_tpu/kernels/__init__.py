"""TPU kernels for the hot ops.

The profile (see bench.py + SURVEY.md §7 step 4) shows the pipeline is
FFT-dominated and XLA's TPU FFT runs at a few hundred GFLOP/s — far from
the MXU. ``fft4step`` reformulates the 2L-point FFT as two batched 128x128
complex matmuls plus a twiddle (the classic four-step/Bailey factorization),
which the MXU executes at TFLOP rates; the companion ops consume its
permuted-frequency layout directly so no transpose or reordering pass ever
touches HBM.
"""

from coherent_rtlsdr_tpu.kernels.fft4step import (
    FFT4Step,
    supported_fft_len,
)

__all__ = ["FFT4Step", "supported_fft_len"]
