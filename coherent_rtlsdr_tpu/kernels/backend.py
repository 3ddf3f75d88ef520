"""Spectral backend selection: one interface over the XLA-FFT natural-order
path and the MXU four-step permuted path, so the pipeline code is written
once (pipeline/step.py, pipeline/offline.py)."""

import dataclasses
from typing import Optional

import jax.numpy as jnp

from coherent_rtlsdr_tpu.kernels.fft4step import FFT4Step, supported_fft_len
from coherent_rtlsdr_tpu.kernels import permuted as perm
from coherent_rtlsdr_tpu.ops.delay import apply_delay_phase_freq
from coherent_rtlsdr_tpu.ops.xcorr import lag_estimate_from_spectra


class XlaSpectral:
    """Natural-order spectra via jnp.fft."""

    def __init__(self, fft_len: int):
        self.fft_len = fft_len

    def fft(self, x):
        return jnp.fft.fft(x, axis=-1)

    def ifft(self, S):
        return jnp.fft.ifft(S, axis=-1)

    def lag_estimate(self, S_sig, S_ref, method):
        return lag_estimate_from_spectra(S_sig, S_ref, method=method)

    def apply_advance(self, S, advance, phase):
        return apply_delay_phase_freq(S, advance, phase)


class MxuSpectral:
    """Permuted-layout spectra via the four-step MXU FFT (einsum or fused
    Pallas kernel)."""

    def __init__(self, fft_len: int, precision: str = "bf16", pallas: bool = False):
        if pallas:
            from coherent_rtlsdr_tpu.kernels.pallas_fft import FFT4StepPallas

            self._fft = FFT4StepPallas(fft_len)
        else:
            self._fft = FFT4Step(fft_len, precision=precision)
        self.fft_len = fft_len

    def fft(self, x):
        return self._fft.fft(x)

    def ifft(self, S):
        return self._fft.ifft(S)

    def lag_estimate(self, S_sig, S_ref, method):
        return perm.lag_estimate_permuted(self._fft, S_sig, S_ref, method=method)

    def apply_advance(self, S, advance, phase):
        # Broadcast over any leading block dims: advance [..., N] applies to
        # spectra [..., N, m, m].
        return perm.apply_delay_phase_permuted(self._fft, S, advance, phase)


def get_spectral(cfg, fft_len: int):
    """Pick the backend from PipelineConfig.fft_impl ('xla' | 'mxu' |
    'pallas' | 'auto'). 'auto' uses MXU when the length is a supported
    square."""
    impl = getattr(cfg, "fft_impl", "xla")
    if impl in ("mxu", "pallas") or (impl == "auto" and supported_fft_len(fft_len)):
        if not supported_fft_len(fft_len):
            raise ValueError(
                f"fft_impl='{impl}' needs a square fft_len in "
                f"{{4096, 16384, 65536}}, got {fft_len}"
            )
        return MxuSpectral(
            fft_len,
            precision=getattr(cfg, "mxu_precision", "bf16"),
            pallas=(impl == "pallas"),
        )
    return XlaSpectral(fft_len)
