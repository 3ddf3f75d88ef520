"""Measurement/correction ops on the four-step FFT's permuted (k2, k1)
frequency layout — algebraically identical to the natural-order ops in
``ops/xcorr.py`` / ``ops/delay.py`` (equivalence is test-enforced), just
re-indexed so no reordering pass is ever materialized.

Key identities for W = m*m, natural bin k = k2 + m*k1:
  * contiguous 2m-bin bands (the phase-slope band sums) = fixed PAIRS of k1
    columns, all k2 rows: ``G.reshape(.., m, m//2, 2).sum(axis=(-3, -1))``;
  * delay ramps need ``(k*d) mod W`` — computed on the index grid with the
    same exact int32 byte-decomposition as the natural-order path;
  * energies / Parseval sums are permutation-invariant.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from coherent_rtlsdr_tpu.kernels.fft4step import FFT4Step
from coherent_rtlsdr_tpu.ops.xcorr import LagEstimate


def _integer_ramp_phase_grid(fft: FFT4Step, d_int: jnp.ndarray) -> jnp.ndarray:
    """Exact phase fraction ``(k * d) mod W / W`` on the (k2, k1) grid.

    d_int ``[...]`` (float holding integers) -> ``[..., m, m]``. Same
    byte-split trick as ops/delay._integer_delay_ramp_phase: every product
    stays < 2^25 in int32 for W <= 2^16.
    """
    W = fft.fft_len
    k = fft.freq_index_grid()  # [m, m] int32
    dm = jnp.mod(d_int.astype(jnp.int32), W)[..., None, None]
    d0 = dm % 256
    d1 = dm // 256
    r0 = (k * d0) % W
    r1 = (((k * 256) % W) * d1) % W
    return ((r0 + r1) % W).astype(jnp.float32) / W


def delay_ramp_permuted(fft: FFT4Step, delay: jnp.ndarray) -> jnp.ndarray:
    """``exp(-2*pi*i*f_k*delay)`` on the permuted grid (x[n] -> x[n-delay])."""
    d = jnp.asarray(delay, jnp.float32)
    d_int = jnp.floor(d)
    d_frac = (d - d_int)[..., None, None]
    phase = _integer_ramp_phase_grid(fft, d_int) + fft.signed_freq_grid() * d_frac
    return jnp.exp(-2j * jnp.pi * phase).astype(jnp.complex64)


def apply_delay_phase_permuted(
    fft: FFT4Step, Fp: jnp.ndarray, advance: jnp.ndarray, phase: jnp.ndarray
) -> jnp.ndarray:
    """Fractional *advance* + complex phase on permuted spectra
    (``ops.delay.apply_delay_phase_freq`` analog)."""
    ramp = delay_ramp_permuted(fft, -jnp.asarray(advance, jnp.float32))
    return Fp * ramp * jnp.asarray(phase)[..., None, None]


def lag_estimate_permuted(
    fft: FFT4Step,
    Fp_sig: jnp.ndarray,  # [N, m, m]
    Fp_ref: jnp.ndarray,  # [m, m]
    method: str = "phase_slope",
) -> LagEstimate:
    """``ops.xcorr.lag_estimate_from_spectra`` on permuted spectra."""
    W = fft.fft_len
    m = fft.m
    N = Fp_sig.shape[0]

    G = Fp_sig * jnp.conj(Fp_ref)[None]
    c = fft.ifft(G)  # [N, W] natural time order
    m2 = jnp.real(c) ** 2 + jnp.imag(c) ** 2

    peak_idx = jnp.argmax(m2, axis=-1)
    int_lag = jnp.where(peak_idx > W // 2, peak_idx - W, peak_idx).astype(jnp.float32)

    if method == "phase_slope":
        phase = _integer_ramp_phase_grid(fft, -int_lag)
        Gc = G * jnp.exp(-2j * jnp.pi * phase).astype(G.dtype)
        M = m // 2  # 2m-bin bands, matching the natural-order estimator
        Gb = Gc.reshape(N, m, M, 2).sum(axis=(1, 3))  # [N, M]
        prod = Gb[..., 1:] * jnp.conj(Gb[..., :-1])
        mask = jnp.arange(M - 1) != (M // 2 - 1)  # skip the Nyquist straddle
        s = jnp.sum(prod * mask, axis=-1)
        frac = jnp.clip(-jnp.angle(s) * M / (2.0 * jnp.pi), -0.5, 0.5)
    elif method == "integer":
        frac = jnp.zeros_like(int_lag)
    else:
        raise ValueError(f"unsupported method for permuted layout: {method}")

    gather = jax.vmap(lambda row, i: row[i])
    peak_pow = gather(m2, peak_idx)
    e_sig = jnp.sum(jnp.abs(Fp_sig) ** 2, axis=(-2, -1)) / W
    e_ref = jnp.sum(jnp.abs(Fp_ref) ** 2) / W
    denom = jnp.sqrt(e_sig * e_ref)
    mag = jnp.sqrt(peak_pow) / jnp.where(denom > 0, denom, 1.0)
    mag = mag / jnp.maximum(jnp.abs(jnp.sinc(frac)), 0.5)

    mean_pow = jnp.mean(m2, axis=-1)
    papr = peak_pow / jnp.where(mean_pow > 0, mean_pow, 1.0)

    return LagEstimate(lag=int_lag + frac, mag=mag, papr=papr)
