"""Batched FFT cross-correlation and sample-lag estimation.

Capability parity with the reference's coherence engine (``ccoherent::computelag``,
src/ccoherent.cc:154-239): batched forward FFT -> per-channel conjugate multiply
with the reference spectrum -> batched inverse FFT -> magnitude-squared ->
argmax -> fractional-peak refinement -> recentered signed lag.

Improvements over the reference (deliberate, per SURVEY.md §7):
  * The reference's 3-point quadratic fractional-peak estimator was shipped
    **disabled** ("obviously it's not doing what it's supposed to do",
    ccoherent.cc:206-222). We provide two working fractional estimators:
    ``parabolic`` (3-point on the correlation magnitude) and the default
    ``phase_slope`` — a frequency-domain delay estimator on the
    integer-lag-compensated cross-spectrum, which is unbiased for bandlimited
    noise and accurate to ~1e-3 samples at the reference's operating SNR.
  * ``est_PAPR`` is an empty stub in the reference (csdrdevice.cc:71-74,
    cdsp.cc:85-88); here the correlation PAPR (the validation metric used by
    matlabclient/seqnum_and_correlation.m) is computed for real.
  * All N channels are estimated every round (the reference round-robins at
    most nfft-1=7 channels per block, main.cc:165).

Sign convention: ``lag > 0`` means the signal channel is *delayed* by ``lag``
samples relative to the reference (sig[n] = ref[n - lag]). Correction
therefore *advances* the signal by ``lag``.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LagEstimate(NamedTuple):
    """Per-channel lag measurement (pytree of arrays, leading dims = batch).

    Mirrors the reference's ``lagpoint{ts, lag, mag, PAPR}``
    (include/csdrdevice.h:42-54); timestamps are handled by the host edge.
    """

    lag: jnp.ndarray   # signed fractional lag in samples
    mag: jnp.ndarray   # normalized correlation coefficient in [0, 1]
    papr: jnp.ndarray  # peak-to-average power ratio of |xcorr|^2 (linear)


def cross_spectrum(
    sig: jnp.ndarray, ref: jnp.ndarray, fft_len: Optional[int] = None
) -> jnp.ndarray:
    """Zero-padded cross-spectra ``FFT(sig) * conj(FFT(ref))``.

    sig: ``[..., L]`` complex, ref: ``[L]`` complex. Zero-padding to
    ``fft_len`` (default 2L) gives linear-correlation semantics — the same
    trick the reference implements by filling complementary half-buffers
    (crtlsdr.cc:205-223) and zeroing the workspaces (ccoherent.cc:66-75).
    """
    L = sig.shape[-1]
    W = fft_len or 2 * L
    fs = jnp.fft.fft(sig, n=W, axis=-1)
    fr = jnp.fft.fft(ref, n=W, axis=-1)
    return fs * jnp.conj(fr)


def xcorr_circular(
    sig: jnp.ndarray, ref: jnp.ndarray, fft_len: Optional[int] = None
) -> jnp.ndarray:
    """Full cross-correlation sequence ``c[m]``, m in FFT ordering.

    ``c[m]`` for ``m < W/2`` is the correlation at lag ``+m``; bins above
    ``W/2`` hold negative lags ``m - W`` (recentering done by the estimator,
    matching the reference's ``lag -= blocksize>>1`` at ccoherent.cc:232).
    """
    G = cross_spectrum(sig, ref, fft_len)
    return jnp.fft.ifft(G, axis=-1)


def parabolic_peak_offset(ym: jnp.ndarray, y0: jnp.ndarray, yp: jnp.ndarray) -> jnp.ndarray:
    """3-point parabolic peak offset in [-0.5, 0.5].

    The estimator the reference *intended* (ccoherent.cc:206-217) with the
    sign/denominator fixed: offset = 0.5 (y- - y+) / (y- - 2 y0 + y+).
    """
    denom = ym - 2.0 * y0 + yp
    offset = 0.5 * (ym - yp) / jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    return jnp.clip(jnp.where(jnp.abs(denom) > 1e-20, offset, 0.0), -0.5, 0.5)


def _phase_slope_offset(
    G: jnp.ndarray, int_lag: jnp.ndarray, n_bands: int = 64
) -> jnp.ndarray:
    """Fractional lag from the integer-compensated cross-spectrum.

    With ``G[k] ~ |A_k|^2 exp(-2*pi*i*k*d/W)``, removing the integer part
    leaves a residual ramp of |frac| < 1 turn across the band. A naive
    adjacent-bin slope (``angle(sum G'[k+1] conj(G'[k]))``) measures a
    per-bin increment of 2*pi*frac/W — ~1e-4 rad for W=16384, far below the
    noise floor, so it pegs (measured failure). Instead the spectrum is
    coherently summed into ``n_bands`` coarse bands (within-band rotation
    <= 2*pi*0.5/M, negligible decoherence and angle-symmetric, so unbiased)
    and the slope is taken band-to-band, where the increment is
    2*pi*frac/M — three orders of magnitude above the noise. This is the
    fractional estimator the reference intended but shipped disabled
    (ccoherent.cc:206-222). Unambiguous for |frac| < 0.5.
    """
    from coherent_rtlsdr_tpu.ops.delay import _integer_delay_ramp_phase

    W = G.shape[-1]
    M = min(n_bands, max(4, W // 4))
    # exp(+2pi*i*k*int_lag/W) with the k*lag product reduced mod W exactly
    # (f32 would lose ~eps*|lag| cycles of phase at large lags).
    phase = _integer_delay_ramp_phase(W, -int_lag)
    Gc = G * jnp.exp(-2j * jnp.pi * phase).astype(G.dtype)
    Gb = Gc.reshape(*Gc.shape[:-1], M, W // M).sum(axis=-1)
    prod = Gb[..., 1:] * jnp.conj(Gb[..., :-1])
    # The true ramp is exp(-2*pi*i*f_k*frac) in SIGNED frequencies, which in
    # unsigned FFT ordering has a 2*pi*frac phase jump at Nyquist (k = W/2).
    # The one band product straddling that jump would shrink the estimate by
    # ~|R(Nyquist)|^2/|R|^2 * frac (measured as 0.1-0.15-sample bias on
    # full-band noise) — mask it out.
    mask = jnp.arange(M - 1) != (M // 2 - 1)
    s = jnp.sum(prod * mask, axis=-1)
    return jnp.clip(-jnp.angle(s) * M / (2.0 * jnp.pi), -0.5, 0.5)


def _phase_zoom_estimate(G: jnp.ndarray) -> LagEstimate:
    """IFFT-free lag estimation: two banded phase-slope stages.

    Stage 1 (coarse): M1 = W/8 bands -> per-band increment 2*pi*d/M1,
    unambiguous |d| < W/16, resolution ~1 sample (noisy but roundable).
    Stage 2 (fine): compensate the rounded coarse lag, M2 = 64 bands ->
    ~1e-3-sample accuracy as in the argmax path.

    Skipping ifft+|.|^2+argmax removes three full-spectrum HBM passes from
    the measurement — the pipeline is bandwidth-bound (measured: MXU-matmul
    FFTs and XLA FFTs run at the same wall clock). The cost: unambiguous
    range shrinks from W/2 to W/16 (still 1024 samples at W=16384). PAPR
    comes free via Parseval without the IFFT — peak |c| ~ |z|/W and
    mean|c|^2 = sum|G|^2/W^2, so papr = |z|^2/sum|G|^2 — the same formula
    as the fused Pallas kernel (kernels/pallas_fused.py), so telemetry PAPR
    is consistent across backends. mag is the exact correlation coefficient
    *at the fractional lag* (Sum(Gc)/W normalized) rather than the
    sinc-corrected integer-peak value.
    """
    W = G.shape[-1]
    M1 = max(64, W // 8)

    def band_slope(Gc, M):
        Gb = Gc.reshape(*Gc.shape[:-1], M, W // M).sum(axis=-1)
        prod = Gb[..., 1:] * jnp.conj(Gb[..., :-1])
        mask = jnp.arange(M - 1) != (M // 2 - 1)  # skip Nyquist straddle
        s = jnp.sum(prod * mask, axis=-1)
        return -jnp.angle(s) * M / (2.0 * jnp.pi)

    from coherent_rtlsdr_tpu.ops.delay import _integer_delay_ramp_phase

    d1 = band_slope(G, M1)
    int_lag = jnp.round(d1)
    phase = _integer_delay_ramp_phase(W, -int_lag)
    Gc = G * jnp.exp(-2j * jnp.pi * phase).astype(G.dtype)
    frac = jnp.clip(band_slope(Gc, 64), -4.0, 4.0)

    # Full-compensation coherent sum = correlation value at the estimated
    # (fractional) lag; normalize by the window energies (Parseval).
    frac_ramp = jnp.exp(
        (2j * jnp.pi)
        * jnp.fft.fftfreq(W).astype(jnp.float32)
        * frac[..., None]
    ).astype(G.dtype)
    z = jnp.sum(Gc * frac_ramp, axis=-1)
    e2 = jnp.sum(jnp.abs(G) ** 2, axis=-1)  # = sum |F_sig|^2 |F_ref|^2
    # |z| <= sqrt(W * sum|G|^2) by Cauchy-Schwarz; for flat spectra
    # sum|G|^2/W ~ E_sig*E_ref/W^2 * W ... use the direct energies instead:
    mag = jnp.abs(z)  # caller normalizes; see lag_estimate_from_spectra
    papr = mag * mag / jnp.where(e2 > 0, e2, 1.0)
    return LagEstimate(lag=int_lag + frac, mag=mag, papr=papr)


def lag_estimate_from_spectra(
    F_sig: jnp.ndarray,
    F_ref: jnp.ndarray,
    valid_corr_len: Optional[int] = None,
    method: str = "phase_slope",
) -> LagEstimate:
    """Lag estimation given precomputed spectra (lets the pipeline reuse the
    overlap-save window FFTs — one FFT pass feeds both measurement and
    correction, unlike the reference's separate lag-queue FFT batch).

    F_sig: ``[N, W]``; F_ref: ``[W]``. ``valid_corr_len`` limits the argmax
    search to lags in ``(-V/2, V/2]`` (e.g. exclude zero-padding artifacts).
    """
    N, W = F_sig.shape
    G = F_sig * jnp.conj(F_ref)[None, :]

    if method == "phase_zoom":
        est = _phase_zoom_estimate(G)
        e_sig = jnp.sum(jnp.abs(F_sig) ** 2, axis=-1) / W
        e_ref = jnp.sum(jnp.abs(F_ref) ** 2) / W
        denom = W * jnp.sqrt(e_sig * e_ref)
        mag = est.mag / jnp.where(denom > 0, denom, 1.0)
        return LagEstimate(lag=est.lag, mag=mag, papr=est.papr)

    c = jnp.fft.ifft(G, axis=-1)
    m2 = jnp.real(c) ** 2 + jnp.imag(c) ** 2

    if valid_corr_len is not None and valid_corr_len < W:
        V = valid_corr_len
        idx = jnp.arange(W)
        signed = jnp.where(idx > W // 2, idx - W, idx)
        mask = (signed > -V // 2) & (signed <= V // 2)
        m2_search = jnp.where(mask[None, :], m2, 0.0)
    else:
        m2_search = m2

    peak_idx = jnp.argmax(m2_search, axis=-1)  # cdsp::indexofmax analog
    int_lag = jnp.where(peak_idx > W // 2, peak_idx - W, peak_idx).astype(jnp.float32)

    if method == "phase_slope":
        frac = _phase_slope_offset(G, int_lag)
    elif method == "parabolic":
        gather = jax.vmap(lambda row, i: row[i])
        y0 = jnp.sqrt(gather(m2, peak_idx))
        ym = jnp.sqrt(gather(m2, (peak_idx - 1) % W))
        yp = jnp.sqrt(gather(m2, (peak_idx + 1) % W))
        frac = parabolic_peak_offset(ym, y0, yp)
    elif method == "integer":
        frac = jnp.zeros_like(int_lag)
    else:
        raise ValueError(f"unknown fractional-lag method: {method}")

    # Normalized correlation coefficient: |c_peak| / sqrt(E_sig * E_ref),
    # where c = ifft(G) is the circular correlation itself and the
    # time-domain energies come from Parseval (E = sum|F|^2 / W).
    gather = jax.vmap(lambda row, i: row[i])
    peak_pow = gather(m2, peak_idx)
    e_sig = jnp.sum(jnp.abs(F_sig) ** 2, axis=-1) / W
    e_ref = jnp.sum(jnp.abs(F_ref) ** 2) / W
    denom = jnp.sqrt(e_sig * e_ref)
    mag = jnp.sqrt(peak_pow) / jnp.where(denom > 0, denom, 1.0)
    # The integer-bin peak underestimates a fractionally-offset Dirichlet
    # peak by sinc(frac) (down to 0.64 at frac=0.5); undo the scalloping so
    # mag reads as the true correlation coefficient.
    mag = mag / jnp.maximum(jnp.abs(jnp.sinc(frac)), 0.5)

    mean_pow = jnp.mean(m2, axis=-1)
    papr = peak_pow / jnp.where(mean_pow > 0, mean_pow, 1.0)

    return LagEstimate(lag=int_lag + frac, mag=mag, papr=papr)


def lag_estimate_batched(
    sig: jnp.ndarray,
    ref: jnp.ndarray,
    fft_len: Optional[int] = None,
    method: str = "phase_slope",
) -> LagEstimate:
    """Standalone batched lag estimation: sig ``[N, L]`` vs ref ``[L]``.

    The whole of ccoherent::computelag (ccoherent.cc:154-239) as one
    jit-friendly expression — with one deliberate difference: no
    zero-padding. The reference pads to 2L for linear-correlation semantics
    (its blocks are cut from unrelated dongle streams). For contiguous
    windows of the *same* stream — the only case this framework feeds —
    circular correlation keeps full window energy AND keeps the
    cross-spectrum a pure phase ramp, which the ``phase_slope`` fractional
    estimator needs (zero-padding correlates adjacent bins through the
    Dirichlet interpolation kernel and biases any slope estimate by up to
    ~0.9 samples — measured). Lags are unambiguous for |lag| < L/2.
    """
    W = fft_len or sig.shape[-1]
    F_sig = jnp.fft.fft(sig, n=W, axis=-1)
    F_ref = jnp.fft.fft(ref, n=W, axis=-1)
    return lag_estimate_from_spectra(F_sig, F_ref, method=method)


def lag_estimate(
    sig: jnp.ndarray,
    ref: jnp.ndarray,
    fft_len: Optional[int] = None,
    method: str = "phase_slope",
) -> LagEstimate:
    """Single-channel convenience wrapper: sig ``[L]`` vs ref ``[L]``."""
    est = lag_estimate_batched(sig[None, :], ref, fft_len, method)
    return LagEstimate(lag=est.lag[0], mag=est.mag[0], papr=est.papr[0])
