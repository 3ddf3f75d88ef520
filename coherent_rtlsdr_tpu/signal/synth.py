"""Synthetic N-channel coherent-capture generator with ground truth.

Physical model (mirrors the reference rig, README.md:40 / electronics/):
a wideband reference noise source is split through directional couplers into
every receiver; receiver ``i`` sees

    sig_i(t) = gain_i * exp(j*phase_i) * ref(t - delay_i - skew_i(t)) + noise_i(t)

with ``skew_i(t) = ppm_i * 1e-6 * t`` modeling residual clock-rate offset
(zero when dongles share the 28.8 MHz clock, nonzero to test tracking), then
8-bit offset-binary quantization (the RTL2832 ADC path).

All generation is pure JAX, so captures can be synthesized on-device at
benchmark scale without a host round-trip.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coherent_rtlsdr_tpu.ops.delay import delay_ramp, farrow_fractional_delay


@dataclasses.dataclass(frozen=True)
class ChannelTruth:
    """Ground-truth channel parameters (numpy, host-side)."""

    delays: np.ndarray  # [N] samples (positive = channel lags the reference)
    phases: np.ndarray  # [N] radians
    gains: np.ndarray   # [N] linear
    ppm: np.ndarray     # [N] parts-per-million residual clock skew
    snr_db: float


@dataclasses.dataclass(frozen=True)
class SynthCapture:
    """A generated capture: ``T`` blocks of ``N`` channels x ``L`` samples.

    ``ref_u8``: [T, L, 2] uint8 — the reference channel's own capture.
    ``sig_u8``: [T, N, L, 2] uint8 — signal channels.
    ``ref_clean``: [T*L] complex64 — unquantized reference (for oracles).
    """

    ref_u8: jnp.ndarray
    sig_u8: jnp.ndarray
    ref_clean: jnp.ndarray
    truth: ChannelTruth
    block_len: int


def make_truth(
    n_channels: int,
    seed: int = 0,
    max_delay: float = 40.0,
    snr_db: float = 30.0,
    max_ppm: float = 0.0,
) -> ChannelTruth:
    rng = np.random.default_rng(seed)
    return ChannelTruth(
        delays=rng.uniform(-max_delay, max_delay, n_channels).astype(np.float32),
        phases=rng.uniform(-np.pi, np.pi, n_channels).astype(np.float32),
        gains=rng.uniform(0.7, 1.0, n_channels).astype(np.float32),
        ppm=rng.uniform(-max_ppm, max_ppm, n_channels).astype(np.float32),
        snr_db=snr_db,
    )


def quantize_u8(x: jnp.ndarray, scale: float = 127.0) -> jnp.ndarray:
    """complex64 [..., L] -> offset-binary uint8 [..., L, 2] (ADC model)."""
    iq = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1) * scale
    return (jnp.clip(jnp.round(iq), -128.0, 127.0) + 128.0).astype(jnp.uint8)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def synth_capture(
    key: jax.Array,
    truth: ChannelTruth,
    n_blocks: int,
    block_len: int = 8192,
    amplitude: float = 0.25,
    bandwidth: float = 1.0,
    dtype=jnp.complex64,
) -> SynthCapture:
    """Generate a capture with known ground truth.

    ``amplitude`` sets the reference RMS per I/Q rail as a fraction of int8
    full scale (0.25 keeps clipping negligible). ``bandwidth`` < 1 lowpasses
    the reference noise to that fraction of fs (the physical noise source is
    wideband but the tuner filters it).
    """
    N = len(truth.delays)
    T, L = n_blocks, block_len
    total = T * L
    # Pad so the circular delay wrap stays outside the emitted region.
    margin = int(max(256.0, 4.0 * float(np.max(np.abs(truth.delays)) + 1.0)))
    W = _next_pow2(total + margin)

    k_ref, k_noise = jax.random.split(key)
    # Reference noise: complex white Gaussian, amplitude per rail.
    ref = (
        jax.random.normal(k_ref, (W,), dtype=jnp.float32)
        + 1j * jax.random.normal(jax.random.fold_in(k_ref, 1), (W,), dtype=jnp.float32)
    ).astype(dtype) * (amplitude / np.sqrt(1.0))

    if bandwidth < 1.0:
        F = jnp.fft.fft(ref)
        f = jnp.abs(jnp.fft.fftfreq(W))
        F = jnp.where(f <= bandwidth / 2.0, F, 0.0)
        ref = jnp.fft.ifft(F).astype(dtype) / np.sqrt(bandwidth)

    # Exact per-channel fractional delays via one batched frequency-domain op.
    delays = jnp.asarray(truth.delays)
    F_ref = jnp.fft.fft(ref)
    delayed = jnp.fft.ifft(F_ref[None, :] * delay_ramp(W, delays), axis=-1)  # [N, W]
    delayed = delayed[:, :total]

    # Residual clock skew: time-varying advance -ppm*1e-6*t (Farrow).
    if np.any(truth.ppm != 0.0):
        t = jnp.arange(total, dtype=jnp.float32)
        adv = -jnp.asarray(truth.ppm)[:, None] * 1e-6 * t[None, :]
        delayed = farrow_fractional_delay(delayed, adv)

    rot = jnp.asarray(truth.gains) * jnp.exp(1j * jnp.asarray(truth.phases))
    sig = delayed * rot[:, None].astype(dtype)

    # Independent receiver noise at the requested SNR.
    snr_lin = 10.0 ** (truth.snr_db / 10.0)
    noise_amp = amplitude / np.sqrt(snr_lin)
    noise = (
        jax.random.normal(k_noise, (N, total), dtype=jnp.float32)
        + 1j * jax.random.normal(jax.random.fold_in(k_noise, 1), (N, total), dtype=jnp.float32)
    ).astype(dtype) * noise_amp
    sig = sig + noise

    ref_clean = ref[:total]
    ref_u8 = quantize_u8(ref_clean.reshape(T, L))
    sig_u8 = quantize_u8(sig.reshape(N, T, L).transpose(1, 0, 2))

    return SynthCapture(
        ref_u8=ref_u8, sig_u8=sig_u8, ref_clean=ref_clean, truth=truth, block_len=L
    )
