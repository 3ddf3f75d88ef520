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


def _ref_block(seed: int, g: int, L: int, amplitude: float, dtype) -> jnp.ndarray:
    """Reference noise for global block index ``g`` — a pure function of
    (seed, g), so any slab of the stream regenerates identically."""
    k = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5EED + g)
    re = jax.random.normal(k, (L,), dtype=jnp.float32)
    im = jax.random.normal(jax.random.fold_in(k, 1), (L,), dtype=jnp.float32)
    return (re + 1j * im).astype(dtype) * amplitude


def synth_stream_slab(
    seed: int,
    truth: ChannelTruth,
    slab_idx: int,
    slab_blocks: int,
    block_len: int = 8192,
    amplitude: float = 0.25,
    dtype=jnp.complex64,
):
    """One slab of a CONTINUOUS synthetic stream: slab ``i`` followed by slab
    ``i+1`` is sample-exact identical to generating both at once.

    Continuity matters: the pipeline's overlap-save windows span block
    boundaries, and a per-slab independent realization would put a
    discontinuous seam under one window per slab — the aligned output then
    contains |delay| samples pulled across the seam, a measured
    ~|d|/L correlation loss on every 16th frame. Here the reference noise
    is a counter-keyed function of the global block index, each slab is
    rendered with one margin block of context on both sides, channels are
    delayed/skewed over the extended window, and only the interior is
    emitted (margin >= max|delay| + Farrow tail).

    Returns ``(sig_u8 [S, N, L, 2], ref_u8 [S, L, 2])``.
    """
    N = len(truth.delays)
    S, L = slab_blocks, block_len
    if np.max(np.abs(truth.delays)) + 8 > L:
        raise ValueError("synth_stream_slab needs max|delay| + 8 <= block_len")
    g0 = slab_idx * S
    # Extended window: one margin block before, and enough after to make the
    # total a power of two (delay_ramp's exact mod-W ramp needs pow2; the
    # extra margin blocks are real future stream content, so continuity
    # holds). Global blocks [g0-1, g0-1+E).
    E = _next_pow2(S + 2)
    blocks = [
        _ref_block(seed, g, L, amplitude, dtype) for g in range(g0 - 1, g0 - 1 + E)
    ]
    ref_ext = jnp.concatenate(blocks)                       # [E*L]
    W = ref_ext.shape[0]

    delays = jnp.asarray(truth.delays)
    F_ref = jnp.fft.fft(ref_ext)
    delayed = jnp.fft.ifft(F_ref[None, :] * delay_ramp(W, delays), axis=-1)

    if np.any(truth.ppm != 0.0):
        # Skew advance is a function of ABSOLUTE stream time (continuous
        # across slabs), not slab-local time.
        t_abs = (g0 - 1) * L + jnp.arange(W, dtype=jnp.float32)
        adv = -jnp.asarray(truth.ppm)[:, None] * 1e-6 * t_abs[None, :]
        delayed = farrow_fractional_delay(delayed, adv)

    rot = jnp.asarray(truth.gains) * jnp.exp(1j * jnp.asarray(truth.phases))
    sig = delayed * rot[:, None].astype(dtype)

    snr_lin = 10.0 ** (truth.snr_db / 10.0)
    noise_amp = amplitude / np.sqrt(snr_lin)
    kn = jax.random.fold_in(jax.random.PRNGKey(seed), 0xA0A0 + slab_idx)
    noise = (
        jax.random.normal(kn, (N, S * L), dtype=jnp.float32)
        + 1j * jax.random.normal(jax.random.fold_in(kn, 1), (N, S * L), dtype=jnp.float32)
    ).astype(dtype) * noise_amp

    interior = sig[:, L: (S + 1) * L] + noise               # [N, S*L]
    ref_int = ref_ext[L: (S + 1) * L]
    ref_u8 = quantize_u8(ref_int.reshape(S, L))
    sig_u8 = quantize_u8(interior.reshape(N, S, L).transpose(1, 0, 2))
    return sig_u8, ref_u8
