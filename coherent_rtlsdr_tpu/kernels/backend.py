"""Spectral backend selection: one interface over the XLA-FFT natural-order
path, the MXU four-step permuted path, and the fully-fused Pallas
mega-kernel path, so the pipeline code is written once (pipeline/step.py,
pipeline/offline.py).

All backends implement the 3-op pipeline interface over STREAM BLOCKS
(the overlap-save window of output slot t is blocks (t, t+1)):

    ctx = sp.prepare(sig_blocks, ref_blocks)  # [T, N, L] / [T, L] complex
    est = sp.measure(ctx, method)             # LagEstimate over [T-1, N]
    y   = sp.correct(ctx, advance)            # aligned center half [T-1, N, L]

plus the lower-level fft/ifft/lag_estimate/apply_advance ops (used by
analysis code and the non-fused backends themselves). xla/mxu assemble
2L windows and take spectra; the fused backend stores the blocks once as
bf16 planes and assembles windows inside its mega-kernels
(kernels/pallas_fused.py). ``correct`` returns the overlap-save center
half ``y[..., W/4:3W/4]`` per window.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from coherent_rtlsdr_tpu.kernels.fft4step import FFT4Step, supported_fft_len
from coherent_rtlsdr_tpu.kernels import permuted as perm
from coherent_rtlsdr_tpu.ops.delay import apply_delay_phase_freq
from coherent_rtlsdr_tpu.ops.xcorr import LagEstimate, lag_estimate_from_spectra


def _vmap_leading(fn, ndim_core, *args):
    """vmap ``fn`` over any leading batch dims of args[0] beyond ndim_core."""
    extra = args[0].ndim - ndim_core
    f = fn
    for _ in range(extra):
        f = jax.vmap(f)
    return f(*args)


class _Ctx(NamedTuple):
    F_sig: jnp.ndarray   # [..., N, spectrum]
    F_ref: jnp.ndarray   # [..., spectrum]


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

    # -- pipeline interface --------------------------------------------
    def prepare(self, sig_blocks, ref_blocks):
        w_sig = jnp.concatenate([sig_blocks[:-1], sig_blocks[1:]], axis=-1)
        w_ref = jnp.concatenate([ref_blocks[:-1], ref_blocks[1:]], axis=-1)
        return _Ctx(self.fft(w_sig), self.fft(w_ref))

    def measure(self, ctx, method):
        return _vmap_leading(
            lambda fs, fr: lag_estimate_from_spectra(fs, fr, method=method),
            2, ctx.F_sig, ctx.F_ref,
        )

    def correct(self, ctx, advance):
        W = self.fft_len
        y = self.ifft(self.apply_advance(
            ctx.F_sig, advance, jnp.ones((), jnp.complex64)))
        return y[..., W // 4: W // 4 + W // 2]


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

    # -- pipeline interface --------------------------------------------
    def prepare(self, sig_blocks, ref_blocks):
        w_sig = jnp.concatenate([sig_blocks[:-1], sig_blocks[1:]], axis=-1)
        w_ref = jnp.concatenate([ref_blocks[:-1], ref_blocks[1:]], axis=-1)
        return _Ctx(self.fft(w_sig), self.fft(w_ref))

    def measure(self, ctx, method):
        return _vmap_leading(
            lambda fs, fr: perm.lag_estimate_permuted(
                self._fft, fs, fr, method=method),
            3, ctx.F_sig, ctx.F_ref,
        )

    def correct(self, ctx, advance):
        W = self.fft_len
        y = self.ifft(self.apply_advance(
            ctx.F_sig, advance, jnp.ones((), jnp.complex64)))
        return y[..., W // 4: W // 4 + W // 2]


class _FusedCtx(NamedTuple):
    pre: jnp.ndarray   # [T, N, m/2, m] bf16 block planes
    pim: jnp.ndarray
    rre: jnp.ndarray   # [T-1, m, m] bf16 permuted ref window spectra
    rim: jnp.ndarray


class FusedSpectral:
    """Single-kernel measure/apply (kernels/pallas_fused.py): spectra never
    leave VMEM. Lag estimation is the phase-zoom algorithm (IFFT-free),
    computed inside the measure kernel."""

    def __init__(self, fft_len: int):
        from coherent_rtlsdr_tpu.kernels.pallas_fused import FusedPipelineKernels
        from coherent_rtlsdr_tpu.kernels.pallas_fft import FFT4StepPallas

        self._k = FusedPipelineKernels(fft_len)
        self._reffft = FFT4StepPallas(fft_len)
        self.fft_len = fft_len

    # low-level ops delegate to the pallas four-step (analysis callers)
    def fft(self, x):
        return self._reffft.fft(x)

    def ifft(self, S):
        return self._reffft.ifft(S)

    # -- pipeline interface --------------------------------------------
    def prepare(self, sig_blocks, ref_blocks):
        # Blocks are stored ONCE as bf16 planes (the kernels cast to bf16
        # for the MXU anyway): no 2L-window materialization, no complex64
        # intermediates, half the input DMA at the ~100 GB/s Pallas DMA
        # floor. The u8->c64->planes chain fuses into one XLA pass.
        m = self._k.m
        T, N, L = sig_blocks.shape
        ps = sig_blocks.reshape(T, N, m // 2, m)
        w_ref = jnp.concatenate([ref_blocks[:-1], ref_blocks[1:]], axis=-1)
        R = self._reffft.fft(w_ref)
        return _FusedCtx(
            pre=jnp.real(ps).astype(jnp.bfloat16),
            pim=jnp.imag(ps).astype(jnp.bfloat16),
            rre=jnp.real(R).astype(jnp.bfloat16),
            rim=jnp.imag(R).astype(jnp.bfloat16),
        )

    def measure(self, ctx, method):
        if method not in ("phase_zoom", "auto"):
            raise ValueError(
                "fft_impl='fused' computes lag in-kernel with the phase_zoom "
                f"estimator; set lag_method='phase_zoom' (got '{method}')"
            )
        lag, zabs, esig, eg = self._k.measure(ctx.pre, ctx.pim, ctx.rre, ctx.rim)
        rre = ctx.rre.astype(jnp.float32)
        rim = ctx.rim.astype(jnp.float32)
        e_ref = jnp.sum(rre * rre + rim * rim, axis=(-2, -1))  # [T-1]
        denom = jnp.sqrt(esig * e_ref[:, None])
        mag = zabs / jnp.where(denom > 0, denom, 1.0)
        # Parseval PAPR: peak|c| ~ |z|/W, mean|c|^2 = sum|G|^2/W^2.
        papr = zabs * zabs / jnp.where(eg > 0, eg, 1.0)
        return LagEstimate(lag=lag, mag=mag, papr=papr)

    def correct(self, ctx, advance):
        T1, N = ctx.pre.shape[0] - 1, ctx.pre.shape[1]
        adv = jnp.asarray(advance, jnp.float32).reshape((T1, N))
        yre, yim = self._k.apply(ctx.pre, ctx.pim, adv)
        return (yre + 1j * yim).astype(jnp.complex64)


def get_spectral(cfg, fft_len: int):
    """Pick the backend from PipelineConfig.fft_impl ('xla' | 'mxu' |
    'pallas' | 'fused' | 'auto'). 'auto' uses MXU when the length is a
    supported square."""
    impl = getattr(cfg, "fft_impl", "xla")
    if impl in ("mxu", "pallas", "fused") or (
        impl == "auto" and supported_fft_len(fft_len)
    ):
        if not supported_fft_len(fft_len):
            raise ValueError(
                f"fft_impl='{impl}' needs a square fft_len in "
                f"{{4096, 16384, 65536}}, got {fft_len}"
            )
        if impl == "fused":
            return FusedSpectral(fft_len)
        return MxuSpectral(
            fft_len,
            precision=getattr(cfg, "mxu_precision", "bf16"),
            pallas=(impl == "pallas"),
        )
    return XlaSpectral(fft_len)
