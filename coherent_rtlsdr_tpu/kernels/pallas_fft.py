"""Fused four-step FFT as a single Pallas kernel.

The jnp four-step (kernels/fft4step.py) leaves XLA to schedule 8 real
matmuls + complex split/joins + twiddle per transform, materializing
intermediates in HBM. This kernel keeps one transform's whole dataflow in
VMEM: load A (128x128 re/im f32, 131 KB), run both complex matmul stages on
the MXU in bf16 (f32 accumulation) with the twiddle in between, store D.
HBM traffic is the theoretical minimum (one read + one write per
transform); arithmetic is ~33 MFLOP on the MXU.

Same permuted (k2, k1) frequency layout and the same inverse mapping as
FFT4Step — drop-in behind the spectral-backend interface via
``fft_impl='pallas'``.

Tables (DFT matrix re/im, twiddle re/im) ride as replicated kernel inputs;
for the inverse they arrive pre-conjugated and pre-scaled by 1/m so the
kernel body is identical for both directions.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coherent_rtlsdr_tpu.kernels.fft4step import _dft_matrix, _twiddle


def _fourstep_kernel(
    fre_ref, fim_ref, tre_ref, tim_ref, xre_ref, xim_ref, ore_ref, oim_ref
):
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)

    are = xre_ref[0].astype(jnp.bfloat16)
    aim = xim_ref[0].astype(jnp.bfloat16)

    # B = F @ A (complex via 4 real MXU matmuls)
    bre = dot(fre, are) - dot(fim, aim)
    bim = dot(fre, aim) + dot(fim, are)

    # C = B * T (twiddle, f32 on the VPU)
    tre = tre_ref[:]
    tim = tim_ref[:]
    cre = bre * tre - bim * tim
    cim = bre * tim + bim * tre

    # D = C @ F
    c16re = cre.astype(jnp.bfloat16)
    c16im = cim.astype(jnp.bfloat16)
    ore_ref[0] = dot(c16re, fre) - dot(c16im, fim)
    oim_ref[0] = dot(c16re, fim) + dot(c16im, fre)


def _fourstep_kernel_inv(
    fre_ref, fim_ref, tre_ref, tim_ref, xre_ref, xim_ref, ore_ref, oim_ref
):
    """Inverse order: right-matmul, twiddle, left-matmul —
    A = Fi @ ((D @ Fi) * conj(T)) with Fi = conj(F)/m baked into tables."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)

    dre = xre_ref[0].astype(jnp.bfloat16)
    dim = xim_ref[0].astype(jnp.bfloat16)

    # C = D @ Fi
    cre = dot(dre, fre) - dot(dim, fim)
    cim = dot(dre, fim) + dot(dim, fre)

    # B = C * Tc
    tre = tre_ref[:]
    tim = tim_ref[:]
    bre = cre * tre - cim * tim
    bim = cre * tim + cim * tre

    # A = Fi @ B
    b16re = bre.astype(jnp.bfloat16)
    b16im = bim.astype(jnp.bfloat16)
    ore_ref[0] = dot(fre, b16re) - dot(fim, b16im)
    oim_ref[0] = dot(fre, b16im) + dot(fim, b16re)


def _run_fourstep(
    xre: jnp.ndarray,  # [B, m, m] f32
    xim: jnp.ndarray,
    tables: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    interpret: bool,
    inverse: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, m, _ = xre.shape
    fre, fim, tre, tim = tables
    table_spec = pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fourstep_kernel_inv if inverse else _fourstep_kernel,
        grid=(B,),
        in_specs=[table_spec, table_spec, table_spec, table_spec, x_spec, x_spec],
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), jnp.float32),
            jax.ShapeDtypeStruct((B, m, m), jnp.float32),
        ),
        interpret=interpret,
    )(fre, fim, tre, tim, xre, xim)
    return out


class FFT4StepPallas:
    """Drop-in spectral transform pair using the fused Pallas kernel.

    ``interpret=None`` auto-selects interpreter mode off-TPU (CPU tests).
    """

    def __init__(self, fft_len: int, interpret=None):
        m = int(round(np.sqrt(fft_len)))
        if m * m != fft_len:
            raise ValueError(f"fft_len {fft_len} is not a square")
        self.fft_len = fft_len
        self.m = m
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self._interpret = bool(interpret)

        fre, fim = _dft_matrix(m)
        tre, tim = _twiddle(m)
        self._fwd_tables = (
            jnp.asarray(fre), jnp.asarray(fim), jnp.asarray(tre), jnp.asarray(tim)
        )
        inv = 1.0 / m
        self._inv_tables = (
            jnp.asarray(fre * inv), jnp.asarray(-fim * inv),
            jnp.asarray(tre), jnp.asarray(-tim),
        )

    def _apply(self, x: jnp.ndarray, tables, inverse: bool) -> jnp.ndarray:
        m = self.m
        # Accept either [..., W] (forward input) or [..., m, m] (spectra).
        if x.shape[-1] == self.fft_len:
            xm = x.reshape(*x.shape[:-1], m, m)
        else:
            xm = x
        batch_shape = xm.shape[:-2]
        xb = xm.reshape(-1, m, m)
        ore, oim = _run_fourstep(
            jnp.real(xb).astype(jnp.float32),
            jnp.imag(xb).astype(jnp.float32),
            tables,
            self._interpret,
            inverse,
        )
        out = (ore + 1j * oim).astype(jnp.complex64)
        return out.reshape(*batch_shape, m, m)

    def fft(self, x: jnp.ndarray) -> jnp.ndarray:
        """x ``[..., W]`` -> permuted spectrum ``[..., m, m]``."""
        return self._apply(x, self._fwd_tables, inverse=False)

    def ifft(self, Xp: jnp.ndarray) -> jnp.ndarray:
        """Permuted spectrum ``[..., m, m]`` -> natural time ``[..., W]``."""
        out = self._apply(Xp, self._inv_tables, inverse=True)
        return out.reshape(*out.shape[:-2], self.fft_len)

    # layout helpers shared with FFT4Step
    def freq_index_grid(self):
        from coherent_rtlsdr_tpu.kernels.fft4step import FFT4Step

        return FFT4Step(self.fft_len).freq_index_grid()

    def signed_freq_grid(self):
        from coherent_rtlsdr_tpu.kernels.fft4step import FFT4Step

        return FFT4Step(self.fft_len).signed_freq_grid()
