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


def _fourstep_kernel_tiled(
    fre_ref, fim_ref, tre_ref, tim_ref, xre_ref, xim_ref, ore_ref, oim_ref,
    *, inverse: bool, tb: int
):
    """``tb`` transforms per grid step with stacked matmuls.

    Single-transform 128^3 dots run the MXU at ~6% utilization (pipeline
    never fills). Stacking: stage "F @ A_t" over a HORIZONTAL stack
    [m, tb*m] and stage "C_t @ F" over a VERTICAL stack [tb*m, m] makes
    both stages one large matmul; the only data movement is two VMEM
    relayouts (transpose of the tb axis), which never touch HBM.

    Forward order: left-mm, twiddle, right-mm. Inverse order: right-mm,
    conj-twiddle, left-mm (tables arrive conjugated/scaled).
    """
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    m = fre_ref.shape[0]
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)
    tre = tre_ref[:]
    tim = tim_ref[:]

    xre = xre_ref[:]  # [tb, m, m] f32
    xim = xim_ref[:]

    if not inverse:
        # H = [A_1 | ... | A_tb]  -> B_wide = F @ H
        hre = xre.transpose(1, 0, 2).reshape(m, tb * m).astype(jnp.bfloat16)
        him = xim.transpose(1, 0, 2).reshape(m, tb * m).astype(jnp.bfloat16)
        bre = dot(fre, hre) - dot(fim, him)   # [m, tb*m] f32
        bim = dot(fre, him) + dot(fim, hre)
        # twiddle (broadcast over the tb axis), then V = [C_1; ...; C_tb]
        b3re = bre.reshape(m, tb, m)
        b3im = bim.reshape(m, tb, m)
        c3re = b3re * tre[:, None, :] - b3im * tim[:, None, :]
        c3im = b3re * tim[:, None, :] + b3im * tre[:, None, :]
        vre = c3re.transpose(1, 0, 2).reshape(tb * m, m).astype(jnp.bfloat16)
        vim = c3im.transpose(1, 0, 2).reshape(tb * m, m).astype(jnp.bfloat16)
        dre = dot(vre, fre) - dot(vim, fim)   # [tb*m, m] = stacked D_t
        dim = dot(vre, fim) + dot(vim, fre)
        ore_ref[:] = dre.reshape(tb, m, m)
        oim_ref[:] = dim.reshape(tb, m, m)
    else:
        # C_t = D_t @ Fi on the vertical stack
        vre = xre.reshape(tb * m, m).astype(jnp.bfloat16)
        vim = xim.reshape(tb * m, m).astype(jnp.bfloat16)
        cre = dot(vre, fre) - dot(vim, fim)   # [tb*m, m]
        cim = dot(vre, fim) + dot(vim, fre)
        # conj-twiddle per block, then horizontal stack for the left mm
        c3re = cre.reshape(tb, m, m)
        c3im = cim.reshape(tb, m, m)
        b3re = c3re * tre[None, :, :] - c3im * tim[None, :, :]
        b3im = c3re * tim[None, :, :] + c3im * tre[None, :, :]
        hre = b3re.transpose(1, 0, 2).reshape(m, tb * m).astype(jnp.bfloat16)
        him = b3im.transpose(1, 0, 2).reshape(m, tb * m).astype(jnp.bfloat16)
        are = dot(fre, hre) - dot(fim, him)   # [m, tb*m]
        aim = dot(fre, him) + dot(fim, hre)
        ore_ref[:] = are.reshape(m, tb, m).transpose(1, 0, 2)
        oim_ref[:] = aim.reshape(m, tb, m).transpose(1, 0, 2)


def _run_fourstep(
    xre: jnp.ndarray,  # [B, m, m] f32
    xim: jnp.ndarray,
    tables: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    interpret: bool,
    inverse: bool,
    tile: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, m, _ = xre.shape
    fre, fim, tre, tim = tables
    table_spec = pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM)

    if tile > 1 and B % tile == 0:
        x_spec = pl.BlockSpec(
            (tile, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(
            _fourstep_kernel_tiled, inverse=inverse, tb=tile
        )
        grid = (B // tile,)
    else:
        x_spec = pl.BlockSpec((1, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        kernel = _fourstep_kernel_inv if inverse else _fourstep_kernel
        grid = (B,)

    out = pl.pallas_call(
        kernel,
        grid=grid,
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

    def __init__(self, fft_len: int, interpret=None, tile: int = 8):
        m = int(round(np.sqrt(fft_len)))
        if m * m != fft_len:
            raise ValueError(f"fft_len {fft_len} is not a square")
        self.fft_len = fft_len
        self.m = m
        self._tile = int(tile)
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
            tile=self._tile,
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
