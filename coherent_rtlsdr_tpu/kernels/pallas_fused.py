"""Fully-fused measure/apply mega-kernels (fft_impl='fused').

The pipeline's per-window dataflow is

    measure:  window --FFT--> D --x conj(R)--> G --phase-zoom--> (lag, mag,
              papr)
    apply:    window --FFT--> D --x ramp(delay)--> --IFFT--> center half

On this backend the Pallas DMA floor (~100 GB/s effective, docs/PERF.md)
makes total HBM bytes the cost model, so each side is ONE kernel whose
spectra never leave VMEM, and the overlap-save windows themselves are
assembled *inside* the kernel from two consecutive stream blocks (the
window of block t is blocks (t, t+1)): each block plane is stored ONCE in
HBM as bf16 and read by the kernels as two half-window refs — no 2x window
materialization, no complex64 intermediates, no separate bf16 cast pass.
The first FFT matmul splits over the halves: B = F[:, :m/2] @ A_top +
F[:, m/2:] @ A_bot (same FLOPs, zero concatenation).

  * ``measure``: forward four-step FFT (MXU, bf16), conjugate-multiply with
    the reference spectrum, then the complete two-stage banded phase-slope
    ("phase_zoom", ops/xcorr.py:_phase_zoom_estimate) *inside the kernel* —
    band sums become tiny MXU matmuls against 0/1 selection matrices, the
    stage-1 integer lag feeds the stage-2 deramp without ever leaving the
    kernel. PAPR comes free via Parseval: peak ~ |z|/W, mean|c|^2 =
    sum|G|^2/W^2, so papr = |z|^2 / sum|G|^2. HBM: read one window + the
    ref spectrum, write 4 scalars.
  * ``apply``: forward FFT, fractional-advance ramp built in-kernel from the
    delay scalar (exact mod-W integer ramp via the power-of-two byte split),
    inverse four-step computing ONLY the overlap-save center rows
    (m/4..3m/4) of the final matmul. HBM: read one window, write half a
    window.

Replaces (capability-wise) the reference's ccoherent::computelag batched
FFTW pass (src/ccoherent.cc:154-239), its disabled fractional-peak
estimator (ccoherent.cc:206-222), and its stubbed PAPR
(cdsp.cc:85-88) — the estimator here is the working phase-zoom (see
ops/xcorr.py for the algorithm notes).

Layout identities for the permuted (k2, k1) spectrum (kernels/permuted.py):
natural bin k = k2 + m*k1, so 8-bin stage-1 bands are row groups within a
column (selection matmul P @ G), and 2m-bin stage-2 bands are column pairs
(selection matmul Gc @ Q summed over rows).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coherent_rtlsdr_tpu.constants import IQ_SCALE
from coherent_rtlsdr_tpu.kernels.fft4step import _dft_matrix, _twiddle

_TWO_PI = 2.0 * np.pi


def _iramp_fraction(k_grid, d_int, W):
    """Exact ``(k * d) mod W / W`` phase fraction for integer d (int32).

    W is a power of two here, so mod is a bitwise AND; the byte split keeps
    every int32 product below 2^25 (same trick as ops/delay.py /
    kernels/permuted.py, valid for W <= 2^16).
    """
    mask = W - 1
    dm = d_int & mask          # two's-complement AND == mod for pow2 W
    d0 = dm & 255
    d1 = dm >> 8
    r0 = (k_grid * d0) & mask
    r1 = (((k_grid << 8) & mask) * d1) & mask
    return ((r0 + r1) & mask).astype(jnp.float32) * (1.0 / W)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _atan2(y, x):
    """Four-quadrant arctangent — Mosaic has no atan2 primitive, so: odd
    minimax polynomial for atan on [0, 1] (max err ~3e-6 rad, three orders
    below the estimators' noise floor) + octant/quadrant reconstruction."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    p = jnp.float32(-0.01172120)
    p = p * s + jnp.float32(0.05265332)
    p = p * s + jnp.float32(-0.11643287)
    p = p * s + jnp.float32(0.19354346)
    p = p * s + jnp.float32(-0.33262347)
    p = p * s + jnp.float32(0.99997726)
    r = t * p
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _forward_fft_split(dot, fre, fim, tre, tim, at_re, at_im, ab_re, ab_im):
    """Forward four-step FFT of a window given as two half-window planes
    (top = earlier block rows 0..m/2-1, bottom = later block), each
    ``[m/2, m]`` bf16: the first matmul splits over the column halves of F,
    so the window is never concatenated. Returns the permuted spectrum
    (dre, dim) f32."""
    m = fre.shape[0]
    fl_re, fr_re = fre[:, : m // 2], fre[:, m // 2:]
    fl_im, fr_im = fim[:, : m // 2], fim[:, m // 2:]
    bre = (dot(fl_re, at_re) - dot(fl_im, at_im)
           + dot(fr_re, ab_re) - dot(fr_im, ab_im))
    bim = (dot(fl_re, at_im) + dot(fl_im, at_re)
           + dot(fr_re, ab_im) + dot(fr_im, ab_re))
    cre, cim = _cmul(bre, bim, tre, tim)
    dre = dot(cre.astype(jnp.bfloat16), fre) - dot(cim.astype(jnp.bfloat16), fim)
    dim = dot(cre.astype(jnp.bfloat16), fim) + dot(cim.astype(jnp.bfloat16), fre)
    return dre, dim


def _dq_i8(x):
    """In-kernel dequant of one signed-i8 IQ block: x * IQ_SCALE, bf16
    (the reference's cdsp::convtofloat, src/cdsp.cc:36-44, folded into the
    kernel prologue). The u8 XOR-0x80 offset removal (cdsp::convtosigned,
    cdsp.cc:21-34) stays with the CALLER as the one eager elementwise pass
    over well-tiled flat bytes (~10 us/blk, docs/PERF.md): the kernels
    consume signed int8."""
    return (x.astype(jnp.float32) * IQ_SCALE).astype(jnp.bfloat16)


def _phase_zoom_core(dot, gre, gim, kg, fg, p, q, W):
    """The complete two-stage banded phase-slope estimator on a permuted
    cross-spectrum G (ops/xcorr.py:_phase_zoom_estimate, in-kernel form).
    Returns (lag, z_re, z_im, eg): fractional lag, the complex correlation
    value at that lag (Parseval: <y, ref>_time = z/W), and sum|G|^2."""
    m = gre.shape[0]
    # --- stage 1: 8-bin bands as a selection matmul, coarse slope -------
    # Gb1[j, k1] = sum of rows 8j..8j+7 of column k1; natural band index
    # b = k1*(m/8) + j. Adjacent-band products stay within a column except
    # at the j-wrap (band (m/8-1, k1) -> (0, k1+1)); the Nyquist straddle
    # (natural b = W/16 - 1) is always the column boundary k1 = m/2 - 1.
    g1re = dot(p, gre)                 # [m/8, m]
    g1im = dot(p, gim)
    in_re = g1re[1:, :] * g1re[:-1, :] + g1im[1:, :] * g1im[:-1, :]
    in_im = g1im[1:, :] * g1re[:-1, :] - g1re[1:, :] * g1im[:-1, :]
    bd_re = g1re[0:1, 1:] * g1re[-1:, :-1] + g1im[0:1, 1:] * g1im[-1:, :-1]
    bd_im = g1im[0:1, 1:] * g1re[-1:, :-1] - g1re[0:1, 1:] * g1im[-1:, :-1]
    nyq = 1.0 - (jax.lax.broadcasted_iota(jnp.int32, (1, m - 1), 1)
                 == (m // 2 - 1)).astype(jnp.float32)
    s1re = jnp.sum(in_re) + jnp.sum(bd_re * nyq)
    s1im = jnp.sum(in_im) + jnp.sum(bd_im * nyq)
    M1 = W // 8
    d1 = -_atan2(s1im, s1re) * (M1 / _TWO_PI)
    int_lag = jnp.round(d1)

    # --- stage 2: deramp by the integer lag, 2m-bin bands ---------------
    ph = _iramp_fraction(kg, (-int_lag).astype(jnp.int32), W) * _TWO_PI
    wr = jnp.cos(ph)
    wi = -jnp.sin(ph)
    gcre, gcim = _cmul(gre, gim, wr, wi)

    ones_row = jnp.ones((1, m), jnp.float32)
    g2re = dot(ones_row, dot(gcre, q))  # [1, m/2]
    g2im = dot(ones_row, dot(gcim, q))
    M2 = m // 2
    p2re = g2re[:, 1:] * g2re[:, :-1] + g2im[:, 1:] * g2im[:, :-1]
    p2im = g2im[:, 1:] * g2re[:, :-1] - g2re[:, 1:] * g2im[:, :-1]
    nyq2 = 1.0 - (jax.lax.broadcasted_iota(jnp.int32, (1, M2 - 1), 1)
                  == (M2 // 2 - 1)).astype(jnp.float32)
    s2re = jnp.sum(p2re * nyq2)
    s2im = jnp.sum(p2im * nyq2)
    frac = jnp.clip(-_atan2(s2im, s2re) * (M2 / _TWO_PI), -4.0, 4.0)

    # --- correlation value at the fractional lag -------------------------
    phf = (_TWO_PI * frac) * fg
    zr = jnp.cos(phf)
    zi = jnp.sin(phf)
    zre, zim = _cmul(gcre, gcim, zr, zi)
    z_re = jnp.sum(zre)
    z_im = jnp.sum(zim)
    eg = jnp.sum(gre * gre + gim * gim)
    return int_lag + frac, z_re, z_im, eg


def _measure_kernel(
    fre_ref, fim_ref, tre_ref, tim_ref, kg_ref, fg_ref, p_ref, q_ref,
    xtr_ref, xti_ref, xbr_ref, xbi_ref, rre_ref, rim_ref,
    lag_ref, mag_ref, esig_ref, eg_ref,
    *, W: int,
):
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)
    tre = tre_ref[:]
    tim = tim_ref[:]

    dre, dim = _forward_fft_split(
        dot, fre, fim, tre, tim,
        xtr_ref[0, 0], xti_ref[0, 0], xbr_ref[0, 0], xbi_ref[0, 0],
    )

    # --- cross-spectrum G = D * conj(R) ---------------------------------
    rre = rre_ref[0].astype(jnp.float32)
    rim = rim_ref[0].astype(jnp.float32)
    gre = dre * rre + dim * rim
    gim = dim * rre - dre * rim

    lag, z_re, z_im, eg = _phase_zoom_core(
        dot, gre, gim, kg_ref[:], fg_ref[:], p_ref[:], q_ref[:], W
    )

    i = pl.program_id(0)
    j = pl.program_id(1)
    lag_ref[i, j] = lag
    mag_ref[i, j] = jnp.sqrt(z_re * z_re + z_im * z_im)
    esig_ref[i, j] = jnp.sum(dre * dre + dim * dim)
    eg_ref[i, j] = eg


def _apply_kernel(
    fre_ref, fim_ref, tre_ref, tim_ref, fire_ref, fiim_ref, kg_ref, fg_ref,
    xtr_ref, xti_ref, xbr_ref, xbi_ref, adv_ref,
    yre_ref, yim_ref,
    *, W: int,
):
    m = fre_ref.shape[0]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)
    tre = tre_ref[:]
    tim = tim_ref[:]

    dre, dim = _forward_fft_split(
        dot, fre, fim, tre, tim,
        xtr_ref[0, 0], xti_ref[0, 0], xbr_ref[0, 0], xbi_ref[0, 0],
    )

    # --- fractional-advance ramp (ops/delay.py semantics: delay = -adv,
    # ramp = exp(-2*pi*i*(int_ramp(floor(d)) + f_signed*frac(d)))) ---------
    d = -adv_ref[pl.program_id(0), pl.program_id(1)]
    di = jnp.floor(d)
    df = d - di
    ph = _iramp_fraction(kg_ref[:], di.astype(jnp.int32), W) + fg_ref[:] * df
    ph = ph * _TWO_PI
    wr = jnp.cos(ph)
    wi = -jnp.sin(ph)
    gre, gim = _cmul(dre, dim, wr, wi)

    # --- inverse four-step, center rows only ----------------------------
    fire = fire_ref[:].astype(jnp.bfloat16)   # conj(F)/m
    fiim = fiim_ref[:].astype(jnp.bfloat16)
    g16re = gre.astype(jnp.bfloat16)
    g16im = gim.astype(jnp.bfloat16)
    c2re = dot(g16re, fire) - dot(g16im, fiim)
    c2im = dot(g16re, fiim) + dot(g16im, fire)
    b2re, b2im = _cmul(c2re, c2im, tre, -tim)  # conj twiddle
    # Output rows m/4..3m/4 of A = Fi @ B are time samples W/4..3W/4 — the
    # overlap-save center half. Half the matmul, half the writeback.
    fh_re = fire[m // 4: 3 * m // 4, :]
    fh_im = fiim[m // 4: 3 * m // 4, :]
    b16re = b2re.astype(jnp.bfloat16)
    b16im = b2im.astype(jnp.bfloat16)
    yre_ref[0, 0] = dot(fh_re, b16re) - dot(fh_im, b16im)
    yim_ref[0, 0] = dot(fh_re, b16im) + dot(fh_im, b16re)


def _load_half_raw(dot, raw, si, sq):
    """Dequant + de-interleave one signed-i8 half-window block ``[m/2, 2m]``
    (bytes I0 Q0 I1 Q1 ..., capture order, offset already removed) into
    (re, im) bf16 ``[m/2, m]`` planes. The de-interleave is a 0/1 selection
    matmul — a strided byte gather is pathological on the VPU (measured
    ~400 us/block eagerly at 21ch), but as an MXU matmul it is noise.
    Dequantized values are exact in bf16."""
    a = _dq_i8(raw)                       # [m/2, 2m] bf16
    return (dot(a, si).astype(jnp.bfloat16),
            dot(a, sq).astype(jnp.bfloat16))


def _measure_kernel_i8(
    fre_ref, fim_ref, tre_ref, tim_ref, kg_ref, fg_ref, p_ref, q_ref,
    si_ref, sq_ref, xt_ref, xb_ref, rt_ref, rb_ref,
    lag_ref, zre_ref, zim_ref, mag_ref, papr_ref,
    *, W: int, nc: int,
):
    """i8-native measure: raw interleaved bytes in (dequant + de-interleave
    prologue), forward FFTs of BOTH the channel windows and the reference
    window, conj-mul + in-kernel phase-zoom. Each grid step processes ``nc``
    channels (static unrolled loop): the reference spectrum and all tables
    are computed/loaded once per step, and the per-grid-step overhead
    (block DMA issue + grid bookkeeping, a few us on this backend)
    amortizes across the batch.

    Outputs per (window, channel): fractional lag; the COMPLEX correlation
    value z (arg(z) is the phase-correction estimate — Parseval, see
    _phase_zoom_core — so the step gets its phase estimate for free);
    normalized correlation mag = |z|/sqrt(E_sig*E_ref); Parseval PAPR."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)
    tre = tre_ref[:]
    tim = tim_ref[:]
    si = si_ref[:]
    sq = sq_ref[:]
    rt_re, rt_im = _load_half_raw(dot, rt_ref[0], si, sq)
    rb_re, rb_im = _load_half_raw(dot, rb_ref[0], si, sq)
    rre, rim = _forward_fft_split(
        dot, fre, fim, tre, tim, rt_re, rt_im, rb_re, rb_im
    )
    eref = jnp.sum(rre * rre + rim * rim)

    i = pl.program_id(0)
    j = pl.program_id(1)
    for c in range(nc):
        at_re, at_im = _load_half_raw(dot, xt_ref[0, c], si, sq)
        ab_re, ab_im = _load_half_raw(dot, xb_ref[0, c], si, sq)
        dre, dim = _forward_fft_split(
            dot, fre, fim, tre, tim, at_re, at_im, ab_re, ab_im
        )

        gre = dre * rre + dim * rim
        gim = dim * rre - dre * rim

        lag, z_re, z_im, eg = _phase_zoom_core(
            dot, gre, gim, kg_ref[:], fg_ref[:], p_ref[:], q_ref[:], W
        )

        esig = jnp.sum(dre * dre + dim * dim)
        zabs = jnp.sqrt(z_re * z_re + z_im * z_im)
        denom = jnp.sqrt(esig * eref)

        lag_ref[i, j * nc + c] = lag
        zre_ref[i, j * nc + c] = z_re
        zim_ref[i, j * nc + c] = z_im
        mag_ref[i, j * nc + c] = zabs / jnp.maximum(denom, 1e-30)
        papr_ref[i, j * nc + c] = zabs * zabs / jnp.maximum(eg, 1e-30)


def _measure_kernel_i8_spec(
    fre_ref, fim_ref, tre_ref, tim_ref, kg_ref, fg_ref, p_ref, q_ref,
    si_ref, sq_ref, xt_ref, xb_ref, rt_ref, rb_ref,
    lag_ref, zre_ref, zim_ref, mag_ref, papr_ref, dre_ref, dim_ref,
    *, W: int, nc: int,
):
    """measure_i8 variant that ALSO writes each channel's permuted window
    spectrum D (bf16 planes) to HBM, so the apply kernel can skip its
    forward FFT (the spectrum-handoff optimization: writing 64 kB bf16 costs
    ~0.7 us/ch at the DMA floor vs ~2.7 us to recompute the transform —
    docs/PERF.md round 3)."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)
    tre = tre_ref[:]
    tim = tim_ref[:]
    si = si_ref[:]
    sq = sq_ref[:]
    rt_re, rt_im = _load_half_raw(dot, rt_ref[0], si, sq)
    rb_re, rb_im = _load_half_raw(dot, rb_ref[0], si, sq)
    rre, rim = _forward_fft_split(
        dot, fre, fim, tre, tim, rt_re, rt_im, rb_re, rb_im
    )
    eref = jnp.sum(rre * rre + rim * rim)

    i = pl.program_id(0)
    j = pl.program_id(1)
    for c in range(nc):
        at_re, at_im = _load_half_raw(dot, xt_ref[0, c], si, sq)
        ab_re, ab_im = _load_half_raw(dot, xb_ref[0, c], si, sq)
        dre, dim = _forward_fft_split(
            dot, fre, fim, tre, tim, at_re, at_im, ab_re, ab_im
        )
        dre_ref[0, c] = dre.astype(jnp.bfloat16)
        dim_ref[0, c] = dim.astype(jnp.bfloat16)

        gre = dre * rre + dim * rim
        gim = dim * rre - dre * rim

        lag, z_re, z_im, eg = _phase_zoom_core(
            dot, gre, gim, kg_ref[:], fg_ref[:], p_ref[:], q_ref[:], W
        )

        esig = jnp.sum(dre * dre + dim * dim)
        zabs = jnp.sqrt(z_re * z_re + z_im * z_im)
        denom = jnp.sqrt(esig * eref)

        lag_ref[i, j * nc + c] = lag
        zre_ref[i, j * nc + c] = z_re
        zim_ref[i, j * nc + c] = z_im
        mag_ref[i, j * nc + c] = zabs / jnp.maximum(denom, 1e-30)
        papr_ref[i, j * nc + c] = zabs * zabs / jnp.maximum(eg, 1e-30)


def _apply_spec_kernel_i8(
    tre_ref, tim_ref, fire_ref, fiim_ref, kg_ref, fg_ref,
    sit_ref, sqt_ref, dre_ref, dim_ref,
    adv_ref, pre_ref, pim_ref,
    y_ref,
    *, W: int, nc: int,
):
    """apply_i8 variant consuming the measure kernel's stored spectra
    (bf16 D planes) instead of recomputing the forward FFT from raw bytes:
    ramp + phase fold, inverse four-step center rows, int8 wire epilogue."""
    m = tre_ref.shape[0]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    tre = tre_ref[:]
    tim = tim_ref[:]
    fire = fire_ref[:].astype(jnp.bfloat16)
    fiim = fiim_ref[:].astype(jnp.bfloat16)
    fh_re = fire[m // 4: 3 * m // 4, :]
    fh_im = fiim[m // 4: 3 * m // 4, :]
    kg = kg_ref[:]
    fg = fg_ref[:]
    inv = 1.0 / IQ_SCALE

    i = pl.program_id(0)
    j = pl.program_id(1)
    for c in range(nc):
        dre = dre_ref[0, c].astype(jnp.float32)
        dim = dim_ref[0, c].astype(jnp.float32)

        d = -adv_ref[i, j * nc + c]
        di = jnp.floor(d)
        df = d - di
        ph = _iramp_fraction(kg, di.astype(jnp.int32), W) + fg * df
        ph = ph * _TWO_PI
        wr = jnp.cos(ph)
        wi = -jnp.sin(ph)
        p_re = pre_ref[i, j * nc + c]
        p_im = pim_ref[i, j * nc + c]
        wr, wi = wr * p_re - wi * p_im, wr * p_im + wi * p_re
        gre, gim = _cmul(dre, dim, wr, wi)

        g16re = gre.astype(jnp.bfloat16)
        g16im = gim.astype(jnp.bfloat16)
        c2re = dot(g16re, fire) - dot(g16im, fiim)
        c2im = dot(g16re, fiim) + dot(g16im, fire)
        b2re, b2im = _cmul(c2re, c2im, tre, -tim)  # conj twiddle
        b16re = b2re.astype(jnp.bfloat16)
        b16im = b2im.astype(jnp.bfloat16)
        yre = dot(fh_re, b16re) - dot(fh_im, b16im)
        yim = dot(fh_re, b16im) + dot(fh_im, b16re)
        yq_re = jnp.clip(jnp.round(yre * inv), -128.0, 127.0).astype(jnp.bfloat16)
        yq_im = jnp.clip(jnp.round(yim * inv), -128.0, 127.0).astype(jnp.bfloat16)
        y_il = dot(yq_re, sit_ref[:]) + dot(yq_im, sqt_ref[:])   # [m/2, 2m]
        y_ref[0, c] = y_il.astype(jnp.int8)


def _apply_kernel_i8(
    fre_ref, fim_ref, tre_ref, tim_ref, fire_ref, fiim_ref, kg_ref, fg_ref,
    si_ref, sq_ref, sit_ref, sqt_ref, xt_ref, xb_ref,
    adv_ref, pre_ref, pim_ref,
    y_ref,
    *, W: int, nc: int,
):
    """i8-native apply: raw interleaved bytes in, wire bytes out, one kernel,
    ``nc`` channels per grid step (static unrolled loop). Dequant/
    de-interleave prologue; fractional-advance ramp with the per-channel
    phase correction FOLDED INTO the ramp (a scalar multiply in frequency
    domain is free); inverse four-step center rows; int8 wire requantization
    + re-interleave epilogue (cpacketizer.cc:158-172 analog — the output
    block is byte-identical to the wire frame payload)."""
    m = fre_ref.shape[0]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fre = fre_ref[:].astype(jnp.bfloat16)
    fim = fim_ref[:].astype(jnp.bfloat16)
    tre = tre_ref[:]
    tim = tim_ref[:]
    si = si_ref[:]
    sq = sq_ref[:]
    fire = fire_ref[:].astype(jnp.bfloat16)   # conj(F)/m
    fiim = fiim_ref[:].astype(jnp.bfloat16)
    fh_re = fire[m // 4: 3 * m // 4, :]
    fh_im = fiim[m // 4: 3 * m // 4, :]
    kg = kg_ref[:]
    fg = fg_ref[:]
    inv = 1.0 / IQ_SCALE

    i = pl.program_id(0)
    j = pl.program_id(1)
    for c in range(nc):
        at_re, at_im = _load_half_raw(dot, xt_ref[0, c], si, sq)
        ab_re, ab_im = _load_half_raw(dot, xb_ref[0, c], si, sq)
        dre, dim = _forward_fft_split(
            dot, fre, fim, tre, tim, at_re, at_im, ab_re, ab_im
        )

        d = -adv_ref[i, j * nc + c]
        di = jnp.floor(d)
        df = d - di
        ph = _iramp_fraction(kg, di.astype(jnp.int32), W) + fg * df
        ph = ph * _TWO_PI
        wr = jnp.cos(ph)
        wi = -jnp.sin(ph)
        # phase correction factor: ramp *= (p_re + i p_im)
        p_re = pre_ref[i, j * nc + c]
        p_im = pim_ref[i, j * nc + c]
        wr, wi = wr * p_re - wi * p_im, wr * p_im + wi * p_re
        gre, gim = _cmul(dre, dim, wr, wi)

        g16re = gre.astype(jnp.bfloat16)
        g16im = gim.astype(jnp.bfloat16)
        c2re = dot(g16re, fire) - dot(g16im, fiim)
        c2im = dot(g16re, fiim) + dot(g16im, fire)
        b2re, b2im = _cmul(c2re, c2im, tre, -tim)  # conj twiddle
        b16re = b2re.astype(jnp.bfloat16)
        b16im = b2im.astype(jnp.bfloat16)
        yre = dot(fh_re, b16re) - dot(fh_im, b16im)
        yim = dot(fh_re, b16im) + dot(fh_im, b16re)
        # int8 wire requantization (round-to-nearest, saturate — the exact
        # c64_to_i8_iq semantics, ops/convert.py) BEFORE the interleave
        # matmul: quantized integers <= 127 are exact in bf16, so the 0/1
        # selection matmuls re-interleave losslessly.
        yq_re = jnp.clip(jnp.round(yre * inv), -128.0, 127.0).astype(jnp.bfloat16)
        yq_im = jnp.clip(jnp.round(yim * inv), -128.0, 127.0).astype(jnp.bfloat16)
        y_il = dot(yq_re, sit_ref[:]) + dot(yq_im, sqt_ref[:])   # [m/2, 2m]
        y_ref[0, c] = y_il.astype(jnp.int8)


class FusedPipelineKernels:
    """measure/apply mega-kernels for one ``fft_len = m*m``.

    Block-plane layout: the stream's blocks (length L = W/2) are stored as
    separate re/im bf16 planes reshaped ``[T, N, m/2, m]`` (row r = samples
    [r*m, (r+1)*m) of the block); the window of output slot t is blocks
    (t, t+1), read by the kernels as two refs of the SAME plane arrays with
    index maps t and t+1. Tables are built once (compile-time constants
    under jit); ``interpret=None`` auto-selects interpreter mode off-TPU.
    """

    def __init__(self, fft_len: int, interpret=None):
        m = int(round(np.sqrt(fft_len)))
        if m * m != fft_len or m % 8:
            raise ValueError(f"fft_len {fft_len} unsupported (need square, m%8==0)")
        self.fft_len = fft_len
        self.m = m
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self._interpret = bool(interpret)

        fre, fim = _dft_matrix(m)
        tre, tim = _twiddle(m)
        k2 = np.arange(m, dtype=np.int32)[:, None]
        k1 = np.arange(m, dtype=np.int32)[None, :]
        kg = k2 + m * k1
        fg = np.where(kg < fft_len // 2, kg, kg - fft_len).astype(np.float32) / fft_len
        # stage-1 row-group selector [m/8, m] and stage-2 column-pair
        # selector [m, m/2]
        p = np.zeros((m // 8, m), np.float32)
        for j in range(m // 8):
            p[j, 8 * j: 8 * j + 8] = 1.0
        q = np.zeros((m, m // 2), np.float32)
        for b in range(m // 2):
            q[2 * b: 2 * b + 2, b] = 1.0
        # IQ de-interleave / re-interleave selectors for the raw-byte kernels
        # (see _load_half_raw): si[2s, s] = 1 picks I, sq[2s+1, s] = 1 picks
        # Q; their transposes re-interleave the output.
        si = np.zeros((2 * m, m), np.float32)
        sqs = np.zeros((2 * m, m), np.float32)
        si[2 * np.arange(m), np.arange(m)] = 1.0
        sqs[2 * np.arange(m) + 1, np.arange(m)] = 1.0
        self._t = {
            "fre": jnp.asarray(fre), "fim": jnp.asarray(fim),
            "tre": jnp.asarray(tre), "tim": jnp.asarray(tim),
            "fire": jnp.asarray(fre / m), "fiim": jnp.asarray(-fim / m),
            "kg": jnp.asarray(kg), "fg": jnp.asarray(fg),
            "p": jnp.asarray(p), "q": jnp.asarray(q),
            "si": jnp.asarray(si, jnp.bfloat16),
            "sq": jnp.asarray(sqs, jnp.bfloat16),
            "sit": jnp.asarray(si.T, jnp.bfloat16),
            "sqt": jnp.asarray(sqs.T, jnp.bfloat16),
        }

    def _block_specs(self, m):
        half_t = pl.BlockSpec((1, 1, m // 2, m), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        half_b = pl.BlockSpec((1, 1, m // 2, m), lambda i, j: (i + 1, j, 0, 0),
                              memory_space=pltpu.VMEM)
        return half_t, half_b

    # ------------------------------------------------------------------
    def measure(
        self, pre: jnp.ndarray, pim: jnp.ndarray,
        rre: jnp.ndarray, rim: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """pre/pim ``[T, N, m/2, m]`` bf16 block planes; rre/rim
        ``[T-1, m, m]`` permuted ref window spectra. Returns
        (lag, |z|, sum|D|^2, sum|G|^2) each ``[T-1, N]``."""
        T, N, m2, m = pre.shape
        t = self._t
        tab = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM)
        half_t, half_b = self._block_specs(m)
        r_spec = pl.BlockSpec((1, m, m), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            functools.partial(_measure_kernel, W=self.fft_len),
            grid=(T - 1, N),
            in_specs=[tab(t["fre"]), tab(t["fim"]), tab(t["tre"]), tab(t["tim"]),
                      tab(t["kg"]), tab(t["fg"]), tab(t["p"]), tab(t["q"]),
                      half_t, half_t, half_b, half_b, r_spec, r_spec],
            out_specs=(s_spec, s_spec, s_spec, s_spec),
            out_shape=tuple(jax.ShapeDtypeStruct((T - 1, N), jnp.float32)
                            for _ in range(4)),
            interpret=self._interpret,
        )(t["fre"], t["fim"], t["tre"], t["tim"], t["kg"], t["fg"],
          t["p"], t["q"], pre, pim, pre, pim, rre, rim)
        return out

    # ------------------------------------------------------------------
    def apply(
        self, pre: jnp.ndarray, pim: jnp.ndarray, advance: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pre/pim ``[T, N, m/2, m]`` bf16 block planes; advance
        ``[T-1, N]``. Returns the aligned overlap-save center half
        (yre, yim), each ``[T-1, N, W/2]``."""
        T, N, m2, m = pre.shape
        t = self._t
        tab = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM)
        half_t, half_b = self._block_specs(m)
        a_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        y_spec = pl.BlockSpec((1, 1, m // 2, m), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        yre, yim = pl.pallas_call(
            functools.partial(_apply_kernel, W=self.fft_len),
            grid=(T - 1, N),
            in_specs=[tab(t["fre"]), tab(t["fim"]), tab(t["tre"]), tab(t["tim"]),
                      tab(t["fire"]), tab(t["fiim"]), tab(t["kg"]), tab(t["fg"]),
                      half_t, half_t, half_b, half_b, a_spec],
            out_specs=(y_spec, y_spec),
            out_shape=(
                jax.ShapeDtypeStruct((T - 1, N, m // 2, m), jnp.float32),
                jax.ShapeDtypeStruct((T - 1, N, m // 2, m), jnp.float32),
            ),
            interpret=self._interpret,
        )(t["fre"], t["fim"], t["tre"], t["tim"], t["fire"], t["fiim"],
          t["kg"], t["fg"], pre, pim, pre, pim, advance)
        W2 = self.fft_len // 2
        return yre.reshape(T - 1, N, W2), yim.reshape(T - 1, N, W2)

    # ------------------------------------------------------------------
    # i8-native path: signed interleaved capture bytes in, raw interleaved
    # int8 wire bytes out. Block layout: ``[..., m/2, 2m]`` int8 — the
    # capture block [L, 2] reshaped (free, layout-identical): row r holds
    # samples [r*m, (r+1)*m) as I0 Q0 I1 Q1 ... The caller's u8 XOR 0x80
    # offset removal is the ONLY eager pass (elementwise, no relayout);
    # dequant, de-interleave (selection matmul), requantize and
    # re-interleave all live inside the kernels.
    # ------------------------------------------------------------------

    @staticmethod
    def _pick_nc(N: int) -> int:
        """Channels per grid step: the largest divisor of N <= 8 (amortizes
        the per-grid-step overhead; VMEM holds nc raw windows = nc*32 kB)."""
        for c in (8, 7, 6, 5, 4, 3, 2, 1):
            if N % c == 0:
                return c
        return 1

    def measure_i8(
        self, raw: jnp.ndarray, ref_raw: jnp.ndarray
    ) -> Tuple[jnp.ndarray, ...]:
        """raw ``[T, N, m/2, 2m]`` i8 blocks; ref_raw ``[T, m/2, 2m]`` i8
        reference blocks (window FFT computed in-kernel, once per grid
        step). Returns (lag, z_re, z_im, mag, papr) each ``[T-1, N]``."""
        T, N = raw.shape[:2]
        m = self.m
        t = self._t
        nc = self._pick_nc(N)
        tab = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM)
        blk_t = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_b = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i + 1, j, 0, 0),
                             memory_space=pltpu.VMEM)
        ref_t = pl.BlockSpec((1, m // 2, 2 * m), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        ref_b = pl.BlockSpec((1, m // 2, 2 * m), lambda i, j: (i + 1, 0, 0),
                             memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            functools.partial(_measure_kernel_i8, W=self.fft_len, nc=nc),
            grid=(T - 1, N // nc),
            in_specs=[tab(t["fre"]), tab(t["fim"]), tab(t["tre"]), tab(t["tim"]),
                      tab(t["kg"]), tab(t["fg"]), tab(t["p"]), tab(t["q"]),
                      tab(t["si"]), tab(t["sq"]),
                      blk_t, blk_b, ref_t, ref_b],
            out_specs=(s_spec,) * 5,
            out_shape=tuple(jax.ShapeDtypeStruct((T - 1, N), jnp.float32)
                            for _ in range(5)),
            interpret=self._interpret,
        )(t["fre"], t["fim"], t["tre"], t["tim"], t["kg"], t["fg"],
          t["p"], t["q"], t["si"], t["sq"], raw, raw, ref_raw, ref_raw)

    def measure_i8_spec(
        self, raw: jnp.ndarray, ref_raw: jnp.ndarray
    ) -> Tuple[jnp.ndarray, ...]:
        """measure_i8 + stored channel spectra for the spectrum-handoff
        apply (apply_spec_i8). Returns (lag, z_re, z_im, mag, papr, dre,
        dim); dre/dim are bf16 ``[T-1, N, m, m]`` permuted spectra."""
        T, N = raw.shape[:2]
        m = self.m
        t = self._t
        nc = self._pick_nc(N)
        tab = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM)
        blk_t = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_b = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i + 1, j, 0, 0),
                             memory_space=pltpu.VMEM)
        ref_t = pl.BlockSpec((1, m // 2, 2 * m), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        ref_b = pl.BlockSpec((1, m // 2, 2 * m), lambda i, j: (i + 1, 0, 0),
                             memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        d_spec = pl.BlockSpec((1, nc, m, m), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_measure_kernel_i8_spec, W=self.fft_len, nc=nc),
            grid=(T - 1, N // nc),
            in_specs=[tab(t["fre"]), tab(t["fim"]), tab(t["tre"]), tab(t["tim"]),
                      tab(t["kg"]), tab(t["fg"]), tab(t["p"]), tab(t["q"]),
                      tab(t["si"]), tab(t["sq"]),
                      blk_t, blk_b, ref_t, ref_b],
            out_specs=(s_spec,) * 5 + (d_spec, d_spec),
            out_shape=tuple(jax.ShapeDtypeStruct((T - 1, N), jnp.float32)
                            for _ in range(5))
            + (jax.ShapeDtypeStruct((T - 1, N, m, m), jnp.bfloat16),
               jax.ShapeDtypeStruct((T - 1, N, m, m), jnp.bfloat16)),
            interpret=self._interpret,
        )(t["fre"], t["fim"], t["tre"], t["tim"], t["kg"], t["fg"],
          t["p"], t["q"], t["si"], t["sq"], raw, raw, ref_raw, ref_raw)

    def apply_spec_i8(
        self, dre: jnp.ndarray, dim: jnp.ndarray, advance: jnp.ndarray,
        phase_re: jnp.ndarray, phase_im: jnp.ndarray,
    ) -> jnp.ndarray:
        """Spectrum-handoff apply: consumes measure_i8_spec's stored bf16
        spectra ``[T-1, N, m, m]`` (no raw re-read, no second forward FFT).
        Returns int8 wire blocks ``[T-1, N, m/2, 2m]`` like apply_i8."""
        T1, N = dre.shape[:2]
        m = self.m
        t = self._t
        nc = self._pick_nc(N)
        tab = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM)
        d_spec = pl.BlockSpec((1, nc, m, m), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        y_spec = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_apply_spec_kernel_i8, W=self.fft_len, nc=nc),
            grid=(T1, N // nc),
            in_specs=[tab(t["tre"]), tab(t["tim"]),
                      tab(t["fire"]), tab(t["fiim"]), tab(t["kg"]), tab(t["fg"]),
                      tab(t["sit"]), tab(t["sqt"]),
                      d_spec, d_spec, s_spec, s_spec, s_spec],
            out_specs=y_spec,
            out_shape=jax.ShapeDtypeStruct((T1, N, m // 2, 2 * m), jnp.int8),
            interpret=self._interpret,
        )(t["tre"], t["tim"], t["fire"], t["fiim"], t["kg"], t["fg"],
          t["sit"], t["sqt"], dre, dim, advance, phase_re, phase_im)

    def apply_i8(
        self, raw: jnp.ndarray, advance: jnp.ndarray,
        phase_re: jnp.ndarray, phase_im: jnp.ndarray,
    ) -> jnp.ndarray:
        """raw ``[T, N, m/2, 2m]`` i8 blocks; advance/phase_re/phase_im
        ``[T-1, N]`` f32. Returns the phase-corrected, int8-requantized
        overlap-save center half as raw interleaved wire blocks
        ``[T-1, N, m/2, 2m]`` (byte-identical to the [L, 2] wire layout)."""
        T, N = raw.shape[:2]
        m = self.m
        t = self._t
        nc = self._pick_nc(N)
        tab = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                     memory_space=pltpu.VMEM)
        blk_t = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
        blk_b = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i + 1, j, 0, 0),
                             memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        y_spec = pl.BlockSpec((1, nc, m // 2, 2 * m), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_apply_kernel_i8, W=self.fft_len, nc=nc),
            grid=(T - 1, N // nc),
            in_specs=[tab(t["fre"]), tab(t["fim"]), tab(t["tre"]), tab(t["tim"]),
                      tab(t["fire"]), tab(t["fiim"]), tab(t["kg"]), tab(t["fg"]),
                      tab(t["si"]), tab(t["sq"]), tab(t["sit"]), tab(t["sqt"]),
                      blk_t, blk_b, s_spec, s_spec, s_spec],
            out_specs=y_spec,
            out_shape=jax.ShapeDtypeStruct((T - 1, N, m // 2, 2 * m), jnp.int8),
            interpret=self._interpret,
        )(t["fre"], t["fim"], t["tre"], t["tim"], t["fire"], t["fiim"],
          t["kg"], t["fg"], t["si"], t["sq"], t["sit"], t["sqt"],
          raw, raw, advance, phase_re, phase_im)
