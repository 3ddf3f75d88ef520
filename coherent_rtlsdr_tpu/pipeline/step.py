"""The per-block hot path as one pure, jittable function.

This is the TPU-native replacement for the reference's entire concurrent hot
loop — ccoherent::threadf (ccoherent.cc:245-294), computelag
(ccoherent.cc:154-239), est_phasecorrect/phasecorrect (csdrdevice.cc:58-84)
and the ccontrol feedback (ccontrol.cc:78-123) — with three structural
upgrades:

  * ONE batched FFT pass feeds both lag measurement and delay correction
    (the reference runs a separate zero-padded FFT batch for the lag queue,
    then corrects nothing — timing is fixed in hardware over seconds).
  * All N channels are measured every block (the reference round-robins
    <= 7 channels per block through its nfft=8 slot queue, main.cc:165).
  * Correction is applied *this block*, exactly, via a frequency-domain
    fractional advance with overlap-save — no hardware dwell, no eaten
    samples, no multi-second convergence.

Lag measurement uses circular correlation of contiguous 2L streaming windows
rather than the reference's zero-padded half-buffers (crtlsdr.cc:205-223):
for a continuous stream the wrapped terms are valid samples at wrong offsets
(zero-mean noise for a noise reference), so the estimator keeps full window
energy — slightly *better* SNR than zero-padding, with no extra FFT.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from coherent_rtlsdr_tpu.ops.convert import c2f, f2c, u8_to_c64
from coherent_rtlsdr_tpu.ops.phase import ema_complex, phase_correction_estimate
from coherent_rtlsdr_tpu.ops.spectral import rms
from coherent_rtlsdr_tpu.pipeline.control import control_update
from coherent_rtlsdr_tpu.pipeline.state import (
    BlockOutput,
    PipelineConfig,
    PipelineState,
    Telemetry,
)


def step(
    cfg: PipelineConfig,
    state: PipelineState,
    sig_u8: jnp.ndarray,  # [N, L, 2] uint8 raw interleaved IQ
    ref_u8: jnp.ndarray,  # [L, 2] uint8 reference-channel raw IQ
    update_gate: jnp.ndarray,  # scalar bool — reference noise injected
    seq: jnp.ndarray = None,  # [N] uint32 per-channel capture seqnums
) -> Tuple[PipelineState, BlockOutput]:
    """Process one block: measure -> control -> correct -> phase -> emit.

    Output samples carry a fixed pipeline latency of L/2 samples (the
    overlap-save center window), which buys an instantaneous +-L/2-sample
    correction range. ``aligned[:, n]`` and ``ref[n]`` refer to the same
    instant — the coherent receive matrix row.

    ``seq`` enables in-pipeline gap detection: a per-channel seqnum jump
    (a dropped capture buffer — the reference's documented failure mode,
    README.md:42, detected only by clients via cpacketizer.cc:113,142)
    marks the channel's measurement invalid THIS block (its overlap-save
    window straddles the discontinuity), freezes its phase, desyncs it
    (policy: flag + freeze until it re-locks), and bumps its cumulative gap
    counter. ``seq=None`` synthesizes contiguous seqnums (no gaps).
    """
    L = cfg.block_len
    sig = u8_to_c64(sig_u8)  # [N, L]
    ref = u8_to_c64(ref_u8)  # [L]

    # --- seqnum-gap detection -------------------------------------------
    if seq is None:
        seq = state.last_seq + jnp.uint32(1)
    seq = seq.astype(jnp.uint32)
    delta = seq - state.last_seq  # uint32 wraparound-safe
    gap = (delta != 1) & (state.block_idx > 0)  # [N] bool
    new_gaps = state.gaps + gap.astype(jnp.int32)
    meas_ok = update_gate & jnp.logical_not(gap)  # [N] per-channel gating

    from coherent_rtlsdr_tpu.kernels.backend import get_spectral

    sp = get_spectral(cfg, 2 * L)

    # One block-preparation pass feeds both measurement and correction;
    # the window of this step is blocks (t-1, t) = (history, current).
    # (State history is stored as float pairs; complexify inside the
    # program.) Backends: spectra for xla/mxu, fused Pallas mega-kernels
    # for 'fused' (kernels/backend.py).
    sig_blocks = jnp.stack([f2c(state.hist), sig])        # [2, N, L]
    ref_blocks = jnp.stack([f2c(state.ref_hist), ref])    # [2, L]
    ctx = sp.prepare(sig_blocks, ref_blocks)

    # Measure absolute lag of every channel (ccoherent::computelag analog).
    meas_b = sp.measure(ctx, cfg.lag_method)
    meas = jax.tree_util.tree_map(lambda a: a[0], meas_b)

    # Control update (ccontrol analog, numerical). Gap-hit channels ignore
    # this block's measurement and drop their sync flag.
    new_delay, new_synced = control_update(
        cfg, state.delay, state.synced, meas.lag, meas.mag, meas_ok
    )
    new_synced = new_synced & jnp.logical_not(gap)

    # Apply the fractional advance in frequency domain; overlap-save slice.
    out_raw = sp.correct(ctx, new_delay[None])[0]         # [N, L] aligned
    out_ref = jnp.concatenate(
        [f2c(state.ref_hist)[L // 2:], ref[: L // 2]]
    )                                                     # [L] same latency

    # Phase estimation on the time-aligned signal (est_phasecorrect analog),
    # gated by the reference-noise flag (ccoherent.cc:271-273) and by
    # measurement quality.
    pc_inst = phase_correction_estimate(out_raw, out_ref)
    good = meas_ok & (meas.mag >= cfg.min_corr_mag)
    old_phase = f2c(state.phase)
    ema = ema_complex(old_phase, pc_inst, alpha=cfg.phase_alpha)
    new_phase = jnp.where(good, ema, old_phase)

    aligned = out_raw * new_phase[:, None]

    telemetry = Telemetry(
        lag=meas.lag,
        residual=meas.lag - new_delay,
        mag=meas.mag,
        papr=meas.papr,
        phase=c2f(new_phase),
        synced=new_synced,
        rms=rms(sig, axis=-1),
        gap=gap,
        gaps=new_gaps,
    )
    new_state = PipelineState(
        delay=new_delay,
        phase=c2f(new_phase),
        lag=meas.lag,
        mag=meas.mag,
        papr=meas.papr,
        synced=new_synced,
        hist=c2f(sig),
        ref_hist=c2f(ref),
        block_idx=state.block_idx + 1,
        last_seq=seq,
        gaps=new_gaps,
    )
    return new_state, BlockOutput(aligned=aligned, ref=out_ref, telemetry=telemetry)


def make_step(cfg: PipelineConfig, donate: bool = True):
    """Jitted streaming step with the state buffer donated (the hist buffers
    are the large carry; donation keeps HBM traffic at one block in, one
    aligned block out)."""
    f = partial(step, cfg)
    return jax.jit(f, donate_argnums=(0,) if donate else ())
