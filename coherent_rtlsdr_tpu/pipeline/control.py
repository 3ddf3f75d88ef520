"""Per-channel synchronization control law.

The reference's ccontrol thread (src/ccontrol.cc:78-123) cannot correct the
stream directly — it skews the dongle's hardware resampler by
``p = maxppm * tanh(lag/scale)`` ppm for a dwell time ``t = 0.9*|lag/(p*fs)|``
so the stream "eats" ~90% of the lag per iteration, then re-measures.

Here the correction is numerical and exact, so the control law's job reduces
to *robust tracking*: damp measurement noise, reject garbage measurements
(low correlation), clamp to the overlap-save safe range, and declare sync.
The tanh damping profile is retained: it gives the same large-lag slew-rate
limit and near-unity small-lag gain as the reference's dynamics, and makes
acquisition robust when the initial lag estimate is an alias.
"""

from typing import Tuple

import jax.numpy as jnp

from coherent_rtlsdr_tpu.pipeline.state import PipelineConfig


def control_update(
    cfg: PipelineConfig,
    delay: jnp.ndarray,     # [N] current commanded advance
    synced: jnp.ndarray,    # [N] current sync flags
    meas_lag: jnp.ndarray,  # [N] measured *absolute* lag of the raw input
    meas_mag: jnp.ndarray,  # [N] correlation coefficient of the measurement
    update_gate: jnp.ndarray,  # scalar bool: reference noise present
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(new_delay, new_synced)``.

    The measured lag is absolute (measured on the uncorrected input), so the
    target command is ``meas_lag`` itself; the update moves the command toward
    it by the tanh-damped error, mirroring ccontrol's per-iteration lag
    consumption (ccontrol.cc:73-76,99-116):

        err   = meas_lag - delay
        step  = gain * scale * tanh(err / scale)
        delay = clip(delay + step, +-max_delay)

    For |err| << scale this is ``delay += gain*err`` (the reference's 90%
    dwell fraction); for large errors the step saturates at ``gain*scale``
    per *measurement* — but unlike the reference, each step is applied
    instantly instead of via seconds of hardware slewing.

    Measurements with correlation below ``cfg.min_corr_mag`` are ignored
    (the reference has no such guard and chases noise when the reference
    noise source is off — a documented operational hazard).
    """
    err = meas_lag - delay
    step = cfg.ctrl_gain * cfg.ctrl_scale * jnp.tanh(err / cfg.ctrl_scale)
    good = (meas_mag >= cfg.min_corr_mag) & update_gate
    new_delay = jnp.where(good, delay + step, delay)
    new_delay = jnp.clip(new_delay, -cfg.max_delay, cfg.max_delay)

    residual = meas_lag - new_delay
    # Sync criterion |residual| <= threshold (common.h:32, ccontrol.cc:99).
    new_synced = jnp.where(
        good,
        jnp.abs(residual) <= cfg.sync_threshold,
        synced,
    )
    return new_delay, new_synced
