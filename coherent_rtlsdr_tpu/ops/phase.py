"""Per-channel complex phase correction.

Parity with the reference's ``csdrdevice::est_phasecorrect`` /
``phasecorrect`` (src/csdrdevice.cc:58-84): the correction factor is the
normalized conjugate of the signal-vs-reference dot product, smoothed with an
EMA (alpha = 0.5), and applied as a complex scalar multiply. Estimation is
gated by the reference-noise flag (ccoherent.cc:271-273) — that gating lives
in the pipeline step, not here.
"""

import jax.numpy as jnp

from coherent_rtlsdr_tpu.constants import PHASE_EMA_ALPHA


def phase_correction_estimate(sig: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Instantaneous unit-modulus correction factor per channel.

    sig: ``[..., L]``; ref: ``[L]``. Returns ``[...]`` complex64 such that
    ``sig * factor`` is phase-aligned with ``ref``:
    ``factor = conj(<sig, ref*>) / |<sig, ref*>|`` (csdrdevice.cc:58-69).
    """
    z = jnp.sum(sig * jnp.conj(ref), axis=-1)
    mag = jnp.abs(z)
    return jnp.where(mag > 0, jnp.conj(z) / jnp.where(mag > 0, mag, 1.0), 1.0 + 0j).astype(
        jnp.complex64
    )


def ema_complex(
    prev: jnp.ndarray,
    new: jnp.ndarray,
    alpha: float = PHASE_EMA_ALPHA,
    renormalize: bool = True,
) -> jnp.ndarray:
    """EMA of complex factors, ``alpha`` = weight of the *new* sample
    (reference uses 0.5, csdrdevice.cc:66-68). ``renormalize`` keeps the
    result unit-modulus so the correction never scales amplitude."""
    out = (1.0 - alpha) * prev + alpha * new
    if renormalize:
        mag = jnp.abs(out)
        out = jnp.where(mag > 0, out / jnp.where(mag > 0, mag, 1.0), 1.0 + 0j)
    return out.astype(jnp.complex64)
