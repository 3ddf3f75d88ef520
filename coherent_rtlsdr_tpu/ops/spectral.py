"""Small spectral/statistics ops — parity with the reference's cdsp utility
kernels (include/cdsp.h:36-71, src/cdsp.cc), with the stubs implemented:

  * ``rms``          — cdsp::rms real & complex (cdsp.cc:68-78)
  * ``magsquared``   — cdsp::magsquared (cdsp.cc:100-103)
  * ``crest_factor`` — cdsp::crestfactor (cdsp.cc:80-98)
  * ``papr``         — cdsp::PAPR is a stub returning 0 in the reference
                       (cdsp.cc:85-88); implemented for real here
  * ``conj_dot``     — cdsp::conj_dotproduct (cdsp.cc:61-66)
"""

import jax.numpy as jnp


def magsquared(x: jnp.ndarray) -> jnp.ndarray:
    """|x|^2 elementwise, computed without the sqrt of ``jnp.abs``."""
    return jnp.real(x) ** 2 + jnp.imag(x) ** 2


def rms(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Root-mean-square; complex inputs use |x|^2 (cdsp.cc:73-78)."""
    if jnp.iscomplexobj(x):
        return jnp.sqrt(jnp.mean(magsquared(x), axis=axis))
    return jnp.sqrt(jnp.mean(x * x, axis=axis))


def crest_factor(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Peak amplitude / RMS (cdsp.cc:80-98)."""
    peak = jnp.max(jnp.abs(x), axis=axis)
    r = rms(x, axis=axis)
    return peak / jnp.where(r > 0, r, 1.0)


def papr(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Peak-to-average power ratio (linear). The quality metric the reference
    records per lag estimate but never fills in (csdrdevice.h:42-54,
    cdsp.cc:85-88)."""
    p = magsquared(x) if jnp.iscomplexobj(x) else x * x
    mean = jnp.mean(p, axis=axis)
    return jnp.max(p, axis=axis) / jnp.where(mean > 0, mean, 1.0)


def conj_dot(a: jnp.ndarray, b: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """``sum(a * conj(b))`` (cdsp.cc:61-66)."""
    return jnp.sum(a * jnp.conj(b), axis=axis)
