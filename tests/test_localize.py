"""Near-field localization tests with a known emitter position."""

import jax
import jax.numpy as jnp
import numpy as np

from coherent_rtlsdr_tpu.models.geometry import (
    nearfield_steering_vectors,
    ura_positions,
)
from coherent_rtlsdr_tpu.models.localize import (
    make_xyz_grid,
    ml_localize,
    nearfield_music,
)


def _nearfield_snapshots(key, positions, xyz, snr_db=20.0, n_snap=256):
    a = nearfield_steering_vectors(positions, jnp.asarray(xyz)[None, :])[0]  # [N]
    k1, k2 = jax.random.split(key)
    s = (
        jax.random.normal(k1, (n_snap,)) + 1j * jax.random.normal(
            jax.random.fold_in(k1, 1), (n_snap,))
    ).astype(jnp.complex64)
    n = positions.shape[0]
    noise = (
        jax.random.normal(k2, (n, n_snap)) + 1j * jax.random.normal(
            jax.random.fold_in(k2, 1), (n, n_snap))
    ).astype(jnp.complex64) * (10 ** (-snr_db / 20))
    return a[:, None] * s[None, :] + noise


class TestNearField:
    # 7x3 URA spanning 3x1 wavelengths; emitter a few wavelengths away
    POS = ura_positions(7, 3, 0.5)
    TRUE = np.array([1.5, 0.5, 4.0], np.float32)  # x, y, z (wavelengths)

    def _grid(self):
        return make_xyz_grid((0.0, 3.0), (0.0, 1.0), (2.0, 6.0), (16, 6, 17))

    def test_ml_localize_finds_emitter(self):
        X = _nearfield_snapshots(
            jax.random.PRNGKey(0), self.POS, self.TRUE, snr_db=30.0
        )
        grid = self._grid()
        xyz_hat, spec = ml_localize(X, self.POS, grid)
        err = np.abs(np.asarray(xyz_hat) - self.TRUE)
        # Bearing (x, y) resolves to a grid step; range (z) resolution from
        # wavefront curvature scales ~z^2/aperture^2 — allow 3 z-steps.
        assert err[0] <= 0.21 and err[1] <= 0.21 and err[2] <= 0.76, xyz_hat

    def test_nearfield_music_peak(self):
        X = _nearfield_snapshots(
            jax.random.PRNGKey(1), self.POS, self.TRUE, snr_db=30.0
        )
        grid = self._grid()
        P = nearfield_music(X, self.POS, grid, n_sources=1)
        xyz_pk = np.asarray(grid[int(jnp.argmax(P))])
        err = np.abs(xyz_pk - self.TRUE)
        assert err[0] <= 0.21 and err[1] <= 0.21 and err[2] <= 0.76, xyz_pk
