"""Beamforming/DOA model tests with known source directions — the MUSIC
validation the reference does by eyeballing gnuplot surfaces
(beamformclient/heatmap2d2.cpp), as assertions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coherent_rtlsdr_tpu.models import (
    augmented_covariance,
    bartlett_spectrum,
    difference_coarray,
    music_heatmap,
    music_spectrum,
    mvdr_spectrum,
    sample_covariance,
    steering_vectors,
    ula_positions,
    ura_positions,
    uv_grid,
)


def _snapshots(key, positions, uvs, snr_db=20.0, n_snap=256):
    """Plane-wave sources from directions `uvs` [K, 2] + noise."""
    n = positions.shape[0]
    k1, k2 = jax.random.split(key)
    A = steering_vectors(positions, jnp.asarray(uvs))  # [K, N]
    s = (
        jax.random.normal(k1, (len(uvs), n_snap))
        + 1j * jax.random.normal(jax.random.fold_in(k1, 1), (len(uvs), n_snap))
    ).astype(jnp.complex64)
    noise = (
        jax.random.normal(k2, (n, n_snap))
        + 1j * jax.random.normal(jax.random.fold_in(k2, 1), (n, n_snap))
    ).astype(jnp.complex64) * (10 ** (-snr_db / 20))
    return A.T @ s + noise


def _peak_uv(P, ax):
    i = int(jnp.argmax(P))
    g = P.shape[0]
    return float(ax[i % g]), float(ax[i // g])


class TestMusic:
    def test_single_source_peak(self):
        pos = ura_positions(7, 3, 0.5)  # the published 7x3 URA
        true_uv = np.array([[0.3, -0.2]])
        X = _snapshots(jax.random.PRNGKey(0), pos, true_uv)
        P = music_heatmap(X, pos, n_sources=1, n_points=101)
        _, ax = uv_grid(101)
        u, v = _peak_uv(P, np.asarray(ax))
        assert abs(u - 0.3) < 0.03 and abs(v + 0.2) < 0.03

    def test_two_sources_resolved(self):
        pos = ura_positions(7, 3, 0.5)
        true_uv = np.array([[0.4, 0.1], [-0.35, -0.3]])
        X = _snapshots(jax.random.PRNGKey(1), pos, true_uv, n_snap=512)
        uv, ax = uv_grid(101)
        A = steering_vectors(pos, uv)
        R = sample_covariance(X)
        P = np.asarray(music_spectrum(R, A, n_sources=2)).reshape(101, 101)
        # Both true directions must lie on strong local maxima: their MUSIC
        # value within a grid cell of truth must exceed the median by >20 dB.
        med = np.median(P)
        for u, v in true_uv:
            iu = int(round((u + 1) / 2 * 100))
            iv = int(round((v + 1) / 2 * 100))
            local = P[max(iv - 1, 0) : iv + 2, max(iu - 1, 0) : iu + 2].max()
            assert local / med > 100.0

    def test_bartlett_and_mvdr_peak(self):
        pos = ula_positions(8, 0.5)
        true_uv = np.array([[0.25, 0.0]])
        X = _snapshots(jax.random.PRNGKey(2), pos, true_uv)
        uv, ax = uv_grid(201)
        A = steering_vectors(pos, uv)
        R = sample_covariance(X)
        for spec in (bartlett_spectrum(R, A), mvdr_spectrum(R, A)):
            P = np.asarray(spec).reshape(201, 201)
            # ULA on x: spectrum depends on u only; check peak u column.
            u_profile = P.mean(axis=0)
            u_pk = float(np.asarray(ax)[int(np.argmax(u_profile))])
            assert abs(u_pk - 0.25) < 0.03


class TestCoarray:
    def test_difference_coarray_of_ula(self):
        pos = np.array([[0, 0], [1, 0], [4, 0]])  # minimum-redundancy-ish
        lags = difference_coarray(pos)
        xs = sorted(int(l[0]) for l in lags)
        assert xs == [-4, -3, -1, 0, 1, 3, 4]

    def test_augmented_covariance_structure(self):
        """Augmented covariance from a sparse array equals the full-array
        covariance for an ideal (noise-free, single-source) field."""
        sparse = np.array([[0, 0], [1, 0], [3, 0], [4, 0]])
        u = 0.22
        # Ideal covariance entries depend only on the lag: R_ij = e^{2pi i u (xi-xj) * .5}
        # Use spacing 0.5 wavelength per grid unit.
        phase = lambda d: np.exp(2j * np.pi * 0.5 * u * d)
        R = jnp.asarray(
            [[phase(xi - xj) for (xj, _) in sparse] for (xi, _) in sparse],
            dtype=jnp.complex64,
        )
        Raug = augmented_covariance(R, sparse, box=(5, 1))
        expect = np.array(
            [[phase(a - b) for b in range(5)] for a in range(5)],
            dtype=np.complex64,
        )
        np.testing.assert_allclose(np.asarray(Raug), expect, atol=1e-5)

    def test_missing_lag_raises(self):
        sparse = np.array([[0, 0], [4, 0]])
        R = jnp.eye(2, dtype=jnp.complex64)
        with pytest.raises(ValueError):
            augmented_covariance(R, sparse, box=(4, 1))

    def test_coarray_music_resolves_more_sources_than_sensors(self):
        """The DA2D.m capability end-to-end: a 4-sensor minimum-redundancy
        array {0,1,4,6} spans a 7-element virtual ULA; co-array MUSIC
        resolves FIVE uncorrelated sources — more than the 3 a 4-sensor
        physical MUSIC can ever separate."""
        from coherent_rtlsdr_tpu.models import coarray_music_spectrum, uv_grid

        sparse = np.array([[0, 0], [1, 0], [4, 0], [6, 0]])
        us = np.array([-0.72, -0.35, 0.0, 0.38, 0.7])  # source direction cosines
        rng = np.random.default_rng(0)
        T = 4000
        # uncorrelated unit-power sources + small noise, spacing 0.5 wl/grid
        S = (rng.normal(size=(5, T)) + 1j * rng.normal(size=(5, T))) / np.sqrt(2)
        A = np.exp(
            2j * np.pi * 0.5 * sparse[:, :1] * us[None, :]
        )  # [4, 5]
        X = A @ S + 0.03 * (
            rng.normal(size=(4, T)) + 1j * rng.normal(size=(4, T))
        )
        R = jnp.asarray((X @ X.conj().T) / T, jnp.complex64)

        grid = 241
        uv, ax = uv_grid(grid)
        P = np.asarray(
            coarray_music_spectrum(R, sparse, (7, 1), uv, 5, spacing=0.5)
        ).reshape(grid, grid)
        u_profile = P.max(axis=0)  # collapse v (linear array)
        axv = np.asarray(ax)
        # find 5 distinct local maxima near the true directions
        for u_true in us:
            window = (axv > u_true - 0.08) & (axv < u_true + 0.08)
            outside = ~((axv > u_true - 0.15) & (axv < u_true + 0.15))
            assert u_profile[window].max() > 3.0 * np.median(u_profile[outside]), u_true
            u_pk = axv[window][int(np.argmax(u_profile[window]))]
            assert abs(u_pk - u_true) < 0.05, (u_pk, u_true)


class TestGridlessDoa:
    """LS-ESPRIT and root-MUSIC (gridless ULA DOA — beyond the reference's
    grid-scan estimators)."""

    def _ula_snapshots(self, thetas_deg, N=8, T=400, d=0.5, snr_db=20.0,
                      seed=0):
        rng = np.random.default_rng(seed)
        th = np.radians(thetas_deg)
        n = np.arange(N)[:, None]
        A = np.exp(1j * 2 * np.pi * d * n * np.sin(th)[None, :])  # [N, K]
        S = (rng.standard_normal((len(th), T))
             + 1j * rng.standard_normal((len(th), T))) / np.sqrt(2)
        noise = (rng.standard_normal((N, T))
                 + 1j * rng.standard_normal((N, T))) / np.sqrt(2)
        X = A @ S + noise * 10 ** (-snr_db / 20)
        return X.astype(np.complex64)

    def test_esprit_recovers_angles(self):
        from coherent_rtlsdr_tpu.models.beamform import (
            esprit_doa,
            sample_covariance,
        )

        thetas = [-20.0, 35.0]
        X = self._ula_snapshots(thetas)
        R = sample_covariance(jnp.asarray(X), subtract_mean=False)
        est = np.degrees(esprit_doa(R, n_sources=2))
        np.testing.assert_allclose(est, sorted(thetas), atol=1.0)

    def test_root_music_recovers_angles(self):
        from coherent_rtlsdr_tpu.models.beamform import (
            root_music_doa,
            sample_covariance,
        )

        thetas = [-20.0, 35.0]
        X = self._ula_snapshots(thetas)
        R = sample_covariance(jnp.asarray(X), subtract_mean=False)
        est = np.degrees(root_music_doa(R, n_sources=2))
        np.testing.assert_allclose(est, sorted(thetas), atol=1.0)

    def test_close_sources_resolved(self):
        """Gridless estimators separate sources closer than a coarse grid."""
        from coherent_rtlsdr_tpu.models.beamform import (
            esprit_doa,
            root_music_doa,
            sample_covariance,
        )

        thetas = [10.0, 16.0]
        X = self._ula_snapshots(thetas, N=12, T=800, snr_db=25.0, seed=3)
        R = sample_covariance(jnp.asarray(X), subtract_mean=False)
        for est in (np.degrees(esprit_doa(R, 2)),
                    np.degrees(root_music_doa(R, 2))):
            np.testing.assert_allclose(est, thetas, atol=1.5)

    def test_single_source(self):
        from coherent_rtlsdr_tpu.models.beamform import (
            esprit_doa,
            root_music_doa,
            sample_covariance,
        )

        X = self._ula_snapshots([12.5], seed=5)
        R = sample_covariance(jnp.asarray(X), subtract_mean=False)
        assert abs(np.degrees(esprit_doa(R, 1))[0] - 12.5) < 0.5
        assert abs(np.degrees(root_music_doa(R, 1))[0] - 12.5) < 0.5
