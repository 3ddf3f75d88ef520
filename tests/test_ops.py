"""Unit tests for the core DSP ops against analytic ground truth — the test
layer the reference entirely lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coherent_rtlsdr_tpu import ops
from coherent_rtlsdr_tpu.ops.delay import delay_ramp


def _noise(key, n, amp=1.0):
    k1, k2 = jax.random.split(key)
    return (
        jax.random.normal(k1, (n,), dtype=jnp.float32)
        + 1j * jax.random.normal(k2, (n,), dtype=jnp.float32)
    ).astype(jnp.complex64) * amp


def _delayed(ref, d):
    """Exact circular fractional delay of ref by d samples."""
    W = ref.shape[-1]
    return jnp.fft.ifft(jnp.fft.fft(ref) * delay_ramp(W, jnp.float32(d))).astype(
        jnp.complex64
    )


# --- convert ---------------------------------------------------------------

class TestConvert:
    def test_u8_to_i8_is_xor_0x80(self):
        raw = jnp.arange(256, dtype=jnp.uint8)
        out = np.asarray(ops.u8_to_i8(raw))
        expected = (np.arange(256, dtype=np.uint8) ^ 0x80).astype(np.int8)
        np.testing.assert_array_equal(out, expected)

    def test_u8_to_c64_formula(self):
        raw = jnp.array([[128, 128], [255, 0], [0, 255]], dtype=jnp.uint8)
        out = np.asarray(ops.u8_to_c64(raw))
        np.testing.assert_allclose(out[0], 0.0)
        np.testing.assert_allclose(out[1], (127 - 128j) / 127.0, rtol=1e-6)
        np.testing.assert_allclose(out[2], (-128 + 127j) / 127.0, rtol=1e-6)

    def test_roundtrip(self):
        key = jax.random.PRNGKey(0)
        # amp low enough that 4-sigma tails stay inside +-1.0 full scale
        # (clipping is separately covered by test_saturation).
        x = _noise(key, 1024, amp=0.15)
        i8 = ops.c64_to_i8_iq(x)
        back = ops.i8_iq_to_c64(i8)
        # quantization step is 1/127 per rail
        assert float(jnp.max(jnp.abs(back - x))) < 1.0 / 127.0

    def test_saturation(self):
        x = jnp.array([10.0 + 10.0j, -10.0 - 10.0j], dtype=jnp.complex64)
        i8 = np.asarray(ops.c64_to_i8_iq(x))
        np.testing.assert_array_equal(i8[0], [127, 127])
        np.testing.assert_array_equal(i8[1], [-128, -128])


# --- xcorr / lag -----------------------------------------------------------

class TestLagEstimate:
    @pytest.mark.parametrize("true_lag", [0, 1, -1, 17, -113, 1000, -1000])
    def test_integer_lag_exact(self, true_lag):
        key = jax.random.PRNGKey(1)
        L = 4096
        ref = _noise(key, 2 * L)
        # sig[n] = ref[n - lag]: slice shifted windows out of one long noise seq
        base = L // 2
        ref_blk = jax.lax.dynamic_slice(ref, (base,), (L,))
        sig_blk = jax.lax.dynamic_slice(ref, (base - true_lag,), (L,))
        est = ops.lag_estimate(sig_blk, ref_blk, method="integer")
        assert int(est.lag) == true_lag
        # Circular correlation of two stream windows overlaps on L-|lag|
        # samples, so the correlation coefficient scales accordingly.
        assert float(est.mag) > 0.85 * (1.0 - abs(true_lag) / L)
        assert float(est.papr) > 100.0

    @pytest.mark.parametrize("method", ["phase_slope", "parabolic", "phase_zoom"])
    @pytest.mark.parametrize("true_lag", [0.25, -3.7, 12.5, -0.49])
    def test_fractional_lag(self, method, true_lag):
        key = jax.random.PRNGKey(2)
        L = 4096
        ref = _noise(key, L)
        sig = _delayed(ref, true_lag)
        est = ops.lag_estimate(sig, ref, method=method)
        # parabolic on the Dirichlet peak magnitude has up to ~0.2-sample
        # bias (it is the cheap legacy method; phase_slope is the default).
        tol = 0.25 if method == "parabolic" else 5e-3
        assert abs(float(est.lag) - true_lag) < tol, (
            f"{method}: est {float(est.lag)} vs true {true_lag}"
        )

    @pytest.mark.parametrize("method", ["phase_slope", "phase_zoom"])
    def test_fractional_with_noise(self, method):
        key = jax.random.PRNGKey(3)
        L = 8192
        ref = _noise(key, L)
        true_lag = 5.3
        snr_db = 20.0
        noise = _noise(jax.random.PRNGKey(99), L, amp=10 ** (-snr_db / 20))
        sig = _delayed(ref, true_lag) + noise
        est = ops.lag_estimate(sig, ref, method=method)
        assert abs(float(est.lag) - true_lag) < 0.02
        assert float(est.mag) > 0.9

    def test_phase_zoom_larger_lags(self):
        """phase_zoom is unambiguous for |lag| < W/16 (coarse-stage band
        count); beyond that it must fail SAFE (mag collapses, so the
        quality gate rejects the measurement)."""
        key = jax.random.PRNGKey(13)
        L = 8192
        ref = _noise(key, L)
        for true_lag in (250.25, -500.5):  # inside +-W/16 = +-512
            sig = _delayed(ref, true_lag)
            est = ops.lag_estimate(sig, ref, method="phase_zoom")
            assert abs(float(est.lag) - true_lag) < 0.01, (
                true_lag, float(est.lag)
            )
            assert float(est.mag) > 0.9
        # out of range: wrong lag is fine, but mag must reject it
        sig = _delayed(ref, 1000.0)
        est = ops.lag_estimate(sig, ref, method="phase_zoom")
        assert float(est.mag) < 0.1

    def test_phase_zoom_papr_consistent_with_argmax_path(self):
        """phase_zoom's Parseval PAPR (|z|^2/sum|G|^2) must track the
        argmax path's peak/mean PAPR — the validation metric from
        seqnum_and_correlation.m — not return 0 (it used to, degrading
        telemetry silently when that estimator was selected)."""
        key = jax.random.PRNGKey(21)
        L = 4096
        ref = _noise(key, L)
        sig = _delayed(ref, 7.25)
        pz = ops.lag_estimate(sig, ref, method="phase_zoom")
        ps = ops.lag_estimate(sig, ref, method="phase_slope")
        assert float(pz.papr) > 100.0
        assert 0.3 < float(pz.papr) / float(ps.papr) < 3.0
        # and an uncorrelated pair gives low PAPR on both
        other = _noise(jax.random.PRNGKey(77), L)
        pz0 = ops.lag_estimate(other, ref, method="phase_zoom")
        assert float(pz0.papr) < 50.0

    def test_batched_channels(self):
        key = jax.random.PRNGKey(4)
        L = 4096
        ref = _noise(key, L)
        lags = jnp.array([0.0, 2.5, -7.25, 33.0])
        sig = jnp.stack([_delayed(ref, d) for d in lags])
        est = ops.lag_estimate_batched(sig, ref)
        np.testing.assert_allclose(np.asarray(est.lag), np.asarray(lags), atol=5e-3)
        assert np.all(np.asarray(est.mag) > 0.9)

    def test_uncorrelated_low_mag(self):
        L = 4096
        ref = _noise(jax.random.PRNGKey(5), L)
        sig = _noise(jax.random.PRNGKey(6), L)
        est = ops.lag_estimate(sig, ref)
        assert float(est.mag) < 0.2
        assert float(est.papr) < 50.0


# --- delay / correction ----------------------------------------------------

class TestDelayOps:
    @pytest.mark.parametrize("adv", [0.0, 0.5, -2.75, 100.25, -2047.0])
    def test_overlap_save_advance_recovers_signal(self, adv):
        """Delay a stream by `adv`, correct with overlap_save_advance, and
        compare to the original (away from numerical edges)."""
        key = jax.random.PRNGKey(7)
        L = 4096
        total = 4 * L
        ref = _noise(key, total)
        sig = _delayed(ref, adv)  # sig[n] = ref[n - adv]

        blocks = sig.reshape(4, L)
        hist = blocks[0]
        outs = []
        for t in range(1, 4):
            hist, out = ops.overlap_save_advance(
                hist, blocks[t], jnp.float32(adv), jnp.complex64(1.0)
            )
            outs.append(out)
        out = jnp.concatenate(outs)
        # out[n] for block t covers ref at absolute times [t*L - L/2, t*L + L/2)
        expect = jax.lax.dynamic_slice(ref, (L - L // 2,), (3 * L,))
        err = jnp.abs(out - expect)
        rms_err = float(jnp.sqrt(jnp.mean(jnp.abs(err) ** 2)))
        rms_sig = float(jnp.sqrt(jnp.mean(jnp.abs(expect) ** 2)))
        # Fractional delays of a non-periodic window leak O(1/distance) from
        # the circular boundary: ~-46 dB for full-band white noise at L/2
        # margin — at the int8 quantization floor (-48 dB), so acceptable.
        # Integer advances are exact.
        tol = 1e-4 if float(adv) == int(adv) else 1e-2
        assert rms_err / rms_sig < tol

    def test_overlap_save_applies_phase(self):
        key = jax.random.PRNGKey(8)
        L = 1024
        x = _noise(key, 2 * L)
        hist, cur = x[:L], x[L:]
        phase = jnp.exp(1j * jnp.float32(0.7)).astype(jnp.complex64)
        _, out = ops.overlap_save_advance(hist, cur, jnp.float32(0.0), phase)
        expect = x[L // 2 : L // 2 + L] * phase
        assert float(jnp.max(jnp.abs(out - expect))) < 1e-4

    @pytest.mark.parametrize("adv", [0.0, 0.3, -1.6, 5.25])
    def test_farrow_matches_exact(self, adv):
        key = jax.random.PRNGKey(9)
        L = 4096
        # Cubic Lagrange is accurate to ~0.4x Nyquist; bandlimit accordingly
        # (the tuner's anti-alias filter does the same for real captures).
        x = _noise(key, L)
        F = jnp.fft.fft(x)
        f = jnp.abs(jnp.fft.fftfreq(L))
        x = jnp.fft.ifft(jnp.where(f < 0.2, F, 0.0)).astype(jnp.complex64)
        exact = _delayed(x, -adv)  # x(n + adv)
        out = ops.farrow_fractional_delay(x, jnp.float32(adv))
        mid = slice(64, L - 64)
        err = float(jnp.sqrt(jnp.mean(jnp.abs(out[mid] - exact[mid]) ** 2)))
        sig = float(jnp.sqrt(jnp.mean(jnp.abs(exact[mid]) ** 2)))
        assert err / sig < 2e-2

    def test_farrow_per_sample_advance(self):
        """Linearly growing advance (clock skew model) tracks the exact
        time-varying delay."""
        key = jax.random.PRNGKey(10)
        L = 8192
        x = _noise(key, L)
        F = jnp.fft.fft(x)
        f = jnp.abs(jnp.fft.fftfreq(L))
        x = jnp.fft.ifft(jnp.where(f < 0.2, F, 0.0)).astype(jnp.complex64)
        ppm = 100.0
        adv = ppm * 1e-6 * jnp.arange(L, dtype=jnp.float32)
        out = ops.farrow_fractional_delay(x, adv)
        # Check a few points against exact single-offset interpolation
        for n in [1000, 4000, 7000]:
            exact = _delayed(x, -float(adv[n]))[n]
            assert abs(complex(out[n] - exact)) < 5e-2


# --- phase -----------------------------------------------------------------

class TestPhase:
    def test_phase_recovery(self):
        key = jax.random.PRNGKey(11)
        L = 4096
        ref = _noise(key, L)
        true_phase = 1.234
        sig = ref * jnp.exp(1j * jnp.float32(true_phase))
        pc = ops.phase_correction_estimate(sig, ref)
        corrected = sig * pc
        resid = float(jnp.angle(jnp.sum(corrected * jnp.conj(ref))))
        assert abs(resid) < 1e-4
        assert abs(float(jnp.abs(pc)) - 1.0) < 1e-5

    def test_phase_batched(self):
        key = jax.random.PRNGKey(12)
        L = 2048
        ref = _noise(key, L)
        phases = jnp.array([0.0, 0.5, -2.0])
        sig = ref[None, :] * jnp.exp(1j * phases)[:, None]
        pc = ops.phase_correction_estimate(sig, ref)
        np.testing.assert_allclose(
            np.angle(np.asarray(pc)), -np.asarray(phases), atol=1e-4
        )

    def test_ema_unit_modulus(self):
        a = jnp.complex64(jnp.exp(1j * 0.1))
        b = jnp.complex64(jnp.exp(1j * 0.3))
        out = ops.ema_complex(a, b, alpha=0.5)
        assert abs(float(jnp.abs(out)) - 1.0) < 1e-6
        assert abs(float(jnp.angle(out)) - 0.2) < 1e-2


# --- spectral --------------------------------------------------------------

class TestSpectral:
    def test_rms_complex(self):
        x = jnp.full((1000,), 1.0 + 1.0j, dtype=jnp.complex64)
        assert abs(float(ops.rms(x)) - np.sqrt(2.0)) < 1e-5

    def test_papr_constant_is_one(self):
        x = jnp.full((512,), 2.0 + 0j, dtype=jnp.complex64)
        assert abs(float(ops.papr(x)) - 1.0) < 1e-5

    def test_papr_impulse(self):
        x = jnp.zeros((512,), dtype=jnp.complex64).at[10].set(1.0 + 0j)
        assert abs(float(ops.papr(x)) - 512.0) < 1e-2

    def test_conj_dot(self):
        a = jnp.array([1 + 1j, 2 - 1j], dtype=jnp.complex64)
        b = jnp.array([1 - 1j, 1 + 1j], dtype=jnp.complex64)
        expect = np.vdot(np.asarray(b), np.asarray(a))  # sum a*conj(b)
        assert abs(complex(ops.conj_dot(a, b)) - expect) < 1e-6
