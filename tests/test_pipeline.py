"""End-to-end pipeline tests against the synthetic signal model's ground
truth — the framework analog of the reference's hardware-in-the-loop MATLAB
validation (seqnum_and_correlation.m, phasecorrectionplot.m), as assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coherent_rtlsdr_tpu.pipeline import (
    PipelineConfig,
    align_offline,
    init_state,
    step,
)
from coherent_rtlsdr_tpu.signal import ChannelTruth, make_truth, synth_capture

L = 2048  # small block for CPU test speed; power of two like the reference


def _capture(n_channels=4, n_blocks=12, seed=0, snr_db=30.0, max_delay=40.0,
             block_len=L):
    truth = make_truth(n_channels, seed=seed, max_delay=max_delay, snr_db=snr_db)
    cap = synth_capture(
        jax.random.PRNGKey(seed), truth, n_blocks=n_blocks, block_len=block_len
    )
    return truth, cap


def _phase_err_deg(applied_phase, true_phase):
    """Angular error between the applied correction and the ideal -true_phase."""
    err = np.angle(np.asarray(applied_phase) * np.exp(1j * np.asarray(true_phase)))
    return np.degrees(err)


class TestStreamingStep:
    def test_converges_to_truth(self):
        truth, cap = _capture()
        cfg = PipelineConfig(n_channels=4, block_len=L)
        state = init_state(cfg)
        gate = jnp.array(True)

        jstep = jax.jit(lambda s, a, b: step(cfg, s, a, b, gate))
        for t in range(cap.sig_u8.shape[0]):
            state, out = jstep(state, cap.sig_u8[t], cap.ref_u8[t])

        np.testing.assert_allclose(
            np.asarray(state.delay), truth.delays, atol=0.02
        )
        assert bool(jnp.all(state.synced)), f"residuals {state.lag - state.delay}"
        phase_err = _phase_err_deg(state.phase_c, truth.phases)
        assert np.max(np.abs(phase_err)) < 2.0, phase_err

    def test_aligned_output_is_coherent(self):
        """After convergence the aligned matrix rows must be phase-coherent
        copies of the reference channel (the system's whole purpose)."""
        truth, cap = _capture(n_blocks=16)
        cfg = PipelineConfig(n_channels=4, block_len=L)
        state = init_state(cfg)
        gate = jnp.array(True)
        jstep = jax.jit(lambda s, a, b: step(cfg, s, a, b, gate))
        outs = []
        for t in range(cap.sig_u8.shape[0]):
            state, out = jstep(state, cap.sig_u8[t], cap.ref_u8[t])
            outs.append(out)

        # Use the last block, well after convergence.
        aligned = np.asarray(outs[-1].aligned)   # [N, L]
        ref = np.asarray(outs[-1].ref)           # [L]
        for ch in range(4):
            z = np.sum(aligned[ch] * np.conj(ref))
            rho = np.abs(z) / (
                np.linalg.norm(aligned[ch]) * np.linalg.norm(ref)
            )
            assert rho > 0.95, f"ch{ch} correlation {rho}"
            assert abs(np.degrees(np.angle(z))) < 2.0

    def test_gate_blocks_updates(self):
        """With the reference-noise gate off, calibration state must freeze
        (the reference's refnoise-enabled gating, ccoherent.cc:271-273)."""
        truth, cap = _capture(n_blocks=4)
        cfg = PipelineConfig(n_channels=4, block_len=L)
        state = init_state(cfg)
        gate_off = jnp.array(False)
        jstep = jax.jit(lambda s, a, b: step(cfg, s, a, b, gate_off))
        for t in range(4):
            state, _ = jstep(state, cap.sig_u8[t], cap.ref_u8[t])
        np.testing.assert_array_equal(np.asarray(state.delay), 0.0)
        np.testing.assert_array_equal(np.asarray(state.phase_c), 1.0 + 0j)
        assert not bool(jnp.any(state.synced))

    def test_scan_driver_matches_python_loop(self):
        """lax.scan over blocks (the offline streaming driver) must equal the
        eager python loop — determinism of the functional design."""
        truth, cap = _capture(n_blocks=6)
        cfg = PipelineConfig(n_channels=4, block_len=L)
        gate = jnp.array(True)

        state0 = init_state(cfg)
        state_loop = state0
        jstep = jax.jit(lambda s, a, b: step(cfg, s, a, b, gate))
        for t in range(6):
            state_loop, _ = jstep(state_loop, cap.sig_u8[t], cap.ref_u8[t])

        def scan_fn(s, blk):
            s, out = step(cfg, s, blk[0], blk[1], gate)
            return s, out.telemetry.lag

        state_scan, lags = jax.jit(
            lambda s: jax.lax.scan(scan_fn, s, (cap.sig_u8, cap.ref_u8))
        )(state0)

        np.testing.assert_allclose(
            np.asarray(state_loop.delay), np.asarray(state_scan.delay), atol=1e-5
        )


class TestSkewTracking:
    def test_tracks_clock_skew_drift(self):
        """With residual ppm clock skew the true delay drifts continuously;
        the control loop must track it (the reference's whole reason for a
        continuous feedback thread, ccontrol.cc). 50 ppm at L=2048 drifts
        ~0.1 sample/block — the tracker should stay within a few hundredths
        of the instantaneous true delay once locked."""
        n_blocks = 24
        truth = make_truth(3, seed=6, max_delay=10.0, snr_db=30.0, max_ppm=0.0)
        # Give every channel the same nonzero skew via the dataclass
        import dataclasses

        truth = dataclasses.replace(
            truth, ppm=np.array([50.0, -40.0, 25.0], np.float32)
        )
        cap = synth_capture(
            jax.random.PRNGKey(6), truth, n_blocks=n_blocks, block_len=L
        )
        cfg = PipelineConfig(n_channels=3, block_len=L)
        state = init_state(cfg)
        gate = jnp.array(True)
        jstep = jax.jit(lambda s, a, b: step(cfg, s, a, b, gate))
        errs = []
        for t in range(n_blocks):
            state, out = jstep(state, cap.sig_u8[t], cap.ref_u8[t])
            # The measurement window [t-1, t] is centered at sample t*L, so
            # compare against the true delay there.
            true_now = truth.delays + truth.ppm * 1e-6 * (t * L)
            if t >= 6:  # after lock
                errs.append(np.abs(np.asarray(state.delay) - true_now))
        errs = np.stack(errs)
        # The tanh controller tracks a ramp with a steady-state lag of
        # ~drift_per_block/gain (~0.11 sample at 50 ppm) plus measurement
        # smoothing; what matters is bounded error (no divergence) while
        # the true delay drifts by multiple samples.
        assert errs.max() < 0.35, errs.max()
        assert errs.mean() < 0.15, errs.mean()


class TestOffline:
    @pytest.mark.parametrize("smoothing", ["global", "ema"])
    def test_offline_alignment(self, smoothing):
        truth, cap = _capture(n_blocks=10)
        cfg = PipelineConfig(n_channels=4, block_len=L)
        res = jax.jit(
            lambda s, r: align_offline(cfg, s, r, smoothing=smoothing),
        )(cap.sig_u8, cap.ref_u8)

        # Smoothed delays converge to truth (check the last few blocks).
        tail = np.asarray(res.delay[-3:])
        np.testing.assert_allclose(
            tail, np.broadcast_to(truth.delays, tail.shape), atol=0.05
        )

        # Coherence of the tail blocks.
        aligned = np.asarray(res.aligned[-1])
        ref = np.asarray(res.ref[-1])
        for ch in range(4):
            z = np.sum(aligned[ch] * np.conj(ref))
            rho = np.abs(z) / (np.linalg.norm(aligned[ch]) * np.linalg.norm(ref))
            assert rho > 0.95
            assert abs(np.degrees(np.angle(z))) < 3.0

    def test_global_residual_phase_error_rms(self):
        """The BASELINE.md quality metric: residual inter-channel phase error
        (deg RMS) across blocks after alignment."""
        truth, cap = _capture(n_channels=8, n_blocks=10, snr_db=30.0)
        cfg = PipelineConfig(n_channels=8, block_len=L)
        res = jax.jit(lambda s, r: align_offline(cfg, s, r))(
            cap.sig_u8, cap.ref_u8
        )
        aligned = np.asarray(res.aligned)  # [T', N, L]
        ref = np.asarray(res.ref)          # [T', L]
        z = np.sum(aligned * np.conj(ref)[:, None, :], axis=-1)  # [T', N]
        errs_deg = np.degrees(np.angle(z))
        rms = float(np.sqrt(np.mean(errs_deg**2)))
        assert rms < 2.0, f"residual phase error RMS {rms} deg"

    def test_offline_handles_large_delays(self):
        truth, cap = _capture(n_blocks=8, max_delay=500.0, seed=3)
        cfg = PipelineConfig(n_channels=4, block_len=L)
        res = jax.jit(lambda s, r: align_offline(cfg, s, r))(
            cap.sig_u8, cap.ref_u8
        )
        tail = np.asarray(res.delay[-1])
        np.testing.assert_allclose(tail, truth.delays, atol=0.05)
