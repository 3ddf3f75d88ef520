"""Scan-driver tests: the micro-batched streaming path must match the
one-block-per-call path exactly (same state trajectory, same wire bytes)."""

import jax
import jax.numpy as jnp
import numpy as np

from coherent_rtlsdr_tpu.ops.convert import c64_to_i8_iq
from coherent_rtlsdr_tpu.pipeline import PipelineConfig, init_state, step
from coherent_rtlsdr_tpu.pipeline.drivers import make_scan_runner, run_capture
from coherent_rtlsdr_tpu.signal import make_truth, synth_capture

L = 1024


def _cap(n=3, T=8, seed=0):
    truth = make_truth(n, seed=seed, max_delay=20.0, snr_db=30.0)
    cap = synth_capture(jax.random.PRNGKey(seed), truth, n_blocks=T, block_len=L)
    return truth, cap


class TestScanRunner:
    def test_matches_single_step_trajectory(self):
        truth, cap = _cap()
        cfg = PipelineConfig(n_channels=3, block_len=L)
        gate = jnp.array(True)

        state_a = init_state(cfg)
        wires = []
        jstep = jax.jit(lambda s, a, b: step(cfg, s, a, b, gate))
        for t in range(8):
            state_a, out = jstep(state_a, cap.sig_u8[t], cap.ref_u8[t])
            wires.append(np.asarray(c64_to_i8_iq(out.aligned)))

        state_b, wire_sig, wire_ref, telem = run_capture(
            cfg, init_state(cfg), cap.sig_u8, cap.ref_u8
        )
        np.testing.assert_allclose(
            np.asarray(state_a.delay), np.asarray(state_b.delay), atol=1e-5
        )
        # int8 wire bytes identical modulo +-1 LSB rounding at exact .5
        diff = np.abs(
            np.stack(wires).astype(np.int16) - np.asarray(wire_sig).astype(np.int16)
        )
        assert diff.max() <= 1

    def test_server_scan_depth_equivalence(self):
        """CoherentServer with scan_depth>1 publishes the same frames as the
        single-step server."""
        from tests.test_server import FakeControl, FakePublisher, _server

        srv1, pub1, _, _ = _server(n=3, seed=3)
        srv1.run(max_blocks=8)

        # rebuild identical source/server but with scan_depth=4
        from coherent_rtlsdr_tpu.io.server import CoherentServer
        from coherent_rtlsdr_tpu.signal.sources import SyntheticStreamSource

        truth = make_truth(3, seed=3, max_delay=20.0, snr_db=30.0)
        src = SyntheticStreamSource(truth, block_len=L, slab_blocks=8, seed=3)
        pub2, ctl2 = FakePublisher(), FakeControl()
        srv2 = CoherentServer(
            PipelineConfig(n_channels=3, block_len=L), src,
            publisher=pub2, control=ctl2, scan_depth=4,
        )
        srv2.run(max_blocks=8)

        assert len(pub1.frames) == len(pub2.frames) == 8
        for (iq1, s1, p1), (iq2, s2, p2) in zip(pub1.frames, pub2.frames):
            assert np.abs(iq1.astype(np.int16) - iq2.astype(np.int16)).max() <= 1
            np.testing.assert_array_equal(s1, s2)
            np.testing.assert_allclose(p1, p2, atol=1e-5)


class TestPackedTelemetry:
    def test_pack_matches_pytree(self):
        import jax
        import jax.numpy as jnp

        from coherent_rtlsdr_tpu.pipeline import PipelineConfig, init_state, step
        from coherent_rtlsdr_tpu.pipeline.state import (
            TELEMETRY_COLS,
            pack_telemetry,
        )
        from coherent_rtlsdr_tpu.signal import make_truth, synth_capture

        L = 1024
        truth = make_truth(3, seed=9, max_delay=10.0, snr_db=30.0)
        cap = synth_capture(jax.random.PRNGKey(9), truth, n_blocks=3,
                            block_len=L)
        cfg = PipelineConfig(n_channels=3, block_len=L)
        state = init_state(cfg)
        gate = jnp.array(True)
        for t in range(3):
            state, out = jax.jit(lambda s, a, b: step(cfg, s, a, b, gate))(
                state, cap.sig_u8[t], cap.ref_u8[t]
            )
        tp = np.asarray(pack_telemetry(out.telemetry))
        assert tp.shape == (3, len(TELEMETRY_COLS))
        t = out.telemetry
        expect = {
            "lag": t.lag, "residual": t.residual, "mag": t.mag,
            "papr": t.papr, "rms": t.rms,
            "phase_re": t.phase[:, 0], "phase_im": t.phase[:, 1],
            "synced": t.synced.astype(np.float32),
            "gap": t.gap.astype(np.float32),
            "gaps": t.gaps.astype(np.float32),
        }
        for j, name in enumerate(TELEMETRY_COLS):
            np.testing.assert_allclose(
                tp[:, j], np.asarray(expect[name]), rtol=1e-6, err_msg=name
            )

    def test_scan_runner_pack_telem(self):
        import jax.numpy as jnp

        from coherent_rtlsdr_tpu.pipeline import PipelineConfig, init_state
        from coherent_rtlsdr_tpu.pipeline.drivers import make_scan_runner
        from coherent_rtlsdr_tpu.pipeline.state import TELEMETRY_COLS

        L, N, K = 1024, 2, 4
        cfg = PipelineConfig(n_channels=N, block_len=L)
        rng = np.random.default_rng(1)
        sigs = jnp.asarray(rng.integers(0, 256, (K, N, L, 2), dtype=np.uint8))
        refs = jnp.asarray(rng.integers(0, 256, (K, L, 2), dtype=np.uint8))
        run = make_scan_runner(cfg, pack_telem=True, donate=False)
        _, (ws, wr), tp = run(init_state(cfg), sigs, refs, jnp.array(True))
        assert tp.shape == (K, N, len(TELEMETRY_COLS))
        assert np.isfinite(np.asarray(tp)).all()
