"""Loopback tests for the :5557 phase-drift client (apps/phase_drift.py) —
the phasecorrectionplot.m analog (matlabclient/phasecorrectionplot.m:12-51):
subscribe the debug stream, record per-channel correction phases over time,
report drift, export .npz/.mat."""

import importlib.util
import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _load_app():
    spec = importlib.util.spec_from_file_location(
        "phase_drift", os.path.join(REPO, "apps", "phase_drift.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDriftMath:
    def test_drift_stats_unwrap_and_rms(self):
        app = _load_app()
        t = np.arange(50)
        # ch0 constant, ch1 linear drift crossing the +-pi wrap
        ang = np.stack([np.zeros(50), np.radians(170 + 1.0 * t)], axis=1)
        phases = np.exp(1j * ang).astype(np.complex64)
        deg, rms, peak = app.drift_stats(phases)
        assert deg.shape == (50, 2)
        assert rms[0] < 1e-5
        # unwrapped linear ramp: no 360-jump, RMS of a centered ramp
        ramp = 170 + 1.0 * t
        expect = np.sqrt(((ramp - ramp.mean()) ** 2).mean())
        assert abs(rms[1] - expect) < 1e-3
        assert abs(peak[1] - np.abs(ramp - ramp.mean()).max()) < 1e-3
        assert np.all(np.abs(np.diff(deg[:, 1]) - 1.0) < 1e-3)

    def test_drift_stats_long_recording_float32_accuracy(self):
        """Regression (round-5 soak artifact): over a 30-min recording
        (~120k float32 angles near -112 deg) NumPy's strided axis-0 mean
        accumulated ~0.14 deg of float32 error — dwarfing the true
        ~0.02 deg drift. drift_stats must compute in float64."""
        app = _load_app()
        rng = np.random.default_rng(0)
        T = 120_000
        true_rms = 0.02
        ang = np.stack([
            np.zeros(T),
            np.radians(-112.78 + rng.normal(0.0, true_rms, T)),
        ], axis=1)
        phases = np.exp(1j * ang).astype(np.complex64)
        _, rms, peak = app.drift_stats(phases)
        assert abs(rms[1] - true_rms) < 0.005, rms
        assert peak[1] < 0.2

    def test_ascii_plot_renders(self):
        app = _load_app()
        t = np.linspace(0, 10, 30)
        deg = np.stack([np.sin(t) * 20, t * 3.0], axis=1)
        s = app.ascii_plot(t, deg)
        assert "deg" in s and "0" in s and "1" in s


class TestLoopback:
    def test_collect_receives_published_debug_frames(self):
        zmq = pytest.importorskip("zmq")
        from coherent_rtlsdr_tpu.io.wire import pack_debug

        app = _load_app()
        port = 18710
        ctx = zmq.Context.instance()
        pub = ctx.socket(zmq.PUB)
        pub.bind(f"tcp://127.0.0.1:{port}")
        stop = threading.Event()
        sent = []

        def feeder():
            k = 0
            while not stop.is_set():
                ph = np.exp(1j * np.array([0.0, 0.01 * k, -0.02 * k]))
                pub.send(pack_debug(ph))
                sent.append(ph)
                k += 1
                time.sleep(0.005)

        th = threading.Thread(target=feeder, daemon=True)
        th.start()
        try:
            phases, t = app.collect(
                f"tcp://127.0.0.1:{port}", frames=20, timeout_ms=5000
            )
        finally:
            stop.set()
            th.join()
            pub.close(0)
        assert phases.shape == (20, 3)
        assert len(t) == 20 and t[-1] >= t[0]
        # received factors are a contiguous run of what was sent
        mags = np.abs(phases)
        assert np.allclose(mags, 1.0, atol=1e-6)
        deg, rms, peak = app.drift_stats(phases)
        assert rms[0] < 1e-4  # reference channel is flat
        assert rms[2] > rms[1] > 0  # ch2 drifts twice as fast as ch1

    def test_app_subprocess_end_to_end_with_npz(self, tmp_path):
        zmq = pytest.importorskip("zmq")
        from coherent_rtlsdr_tpu.io.wire import pack_debug

        port = 18711
        npz = str(tmp_path / "drift.npz")
        ctx = zmq.Context.instance()
        pub = ctx.socket(zmq.PUB)
        pub.bind(f"tcp://127.0.0.1:{port}")
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "apps", "phase_drift.py"),
             "-a", f"tcp://127.0.0.1:{port}", "--frames", "15",
             "--npz", npz, "--plot"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO,
        )
        try:
            k = 0
            while proc.poll() is None and k < 4000:
                ph = np.exp(1j * np.radians([0.0, 5.0 + 0.1 * k])).astype(
                    np.complex64
                )
                pub.send(pack_debug(ph))
                k += 1
                time.sleep(0.005)
            out, err = proc.communicate(timeout=60)
        finally:
            pub.close(0)
            if proc.poll() is None:
                proc.kill()
                proc.communicate()
        assert proc.returncode == 0, (out, err)
        assert "15 frames x 2 channels" in out
        assert "drift" in out and "worst signal channel: ch1" in out
        z = np.load(npz)
        assert z["phases"].shape == (15, 2)
        assert z["phase_deg"].shape == (15, 2)
        assert z["t"].shape == (15,)
