"""Hardware-free tests of the native librtlsdr capture path.

A mock librtlsdr (tests/data/mock_librtlsdr.c) is compiled at test time and
dlopen'd by the native runtime; it logs every ABI call so these tests can
assert the reference's ORDER-SENSITIVE open sequence — sample rate ->
dithering OFF (must precede tuning, src/crtlsdr.cc:121) -> center freq ->
AGC -> tuner gain mode/gain -> zero freq correction (src/crtlsdr.cc:112-135)
— plus enumeration by serial (crtlsdr.cc:70-106), the barrier-released
multi-dongle capture into assembled ring blocks, retune semantics
(crtlsdr.cc:142-146), and the resampler-skew actuator (ccontrol.cc:78-123).
"""

import os
import subprocess
import time

import numpy as np
import pytest

from coherent_rtlsdr_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)

HERE = os.path.dirname(os.path.abspath(__file__))
MOCK_SRC = os.path.join(HERE, "data", "mock_librtlsdr.c")

L = 64  # complex samples per channel-block
CHAN_BYTES = 2 * L


@pytest.fixture(scope="module")
def mock_lib(tmp_path_factory):
    d = tmp_path_factory.mktemp("mockrtl")
    so = str(d / "libmock_rtlsdr.so")
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", "-o", so, MOCK_SRC], check=True
    )
    assert native.rtlsdr_load(so), "mock librtlsdr failed to load"
    return so


@pytest.fixture()
def call_log(tmp_path, mock_lib):
    log = str(tmp_path / "calls.log")
    os.environ["MOCK_RTLSDR_LOG"] = log
    yield log
    os.environ.pop("MOCK_RTLSDR_LOG", None)


def _parse(log):
    """-> list of (devidx, fn, arg) in call order."""
    out = []
    if not os.path.exists(log):
        return out
    with open(log) as f:
        for ln in f:
            idx, fn, arg = ln.split()
            out.append((int(idx), fn, int(arg)))
    return out


def _calls_for(entries, idx):
    return [(fn, arg) for i, fn, arg in entries if i == idx]


def _pattern(idx, offset, n):
    j = np.arange(offset, offset + n, dtype=np.uint64)
    return ((idx * 37 + (j & 0x7F)) & 0xFF).astype(np.uint8)


def _start(ring, serials, **kw):
    kw.setdefault("block_len", L)
    kw.setdefault("fs", 2.048e6)
    kw.setdefault("fcenter", 1024e6)
    return native.NativeRtlCapture(ring, serials, **kw)


class TestEnumeration:
    def test_available_and_serials(self, mock_lib):
        assert native.rtlsdr_available()
        serials = native.rtlsdr_enumerate()
        assert serials == ["MOCKREF0", "MOCK0001", "MOCK0002", "MOCK0003"]


class TestOpenSequence:
    def test_reference_open_order_per_device(self, call_log):
        ring = native.NativeBlockRing(64, 3 * CHAN_BYTES)
        cap = _start(ring, ["MOCKREF0", "MOCK0001", "MOCK0002"],
                     gain_db=49.6, ref_gain_db=32.8)
        try:
            deadline = time.time() + 10
            while cap.pushed < 2 and time.time() < deadline:
                time.sleep(0.01)
            assert cap.pushed >= 2, "no blocks assembled"
            assert cap.error == 0
        finally:
            cap.stop()
        entries = _parse(call_log)
        for idx in (0, 1, 2):
            calls = _calls_for(entries, idx)
            fns = [fn for fn, _ in calls]
            # The reference's exact order, src/crtlsdr.cc:112-135 + 44-59.
            expect = ["open", "set_sample_rate", "set_dithering",
                      "set_center_freq", "set_agc_mode",
                      "set_tuner_gain_mode", "set_tuner_gain",
                      "set_sample_freq_correction_f", "reset_buffer",
                      "read_async"]
            got = [f for f in fns if f in set(expect)]
            assert got[: len(expect)] == expect, (idx, fns)
            # The hardware-critical constraint, spelled out:
            assert fns.index("set_dithering") < fns.index("set_center_freq")
            # Configured values land on the right device.
            args = dict(calls)
            assert args["set_sample_rate"] == 2048000
            assert args["set_center_freq"] == 1024000000
            assert args["set_tuner_gain_mode"] == 1
            assert args["set_tuner_gain"] == (328 if idx == 0 else 496)
            assert args["set_sample_freq_correction_f"] == 0

    def test_capture_stop_cancels_and_closes(self, call_log):
        ring = native.NativeBlockRing(64, 2 * CHAN_BYTES)
        cap = _start(ring, ["MOCKREF0", "MOCK0003"])
        deadline = time.time() + 10
        while cap.pushed < 1 and time.time() < deadline:
            time.sleep(0.01)
        cap.stop()
        assert not cap.running
        entries = _parse(call_log)
        for idx in (0, 3):
            fns = [fn for fn, _ in _calls_for(entries, idx)]
            assert "cancel_async" in fns
            assert "close" in fns
            assert fns.index("cancel_async") < fns.index("close")


class TestAssembledBlocks:
    def test_ring_block_layout_ref_first(self, call_log):
        serials = ["MOCKREF0", "MOCK0002", "MOCK0001"]  # deliberate disorder
        ring = native.NativeBlockRing(64, 3 * CHAN_BYTES)
        cap = _start(ring, serials)
        try:
            out = ring.pop(timeout_ms=10000)
            assert out is not None
            buf, seq, ts = out
            assert seq == 1 and cap.dropped == 0
            frame = buf.reshape(3, CHAN_BYTES)
            # channel order follows the serial list (ref first), each
            # channel carrying its own device's deterministic pattern
            for slot, serial in enumerate(serials):
                idx = int(serial[-1]) if serial[-1].isdigit() else 0
                np.testing.assert_array_equal(
                    frame[slot], _pattern(idx, 0, CHAN_BYTES), err_msg=serial
                )
            # seqnums advance with later blocks
            out2 = ring.pop(timeout_ms=10000)
            assert out2 is not None and out2[1] == 2
        finally:
            cap.stop()

    def test_ring_source_consumes_capture(self, call_log):
        from coherent_rtlsdr_tpu.signal.sources import RingSource

        n_sig = 2
        ring = native.NativeBlockRing(64, (n_sig + 1) * CHAN_BYTES)
        cap = _start(ring, ["MOCKREF0", "MOCK0001", "MOCK0002"])
        try:
            src = RingSource(ring, n_channels=n_sig, block_len=L,
                             timeout_ms=10000)
            blk = src.next_block()
            assert blk is not None
            sig, ref, seqs = blk
            assert sig.shape == (n_sig, L, 2) and ref.shape == (L, 2)
            assert sig.dtype == np.uint8
            assert (seqs > 0).all()
        finally:
            cap.stop()


class TestRuntimeControl:
    def test_retune_disables_dithering_first(self, call_log):
        ring = native.NativeBlockRing(64, 2 * CHAN_BYTES)
        cap = _start(ring, ["MOCKREF0", "MOCK0001"])
        try:
            deadline = time.time() + 10
            while cap.pushed < 1 and time.time() < deadline:
                time.sleep(0.01)
            mark = len(_parse(call_log))
            assert cap.set_fcenter(868e6) == 0
            entries = _parse(call_log)[mark:]
            for idx in (0, 1):
                fns = [fn for fn, _ in _calls_for(entries, idx)]
                assert fns.index("set_dithering") < fns.index("set_center_freq")
                args = dict(_calls_for(entries, idx))
                assert args["set_center_freq"] == 868000000
        finally:
            cap.stop()

    def test_set_correction_targets_one_device(self, call_log):
        ring = native.NativeBlockRing(64, 3 * CHAN_BYTES)
        cap = _start(ring, ["MOCKREF0", "MOCK0001", "MOCK0002"])
        try:
            deadline = time.time() + 10
            while cap.pushed < 1 and time.time() < deadline:
                time.sleep(0.01)
            mark = len(_parse(call_log))
            assert cap.set_correction_f(2, 3.5e-4) == 0  # -> MOCK0002
            entries = _parse(call_log)[mark:]
            hits = [(i, a) for i, fn, a in entries
                    if fn == "set_sample_freq_correction_f"]
            assert hits == [(2, 350000)]  # 3.5e-4 in nano-units
        finally:
            cap.stop()


class TestServerIntegration:
    def test_server_source_rtlsdr_publishes_frames(self, mock_lib, tmp_path):
        """--source rtlsdr end-to-end: mock dongles -> native capture ->
        ring -> jitted pipeline -> wire frames a stock client can parse."""
        import subprocess
        import sys

        zmq = pytest.importorskip("zmq")
        from coherent_rtlsdr_tpu.io.wire import unpack_frame

        repo = os.path.dirname(HERE)
        port = 18660
        env = dict(os.environ, COHERENT_LIBRTLSDR=mock_lib)
        env.pop("MOCK_RTLSDR_LOG", None)
        # stderr must go to a FILE, not an unread pipe: XLA's multi-KB
        # warnings fill the pipe and block the server before it publishes.
        errf = open(str(tmp_path / "server.err"), "w+")
        proc = subprocess.Popen(
            [sys.executable, os.path.join(repo, "apps", "coherent_server.py"),
             "--cpu", "--source", "rtlsdr", "--rtl-lib", mock_lib,
             "--serials", "MOCKREF0,MOCK0001,MOCK0002",
             "-n", "2", "-b", "256", "--blocks", "1000",
             "-A", f"tcp://127.0.0.1:{port}",
             "--ctrl-address", f"tcp://127.0.0.1:{port + 1}",
             "--debug-address", f"tcp://127.0.0.1:{port + 2}"],
            stdout=subprocess.PIPE, stderr=errf, text=True,
            cwd=repo, env=env,
        )
        got = None
        try:
            ctx = zmq.Context()
            sub = ctx.socket(zmq.SUB)
            sub.setsockopt(zmq.SUBSCRIBE, b"")
            sub.setsockopt(zmq.RCVTIMEO, 1000)
            sub.connect(f"tcp://127.0.0.1:{port}")
            deadline = time.time() + 120
            while got is None and time.time() < deadline:
                if proc.poll() is not None:
                    break
                try:
                    got = sub.recv()
                except zmq.Again:
                    continue
            sub.close(0)
            ctx.term()
        finally:
            proc.terminate()
            out = ""
            try:
                out = proc.communicate(timeout=120)[0]
            except subprocess.TimeoutExpired:
                proc.kill()
                out = proc.communicate()[0]
            errf.seek(0)
            err = errf.read()
            errf.close()
        assert got is not None, (out[-1500:], err[-1500:])
        frame = unpack_frame(got)
        # ref is wire channel 0 like the reference (ccoherent.cc:253)
        assert frame.iq.shape == (3, 256, 2)
        assert frame.seqnums.shape == (3,)


class TestServerFlags:
    def test_refserial_flag_reorders_and_sets_ref_gain(self, mock_lib,
                                                       tmp_path):
        """-I picks the reference dongle (main.cc:139-141): that serial
        becomes channel 0 and receives the -r gain; others get -g."""
        import subprocess
        import sys

        repo = os.path.dirname(HERE)
        log = str(tmp_path / "flags.log")
        env = dict(os.environ, MOCK_RTLSDR_LOG=log)
        errf = open(str(tmp_path / "server.err"), "w")
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "apps", "coherent_server.py"),
             "--cpu", "--source", "rtlsdr", "--rtl-lib", mock_lib,
             "--serials", "MOCKREF0,MOCK0001,MOCK0002",
             "-I", "MOCK0001", "-g", "40", "-r", "30",
             "-n", "2", "-b", "256", "--blocks", "4",
             "-A", "tcp://127.0.0.1:18670",
             "--ctrl-address", "tcp://127.0.0.1:18671",
             "--debug-address", "tcp://127.0.0.1:18672"],
            stdout=subprocess.PIPE, stderr=errf, text=True, timeout=300,
            cwd=repo, env=env,
        )
        errf.close()
        assert r.returncode == 0, r.stdout[-1500:]
        gains = {i: a for i, fn, a in _parse(log) if fn == "set_tuner_gain"}
        # MOCK0001 (idx 1) is the reference -> -r 30 dB = 300 tenths;
        # the others are signal channels -> -g 40 dB = 400 tenths.
        assert gains == {1: 300, 0: 400, 2: 400}

    def test_config_per_channel_gains_reach_dongles(self, mock_lib,
                                                    tmp_path):
        """Config-file `gain=` values (the reference's future-work item,
        examplecfg/four.cfg:4) land on the matching dongles; channels
        without one use the CLI default."""
        import subprocess
        import sys

        repo = os.path.dirname(HERE)
        cfgf = str(tmp_path / "arr.cfg")
        with open(cfgf, "w") as f:
            f.write("R :'MOCKREF0' gain=32.5\n"
                    "1 :'MOCK0001'\n"
                    "2 :'MOCK0002' gain=21\n")
        log = str(tmp_path / "gains.log")
        env = dict(os.environ, MOCK_RTLSDR_LOG=log)
        errf = open(str(tmp_path / "server.err"), "w")
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "apps", "coherent_server.py"),
             "--cpu", "--source", "rtlsdr", "--rtl-lib", mock_lib,
             "-C", cfgf, "-g", "44", "-r", "33",
             "-b", "256", "--blocks", "4",
             "-A", "tcp://127.0.0.1:18690",
             "--ctrl-address", "tcp://127.0.0.1:18691",
             "--debug-address", "tcp://127.0.0.1:18692"],
            stdout=subprocess.PIPE, stderr=errf, text=True, timeout=300,
            cwd=repo, env=env,
        )
        errf.close()
        assert r.returncode == 0, r.stdout[-1500:]
        gains = {i: a for i, fn, a in _parse(log) if fn == "set_tuner_gain"}
        # ref (idx 0): config 32.5 dB; MOCK0001: CLI -g 44; MOCK0002: 21
        assert gains == {0: 325, 1: 440, 2: 210}

    def test_quiet_flag_routes_stderr_to_log_drain(self, tmp_path):
        """-q: OS-level stderr lands in the console `log` drain
        (main.cc:63-70 + console.cc:422-427 analog)."""
        import subprocess
        import sys

        zmq = pytest.importorskip("zmq")
        repo = os.path.dirname(HERE)
        port = 18675
        proc = subprocess.Popen(
            [sys.executable, os.path.join(repo, "apps", "coherent_server.py"),
             "--cpu", "-q", "-n", "2", "-b", "256", "--blocks", "3000",
             "-A", f"tcp://127.0.0.1:{port}",
             "--ctrl-address", f"tcp://127.0.0.1:{port + 1}",
             "--debug-address", f"tcp://127.0.0.1:{port + 2}"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=repo,
        )
        try:
            ctx = zmq.Context()
            dealer = ctx.socket(zmq.DEALER)
            dealer.setsockopt(zmq.RCVTIMEO, 5000)
            dealer.connect(f"tcp://127.0.0.1:{port + 1}")
            # XLA emits startup warnings on fd 2; with -q they end up in the
            # drain. Poll `log` until something captured arrives.
            got = ""
            deadline = time.time() + 120
            while time.time() < deadline:
                dealer.send(b"log")
                try:
                    got = dealer.recv().decode()
                except zmq.Again:
                    continue
                if got.strip() and got.strip() != "(empty)":
                    break
                time.sleep(0.5)
            dealer.send(b"quit")
            dealer.close(0)
            ctx.term()
        finally:
            proc.terminate()
            try:
                proc.communicate(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.communicate()
        assert got.strip() and got.strip() != "(empty)"


class TestHwDriftRelief:
    """The ccontrol actuator (ccontrol.cc:78-123) driven from numerical
    delays — law, dwell, restore, and the real C actuator path."""

    def test_tanh_pulse_and_deadline_restore(self):
        from coherent_rtlsdr_tpu.io import hwcontrol

        class FakeCap:
            def __init__(self):
                self.calls = []

            def set_correction_f(self, ch, p):
                self.calls.append((ch, p))
                return 0

        cap = FakeCap()
        r = hwcontrol.HwDriftRelief(cap, fs=2.048e6, threshold=8.0)
        # below threshold: no actuation
        assert r.tick([0.0, 5.0, -7.9], now=0.0) == 0
        assert cap.calls == []
        # ch 1 over threshold: pulse with the reference law on dongle 2
        assert r.tick([0.0, 50.0, 0.0], now=0.0) == 1
        (ch, p), = cap.calls
        assert ch == 2
        expect = hwcontrol.MAX_CORR * np.tanh(50.0 / hwcontrol.SCALE)
        assert abs(p - expect) < 1e-9
        assert r.active == [1]
        # mid-dwell: no re-pulse even though delay still high
        dwell = hwcontrol.FRAC_T * abs(50.0 / (expect * 2.048e6))
        assert r.tick([0.0, 50.0, 0.0], now=dwell * 0.5) == 0
        # past the dwell deadline: restore 0.0 (and delay now small -> done)
        assert r.tick([0.0, 1.0, 0.0], now=dwell + 1e-3) == 1
        assert cap.calls[-1] == (2, 0.0)
        assert r.active == []
        assert r.pulses == 1 and r.failures == 0

    def test_negative_delay_negative_correction_and_stop(self):
        from coherent_rtlsdr_tpu.io import hwcontrol

        class FakeCap:
            def __init__(self):
                self.calls = []

            def set_correction_f(self, ch, p):
                self.calls.append((ch, p))
                return 0

        cap = FakeCap()
        r = hwcontrol.HwDriftRelief(cap, fs=1e6, threshold=8.0)
        r.tick([-40.0], now=0.0)
        assert cap.calls[0][0] == 1 and cap.calls[0][1] < 0
        r.stop()
        assert cap.calls[-1] == (1, 0.0)
        assert r.active == []

    def test_actuates_real_capture_path(self, call_log):
        """End-to-end through the C actuator: the mock logs the tanh value
        in nano-units on the right dongle, then the restore."""
        from coherent_rtlsdr_tpu.io import hwcontrol

        ring = native.NativeBlockRing(64, 3 * CHAN_BYTES)
        cap = _start(ring, ["MOCKREF0", "MOCK0001", "MOCK0002"])
        try:
            deadline = time.time() + 10
            while cap.pushed < 1 and time.time() < deadline:
                time.sleep(0.01)
            mark = len(_parse(call_log))
            r = hwcontrol.HwDriftRelief(cap, fs=2.048e6, threshold=8.0)
            r.tick([0.0, 100.0], now=0.0)   # signal ch 1 -> dongle MOCK0002
            r.tick([0.0, 0.0], now=1e9)     # force restore
            entries = _parse(call_log)[mark:]
            hits = [(i, a) for i, fn, a in entries
                    if fn == "set_sample_freq_correction_f"]
            expect = hwcontrol.MAX_CORR * np.tanh(1.0)
            assert len(hits) == 2
            assert hits[0][0] == 2 and abs(hits[0][1] - expect * 1e9) < 1e3
            assert hits[1] == (2, 0)
        finally:
            cap.stop()


class TestConsoleInventory:
    def test_list_all_shows_usb_inventory(self, mock_lib):
        """console `list all` appends the full dongle inventory when
        librtlsdr is loaded (console.cc:203-223 parity)."""
        from coherent_rtlsdr_tpu.io.server import CoherentServer
        from coherent_rtlsdr_tpu.pipeline import PipelineConfig
        from coherent_rtlsdr_tpu.signal import make_truth
        from coherent_rtlsdr_tpu.signal.sources import SyntheticStreamSource

        class FakePub:
            def publish(self, *a, **k):
                return 0

            def close(self):
                pass

        class FakeCtl:
            def poll(self, cb):
                pass

        truth = make_truth(2, seed=0, max_delay=10.0, snr_db=30.0)
        src = SyntheticStreamSource(truth, block_len=256, seed=0)
        srv = CoherentServer(
            PipelineConfig(n_channels=2, block_len=256), src,
            publisher=FakePub(), control=FakeCtl(),
        )
        out = srv.list_channels(all=True)
        assert "USB inventory (4 dongles)" in out
        assert "'MOCKREF0'" in out and "'MOCK0003'" in out


def _pattern_ok(chan_bytes_row, dev_idx, seq):
    """True iff a channel row carries exactly the mock device's capture
    block `seq` (1-based) — the data/seqnum consistency invariant."""
    return np.array_equal(
        chan_bytes_row, _pattern(dev_idx, (seq - 1) * CHAN_BYTES, CHAN_BYTES)
    )


class TestPerChannelSeqnums:
    """Per-device capture seqnums through the native ring — the reference's
    per-device readcnt (src/crtlsdr.cc:181-188, cpacketizer.cc:142): one
    dongle's FIFO drop gaps exactly that channel, and every channel's bytes
    always correspond to its own seqnum (no silent skew)."""

    def test_fast_device_gaps_only_its_channel(self, call_log):
        os.environ["MOCK_RTLSDR_FAST"] = "2"  # MOCK0002 streams 10x faster
        try:
            ring = native.NativeBlockRing(64, 3 * CHAN_BYTES, n_seq=3)
            # small FIFO (4 chan-blocks) so the rate mismatch overflows it
            # deterministically even under CI scheduling jitter
            cap = _start(ring, ["MOCKREF0", "MOCK0001", "MOCK0002"],
                         asyncbufn=2)
            frames = []
            try:
                # collect until the fast channel has shown a drop gap (or
                # the deadline): under full-suite CPU contention the 10x
                # rate mismatch can take more than 40 frames to overflow
                # the 4-block FIFO (observed flake, round 5)
                deadline = time.time() + 60
                while time.time() < deadline:
                    out = ring.pop_n(timeout_ms=5000)
                    if out is not None:
                        frames.append(out)
                    if len(frames) >= 40 and any(
                        int(b[1][2]) - int(a[1][2]) > 1
                        for a, b in zip(frames, frames[1:])
                    ):
                        break
            finally:
                dropped = cap.dropped
                cap.stop()
        finally:
            os.environ.pop("MOCK_RTLSDR_FAST", None)
        assert len(frames) >= 40
        seqs = np.array([f[1] for f in frames])  # [T, 3] uint64
        # ref + slow channel: contiguous capture order
        for t in (0, 1):
            assert (np.diff(seqs[:, t]) == 1).all(), seqs[:, t]
        # fast channel: strictly increasing WITH at least one drop gap
        d2 = np.diff(seqs[:, 2].astype(np.int64))
        assert (d2 >= 1).all()
        assert (d2 > 1).any(), "fast channel's FIFO never overflowed"
        assert dropped > 0
        # data/seqnum consistency on every channel of every frame
        for buf, s, _ts in frames:
            frame = buf.reshape(3, CHAN_BYTES)
            for slot, idx in ((0, 0), (1, 1), (2, 2)):
                assert _pattern_ok(frame[slot], idx, int(s[slot])), (
                    slot, int(s[slot]))

    def test_stalled_device_never_skews_others(self, call_log):
        """A device going silent for 500 ms abandons frames (two-pass
        assembly) instead of silently consuming the healthy channels —
        afterwards every channel's bytes still match its seqnum."""
        os.environ["MOCK_RTLSDR_STALL"] = "1"  # MOCK0001 stalls at block 6
        try:
            ring = native.NativeBlockRing(256, 3 * CHAN_BYTES, n_seq=3)
            cap = _start(ring, ["MOCKREF0", "MOCK0001", "MOCK0002"])
            frames = []
            try:
                deadline = time.time() + 30
                while len(frames) < 30 and time.time() < deadline:
                    out = ring.pop_n(timeout_ms=5000)
                    if out is not None:
                        frames.append(out)
                stalls = cap.stalls
            finally:
                cap.stop()
        finally:
            os.environ.pop("MOCK_RTLSDR_STALL", None)
        assert len(frames) >= 30
        assert stalls >= 1, "500 ms stall never abandoned a frame"
        for buf, s, _ts in frames:
            frame = buf.reshape(3, CHAN_BYTES)
            for slot in (0, 1, 2):
                assert _pattern_ok(frame[slot], slot, int(s[slot])), (
                    slot, int(s[slot]))
        seqs = np.array([f[1] for f in frames]).astype(np.int64)
        assert (np.diff(seqs, axis=0) >= 1).all()

    def test_usb_death_reports_not_running(self, call_log):
        """read_async returning on its own (USB death) must flip
        `running` to False once every device thread has exited."""
        os.environ["MOCK_RTLSDR_DIE_AFTER"] = "3"
        try:
            ring = native.NativeBlockRing(64, 2 * CHAN_BYTES, n_seq=2)
            cap = _start(ring, ["MOCKREF0", "MOCK0001"])
            try:
                deadline = time.time() + 10
                while cap.running and time.time() < deadline:
                    time.sleep(0.02)
                assert not cap.running, "dead capture still reports running"
            finally:
                cap.stop()
        finally:
            os.environ.pop("MOCK_RTLSDR_DIE_AFTER", None)


class TestHotPlug:
    """Native add/del of a RUNNING capture (console.cc:225-270 semantics)."""

    def test_set_fs_reaches_all_dongles(self, call_log):
        ring = native.NativeBlockRing(64, 2 * CHAN_BYTES, n_seq=2)
        cap = _start(ring, ["MOCKREF0", "MOCK0001"])
        try:
            deadline = time.time() + 10
            while cap.pushed < 1 and time.time() < deadline:
                time.sleep(0.01)
            mark = len(_parse(call_log))
            assert cap.set_fs(1.024e6) == 0
            entries = _parse(call_log)[mark:]
            for idx in (0, 1):
                args = dict(_calls_for(entries, idx))
                assert args["set_sample_rate"] == 1024000
        finally:
            cap.stop()

    def test_hot_add_streams_and_remove_shifts(self, call_log):
        ring = native.NativeBlockRing(64, 4 * CHAN_BYTES, n_seq=4)
        cap = _start(ring, ["MOCKREF0", "MOCK0001"])
        try:
            # before the add: slots 2..3 are u8-zero padding with seq 0
            out = ring.pop_n(timeout_ms=10000)
            assert out is not None
            buf, seqs, _ = out
            frame = buf.reshape(4, CHAN_BYTES)
            assert (frame[2] == 0x80).all() and (frame[3] == 0x80).all()
            assert seqs[2] == 0 and seqs[3] == 0

            idx = cap.add("MOCK0002", gain_db=21.0)
            assert idx == 2
            assert cap.capture_serials() == ["MOCKREF0", "MOCK0001",
                                             "MOCK0002"]
            entries = _parse(call_log)
            args = dict(_calls_for(entries, 2))
            fns = [fn for fn, _ in _calls_for(entries, 2)]
            # full order-sensitive open sequence ran on the new dongle
            assert fns.index("set_dithering") < fns.index("set_center_freq")
            assert args["set_tuner_gain"] == 210
            # its channel starts streaming its own pattern with seq from 1
            deadline = time.time() + 10
            got = None
            while got is None and time.time() < deadline:
                out = ring.pop_n(timeout_ms=5000)
                if out is None:
                    continue
                buf, seqs, _ = out
                if seqs[2] >= 1:
                    got = (buf.reshape(4, CHAN_BYTES), seqs)
            assert got is not None, "hot-added channel never streamed"
            frame, seqs = got
            assert _pattern_ok(frame[2], 2, int(seqs[2]))

            # remove the MIDDLE device: remaining channels shift down a slot
            mark = len(_parse(call_log))
            assert cap.remove("MOCK0001") == 1
            assert cap.capture_serials() == ["MOCKREF0", "MOCK0002"]
            fns = [fn for fn, _ in _calls_for(_parse(call_log)[mark:], 1)]
            assert "cancel_async" in fns and "close" in fns
            deadline = time.time() + 10
            shifted = False
            while not shifted and time.time() < deadline:
                out = ring.pop_n(timeout_ms=5000)
                if out is None:
                    continue
                buf, seqs, _ = out
                frame = buf.reshape(4, CHAN_BYTES)
                if _pattern_ok(frame[1], 2, int(seqs[1])):
                    shifted = True  # MOCK0002 now occupies slot 1
                    assert (frame[2] == 0x80).all()
            assert shifted
        finally:
            cap.stop()

    def test_add_unknown_serial_fails_cleanly(self, call_log):
        ring = native.NativeBlockRing(64, 3 * CHAN_BYTES, n_seq=3)
        cap = _start(ring, ["MOCKREF0", "MOCK0001"])
        try:
            deadline = time.time() + 10
            while cap.pushed < 1 and time.time() < deadline:
                time.sleep(0.01)
            assert cap.add("NO_SUCH") < 0
            assert cap.capture_serials() == ["MOCKREF0", "MOCK0001"]
            # capture keeps streaming
            before = cap.pushed
            deadline = time.time() + 10
            while cap.pushed <= before and time.time() < deadline:
                time.sleep(0.01)
            assert cap.pushed > before
        finally:
            cap.stop()


class TestConsoleToHardware:
    """The console's runtime mutations reach the real dongles through the
    RtlSource adapter — remote `fcenter`/`fs`/`add`/`del` produce the right
    librtlsdr calls on the right devices (console.cc:156-270)."""

    @pytest.fixture()
    def server(self, call_log):
        from coherent_rtlsdr_tpu.io.server import CoherentServer
        from coherent_rtlsdr_tpu.pipeline import PipelineConfig
        from coherent_rtlsdr_tpu.signal.sources import RtlSource

        class FakePub:
            def publish(self, *a, **k):
                return 0

            def close(self):
                pass

        class FakeCtl:
            def poll(self, cb):
                pass

        src = RtlSource.start(
            ["MOCKREF0", "MOCK0001", "MOCK0002"], block_len=L,
            max_channels=3, fs=2.048e6, fcenter=1024e6,
        )
        srv = CoherentServer(
            PipelineConfig(n_channels=2, block_len=L), src,
            publisher=FakePub(), control=FakeCtl(), max_channels=3,
        )
        deadline = time.time() + 10
        while src.capture.pushed < 1 and time.time() < deadline:
            time.sleep(0.01)
        yield srv
        src.stop()

    def test_remote_fcenter_retunes_every_dongle(self, server, call_log):
        mark = len(_parse(call_log))
        out = server.dispatcher.dispatch("fcenter 868000000")
        assert out == "fcenter set to 868000000"
        assert server.fcenter == 868000000
        entries = _parse(call_log)[mark:]
        for idx in (0, 1, 2):
            fns = [fn for fn, _ in _calls_for(entries, idx)]
            assert fns.index("set_dithering") < fns.index("set_center_freq")
            assert dict(_calls_for(entries, idx))["set_center_freq"] == 868000000

    def test_remote_fs_sets_rate_and_resyncs(self, server, call_log):
        mark = len(_parse(call_log))
        out = server.dispatcher.dispatch("fs 1024000")
        assert out == "fs set to 1024000"
        entries = _parse(call_log)[mark:]
        for idx in (0, 1, 2):
            assert dict(_calls_for(entries, idx))["set_sample_rate"] == 1024000
        assert server._resync_requested  # fs change forces resync
        assert server.fs == 1024000

    def test_remote_add_del_hotplug_real_dongles(self, server, call_log):
        mark = len(_parse(call_log))
        out = server.dispatcher.dispatch("add MOCK0003")
        assert out == "added 'MOCK0003' as channel 3"
        assert server.n_active == 3
        assert server.source.serials == ["MOCK0001", "MOCK0002", "MOCK0003"]
        fns = [fn for fn, _ in _calls_for(_parse(call_log)[mark:], 3)]
        assert "open" in fns and "read_async" in fns
        assert fns.index("set_dithering") < fns.index("set_center_freq")

        mark = len(_parse(call_log))
        out = server.dispatcher.dispatch("del MOCK0001")
        assert out == "deleted 'MOCK0001'"
        assert server.n_active == 2
        assert server.source.serials == ["MOCK0002", "MOCK0003"]
        fns = [fn for fn, _ in _calls_for(_parse(call_log)[mark:], 1)]
        assert "cancel_async" in fns and "close" in fns

    def test_status_shows_capture_health(self, server, call_log):
        out = server.dispatcher.dispatch("status")
        assert "capture: RUNNING" in out
        assert "chan-drops" in out and "stalls" in out

    def test_del_reference_refused(self, server, call_log):
        out = server.dispatcher.dispatch("del MOCKREF0")
        assert "no such channel" in out
        assert server.source.capture.capture_serials()[0] == "MOCKREF0"

    def test_add_bad_serial_reports_failure(self, server, call_log):
        out = server.dispatcher.dispatch("add GHOST")
        assert "failed" in out
        assert server.n_active == 2

    def test_add_duplicate_serial_refused_keeps_capture_alive(
        self, server, call_log
    ):
        """Adding an already-capturing serial must be rejected WITHOUT
        touching the healthy device (a serial-keyed cleanup would cancel
        it and leave a zombie stalling every frame)."""
        out = server.dispatcher.dispatch("add MOCK0001")
        assert "failed" in out
        assert server.n_active == 2
        cap = server.source.capture
        assert cap.capture_serials() == ["MOCKREF0", "MOCK0001", "MOCK0002"]
        before = cap.pushed
        deadline = time.time() + 10
        while cap.pushed <= before and time.time() < deadline:
            time.sleep(0.01)
        assert cap.pushed > before, "capture stalled after duplicate add"

    def test_fs_failure_reports_and_restores(self, server, call_log):
        """A dongle refusing the new rate: console reports FAILURE, the
        server keeps the old fs, and every healthy dongle is put back on
        the old rate (no silent mixed-rate array)."""
        os.environ["MOCK_RTLSDR_FAIL_FS"] = "1"  # MOCK0001 refuses
        try:
            mark = len(_parse(call_log))
            out = server.dispatcher.dispatch("fs 1024000")
            assert "FAILED" in out and "2048000" in out
            assert server.fs == 2.048e6
            entries = _parse(call_log)[mark:]
            # healthy dongles saw the attempt AND the restore
            for idx in (0, 2):
                rates = [a for fn, a in _calls_for(entries, idx)
                         if fn == "set_sample_rate"]
                assert rates == [1024000, 2048000], (idx, rates)
        finally:
            os.environ.pop("MOCK_RTLSDR_FAIL_FS", None)

    def test_fcenter_failure_reports_and_restores(self, server, call_log):
        """A dongle refusing the retune: console reports FAILURE and every
        healthy dongle is put back on the old tuning (a mixed-frequency
        array is incoherent)."""
        os.environ["MOCK_RTLSDR_FAIL_TUNE"] = "2"
        try:
            mark = len(_parse(call_log))
            out = server.dispatcher.dispatch("fcenter 868000000")
            assert "FAILED" in out
            assert server.fcenter == 1024e6
            entries = _parse(call_log)[mark:]
            for idx in (0, 1):  # healthy dongles: attempt then restore
                tunes = [a for fn, a in _calls_for(entries, idx)
                         if fn == "set_center_freq"]
                assert tunes == [868000000, 1024000000], (idx, tunes)
        finally:
            os.environ.pop("MOCK_RTLSDR_FAIL_TUNE", None)

    def test_add_explicit_zero_gain_reaches_dongle(self, server, call_log):
        """gain 0.0 dB is a real tuner gain, not 'unset'."""
        mark = len(_parse(call_log))
        idx = server.source.capture.add("MOCK0003", gain_db=0.0)
        assert idx == 3
        args = dict(_calls_for(_parse(call_log)[mark:], 3))
        assert args["set_tuner_gain"] == 0
        assert server.source.capture.remove("MOCK0003") == 3


class TestPerChannelGapsThroughPipeline:
    def test_one_dongle_drop_desyncs_only_that_channel(self, call_log):
        """End to end: a single dongle's FIFO overflow (10x-fast mock
        device) must gap exactly that channel's seqnums INSIDE the
        pipeline — gap counter and desync hit channel 1 (MOCK0002) only,
        and it re-locks afterwards (crtlsdr.cc:181-188 readcnt semantics +
        SURVEY §5 in-pipeline detection)."""
        from coherent_rtlsdr_tpu.io.server import CoherentServer
        from coherent_rtlsdr_tpu.pipeline import PipelineConfig
        from coherent_rtlsdr_tpu.signal.sources import RtlSource

        class FakePub:
            def publish(self, *a, **k):
                return 0

            def close(self):
                pass

        class FakeCtl:
            def poll(self, cb):
                pass

        os.environ["MOCK_RTLSDR_FAST"] = "2"  # MOCK0002 = signal ch 1
        try:
            src = RtlSource.start(
                ["MOCKREF0", "MOCK0001", "MOCK0002"], block_len=L,
                ring_slots=256, fs=2.048e6, fcenter=1024e6, timeout_ms=10000,
            )
            srv = CoherentServer(
                PipelineConfig(n_channels=2, block_len=L), src,
                publisher=FakePub(), control=FakeCtl(),
            )
            try:
                n = srv.run(max_blocks=60)
                assert n == 60
                gaps = np.asarray(srv.state.gaps)
                assert gaps[1] >= 1, "fast dongle's drops never gapped ch 1"
                assert gaps[0] == 0, "healthy channel was gapped"
                # the gapped channel re-locks: after desync the quality gate
                # resumes measuring and lag returns near an integer lock
                synced = np.asarray(srv.state.synced)
                assert synced.shape == (2,)
            finally:
                src.stop()
        finally:
            os.environ.pop("MOCK_RTLSDR_FAST", None)


class TestFailurePaths:
    def test_unknown_serial_aborts_with_error(self, call_log):
        ring = native.NativeBlockRing(64, 2 * CHAN_BYTES)
        cap = _start(ring, ["MOCKREF0", "NO_SUCH_SERIAL"])
        try:
            deadline = time.time() + 10
            while cap.running and time.time() < deadline:
                time.sleep(0.01)
            assert not cap.running
            assert cap.error != 0
            assert cap.pushed == 0
        finally:
            cap.stop()

    def test_bad_ring_geometry_rejected(self, call_log):
        ring = native.NativeBlockRing(64, 5 * CHAN_BYTES)  # 5 != 2 serials
        with pytest.raises(RuntimeError):
            _start(ring, ["MOCKREF0", "MOCK0001"])
