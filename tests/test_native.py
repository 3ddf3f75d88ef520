"""Native host-runtime tests: ring buffer semantics, wire parity between the
native packetizer and the Python reference implementation, and conversion
hot loops. Skipped when the library isn't built (`make -C native`)."""

import struct
import threading
import time

import numpy as np
import pytest

from coherent_rtlsdr_tpu import native
from coherent_rtlsdr_tpu.io.wire import pack_frame, unpack_frame

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


class TestRing:
    def test_push_pop_fifo(self):
        ring = native.NativeBlockRing(8, 64)
        for i in range(5):
            blk = np.full(64, i, np.uint8)
            assert ring.push(blk, seqnum=100 + i) >= 0
        assert ring.fill == 5
        for i in range(5):
            out, seq, ts = ring.pop()
            assert seq == 100 + i
            assert out[0] == i
            assert ts > 0
        assert ring.pop() is None

    def test_overflow_drops(self):
        ring = native.NativeBlockRing(4, 16)
        blk = np.zeros(16, np.uint8)
        for i in range(4):
            assert ring.push(blk, i) >= 0
        assert ring.push(blk, 99) == -1  # full -> drop, counted
        assert ring.dropped == 1

    def test_blocking_pop(self):
        ring = native.NativeBlockRing(4, 16)
        result = {}

        def consumer():
            result["blk"] = ring.pop(timeout_ms=2000)

        t = threading.Thread(target=consumer)
        t.start()
        time.sleep(0.05)
        ring.push(np.arange(16, dtype=np.uint8), 7)
        t.join()
        assert result["blk"] is not None
        out, seq, _ = result["blk"]
        assert seq == 7 and out[3] == 3

    def test_rejects_non_pow2(self):
        with pytest.raises(ValueError):
            native.NativeBlockRing(3, 16)


class TestConvert:
    def test_requantize_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 0.5, 4096).astype(np.float32)
        out = native.requantize_i8(x, 127.0)
        expect = np.clip(np.rint(x * 127.0), -128, 127).astype(np.int8)
        np.testing.assert_array_equal(out, expect)

    def test_dequantize_matches_formula(self):
        x = np.arange(256, dtype=np.uint8)
        out = native.dequantize_u8(x)
        expect = (x.astype(np.float32) - 128.0) / 127.0
        np.testing.assert_allclose(out, expect, rtol=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        u8 = rng.integers(0, 256, 1024, dtype=np.uint8)
        f = native.dequantize_u8(u8)
        back = native.requantize_i8(f, 127.0)
        expect = (u8.astype(np.int16) - 128).astype(np.int8)
        np.testing.assert_array_equal(back, expect)


class TestRingSource:
    def test_ring_feeds_pipeline_source(self):
        """Producer pushes frames into the native ring; RingSource serves
        them as pipeline blocks (the C++ ingest path)."""
        from coherent_rtlsdr_tpu.signal.sources import RingSource

        n, L = 3, 64
        block_bytes = (n + 1) * L * 2
        ring = native.NativeBlockRing(8, block_bytes)
        src = RingSource(ring, n_channels=n, block_len=L, timeout_ms=1000)

        rng = np.random.default_rng(0)
        frames = [
            rng.integers(0, 256, (n + 1, L, 2), dtype=np.uint8) for _ in range(3)
        ]
        for i, f in enumerate(frames):
            ring.push(f.reshape(-1), seqnum=100 + i)

        for i, f in enumerate(frames):
            blk = src.next_block()
            assert blk is not None
            sig, ref, seqs = blk
            np.testing.assert_array_equal(ref, f[0])
            np.testing.assert_array_equal(sig, f[1:])
            assert seqs[0] == 100 + i
        assert src.next_block() is None  # drained -> timeout


class TestNativePublisher:
    def test_wire_parity_with_python(self):
        """Frame bytes from the native packetizer must equal io/wire.py's."""
        import zmq

        rng = np.random.default_rng(2)
        iq = rng.integers(-128, 128, (3, 32, 2)).astype(np.int8)
        seqnums = np.array([5, 6, 7], np.uint32)
        phases = np.exp(1j * np.array([0.1, 0.2, 0.3])).astype(np.complex64)

        ctx = zmq.Context()
        sub = ctx.socket(zmq.SUB)
        sub.setsockopt(zmq.SUBSCRIBE, b"")
        sub.setsockopt(zmq.RCVTIMEO, 5000)
        dbg = ctx.socket(zmq.SUB)
        dbg.setsockopt(zmq.SUBSCRIBE, b"")
        dbg.setsockopt(zmq.RCVTIMEO, 5000)

        pub = native.NativePublisher(
            "tcp://127.0.0.1:17555", "tcp://127.0.0.1:17557"
        )
        sub.connect("tcp://127.0.0.1:17555")
        dbg.connect("tcp://127.0.0.1:17557")
        time.sleep(0.3)  # PUB/SUB join

        n = pub.publish(iq, seqnums, phases)
        buf = sub.recv()
        assert len(buf) == n
        assert buf == pack_frame(0, seqnums, iq)
        frame = unpack_frame(buf)
        np.testing.assert_array_equal(frame.iq, iq)
        np.testing.assert_array_equal(frame.seqnums, seqnums)

        dbuf = dbg.recv()
        np.testing.assert_array_equal(
            np.frombuffer(dbuf, np.complex64), phases
        )

        pub.publish(iq, seqnums, phases)
        f2 = unpack_frame(sub.recv())
        assert f2.globalseqn == 1  # gseq increments
        pub.close()


class TestNativeProducer:
    """The C++ capture threads (crtlsdr.cc:44-59 analog): file replayer and
    ZMQ raw-stream receiver feeding the native ring."""

    def _frames(self, n, L, count, seed=0):
        rng = np.random.default_rng(seed)
        return [
            rng.integers(0, 256, (n + 1, L, 2), dtype=np.uint8)
            for _ in range(count)
        ]

    def test_file_producer_feeds_ring_source(self, tmp_path):
        from coherent_rtlsdr_tpu.signal.sources import RingSource

        n, L, T = 3, 64, 5
        frames = self._frames(n, L, T)
        path = tmp_path / "capture.raw"
        with open(path, "wb") as f:
            for fr in frames:
                f.write(fr.tobytes())

        block_bytes = (n + 1) * L * 2
        ring = native.NativeBlockRing(16, block_bytes)
        prod = native.NativeProducer.file(ring, str(path))
        src = RingSource(ring, n_channels=n, block_len=L, timeout_ms=2000)
        try:
            for i, fr in enumerate(frames):
                blk = src.next_block()
                assert blk is not None, f"missing block {i}"
                sig, ref, seqs = blk
                np.testing.assert_array_equal(ref, fr[0])
                np.testing.assert_array_equal(sig, fr[1:])
                assert seqs[0] == i + 1
            deadline = time.time() + 2.0
            while prod.running and time.time() < deadline:
                time.sleep(0.01)
            assert not prod.running  # EOF, no loop
            assert prod.pushed == T
            assert not prod.error
        finally:
            prod.stop()

    def test_file_producer_paced(self, tmp_path):
        n, L, T = 1, 32, 10
        frames = self._frames(n, L, T, seed=1)
        path = tmp_path / "cap.raw"
        with open(path, "wb") as f:
            for fr in frames:
                f.write(fr.tobytes())
        ring = native.NativeBlockRing(16, (n + 1) * L * 2)
        t0 = time.time()
        prod = native.NativeProducer.file(ring, str(path), rate_blocks_per_s=100.0)
        try:
            deadline = time.time() + 5.0
            while prod.running and time.time() < deadline:
                time.sleep(0.01)
            dt = time.time() - t0
            assert prod.pushed == T
            assert dt >= 0.9 * T / 100.0  # pacing actually slept
        finally:
            prod.stop()

    def test_file_producer_missing_file(self, tmp_path):
        ring = native.NativeBlockRing(4, 64)
        prod = native.NativeProducer.file(ring, str(tmp_path / "nope.raw"))
        try:
            deadline = time.time() + 2.0
            while prod.running and time.time() < deadline:
                time.sleep(0.01)
            assert prod.error
            assert prod.pushed == 0
        finally:
            prod.stop()

    def test_zmq_producer_receives_raw_stream(self):
        """pyzmq PUB (a remote capture daemon) -> native SUB thread -> ring
        -> RingSource: the czmqsdr/raw-mode network ingest path."""
        import zmq

        from coherent_rtlsdr_tpu.signal.sources import RingSource

        n, L, T = 2, 64, 4
        frames = self._frames(n, L, T, seed=2)
        block_bytes = (n + 1) * L * 2

        ctx = zmq.Context()
        pub = ctx.socket(zmq.PUB)
        pub.bind("tcp://127.0.0.1:17601")
        ring = native.NativeBlockRing(16, block_bytes)
        prod = native.NativeProducer.zmq(ring, "tcp://127.0.0.1:17601")
        try:
            time.sleep(0.4)  # SUB join
            pub.send(b"short")  # wrong size: must be ignored, not crash
            for fr in frames:
                pub.send(fr.tobytes())
            deadline = time.time() + 5.0
            while prod.pushed < T and time.time() < deadline:
                time.sleep(0.01)
            assert prod.pushed == T

            src = RingSource(ring, n_channels=n, block_len=L, timeout_ms=1000)
            for i, fr in enumerate(frames):
                blk = src.next_block()
                assert blk is not None
                sig, ref, seqs = blk
                np.testing.assert_array_equal(ref, fr[0])
                np.testing.assert_array_equal(sig, fr[1:])
        finally:
            prod.stop()
            pub.close(0)
            ctx.term()

    def test_zmq_producer_header_frames_carry_per_channel_seqnums(self):
        """Seqnum-carrying network ingest (capture_daemon --wire header):
        the native SUB thread parses the reference wire frame, pushes the
        per-channel capture seqnums into the ring's tracks, and re-applies
        the u8 offset — a daemon-side drop on ONE channel gaps exactly
        that channel downstream (readcnt end-to-end, cpacketizer.cc:142),
        where the raw mode is gap-blind by design."""
        import zmq

        from coherent_rtlsdr_tpu.io.wire import pack_frame
        from coherent_rtlsdr_tpu.signal.sources import RingSource

        n, L, T = 2, 64, 5
        frames = self._frames(n, L, T, seed=4)
        block_bytes = (n + 1) * L * 2

        # per-channel seqnums; channel 1 (signal ch 0) drops a block
        # between wire frames 2 and 3
        seq_rows = []
        seqs = np.ones(n + 1, np.uint32)
        for t in range(T):
            seq_rows.append(seqs.copy())
            seqs = seqs + 1
            if t == 2:
                seqs[1] += 1  # the drop: this channel skips one readcnt

        ctx = zmq.Context()
        pub = ctx.socket(zmq.PUB)
        pub.bind("tcp://127.0.0.1:17603")
        ring = native.NativeBlockRing(16, block_bytes, n_seq=n + 1)
        prod = native.NativeProducer.zmq(ring, "tcp://127.0.0.1:17603")
        try:
            time.sleep(0.4)  # SUB join
            pub.send(b"\x00" * (block_bytes + 7))  # bad geometry: rejected
            # header with a wrong channel count for this per-channel ring
            # (N=48, L=4 — right payload size): rejected by geometry
            nh, lh = block_bytes // 8, 4
            hostile = (
                struct.pack("<IIII", 0, nh, lh, 0)
                + b"\x00" * (4 * nh)
                + b"\x00" * (2 * nh * lh)
            )
            pub.send(hostile)
            # right total bytes, wrong channel split for this ring: the
            # per-channel seqnum contract would be scrambled — rejected
            n2, l2 = 2 * (n + 1), L // 2
            wrongsplit = (
                struct.pack("<IIII", 0, n2, l2, 0)
                + b"\x00" * (4 * n2)
                + b"\x00" * (2 * n2 * l2)
            )
            pub.send(wrongsplit)
            for t, fr in enumerate(frames):
                iq = (fr ^ np.uint8(0x80)).view(np.int8)
                pub.send(pack_frame(t, seq_rows[t], iq))
            deadline = time.time() + 5.0
            while prod.pushed < T and time.time() < deadline:
                time.sleep(0.01)
            assert prod.pushed == T
            assert prod.hdr_frames == T
            assert prod.rejected == 3

            src = RingSource(ring, n_channels=n, block_len=L, timeout_ms=1000)
            got_seqs = []
            for t, fr in enumerate(frames):
                blk = src.next_block()
                assert blk is not None
                sig, ref, seqs_out = blk
                np.testing.assert_array_equal(ref, fr[0])   # offset restored
                np.testing.assert_array_equal(sig, fr[1:])
                got_seqs.append(seqs_out)
            got = np.stack(got_seqs)  # [T, n] signal-channel seqnums
            d = got[1:].astype(np.int64) - got[:-1].astype(np.int64)
            assert d[2, 0] == 2        # the injected gap, exactly here
            d[2, 0] = 1
            np.testing.assert_array_equal(d, np.ones_like(d))  # rest clean
        finally:
            prod.stop()
            pub.close(0)
            ctx.term()

    def test_zmq_producer_rejects_truncated_hostile_header(self):
        """Regression (ASAN-confirmed round-5 review finding): a header
        claiming N so large that the message exceeds the receive buffer is
        TRUNCATED by zmq_recv — but zmq_recv still returns the full size,
        so the exact-length check alone would pass and the XOR/push would
        run past the heap buffer. The producer must reject any message
        larger than its buffer."""
        import zmq

        # legacy frame-level ring (n_seq=1): the geometry check cannot
        # save us here, only the truncation check can
        block_bytes = 16384
        ring = native.NativeBlockRing(16, block_bytes)  # n_seq=1
        ctx = zmq.Context()
        pub = ctx.socket(zmq.PUB)
        pub.bind("tcp://127.0.0.1:17604")
        prod = native.NativeProducer.zmq(ring, "tcp://127.0.0.1:17604")
        try:
            time.sleep(0.4)
            nh, lh = 8192, 1  # pay = 2*8192*1 == block_bytes; hdr+seqnums
            hostile = (                      # total 49168 B > recv buffer
                struct.pack("<IIII", 0, nh, lh, 0)
                + b"\x00" * (4 * nh)
                + b"\x7f" * (2 * nh * lh)
            )
            pub.send(hostile)
            deadline = time.time() + 5.0
            while prod.rejected < 1 and time.time() < deadline:
                time.sleep(0.01)
            assert prod.rejected == 1
            assert prod.pushed == 0
            # the producer thread survived and still accepts good blocks
            pub.send(b"\x80" * block_bytes)
            deadline = time.time() + 5.0
            while prod.pushed < 1 and time.time() < deadline:
                time.sleep(0.01)
            assert prod.pushed == 1
        finally:
            prod.stop()
            pub.close(0)
            ctx.term()
