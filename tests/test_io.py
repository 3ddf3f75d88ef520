"""Wire-format, config, and console-grammar tests (byte-level parity with the
reference's packetizer/clients/config; SURVEY.md §2.1-2.2)."""

import struct

import numpy as np
import pytest

from coherent_rtlsdr_tpu.io import (
    HDR_BYTES,
    frame_length,
    get_refname,
    pack_debug,
    pack_frame,
    read_config,
    unpack_debug,
    unpack_frame,
)
from coherent_rtlsdr_tpu.io.config import parse_config, signal_channels
from coherent_rtlsdr_tpu.io.console import (
    Command,
    ConsoleDispatcher,
    parse_command,
)
from coherent_rtlsdr_tpu.io.wire import frame_to_matrix


class TestWire:
    def test_header_layout(self):
        """hdr0 = 4 LE uint32 {globalseqn, N, L, unused} (cpacketizer.h:32-37)."""
        iq = np.zeros((3, 8, 2), np.int8)
        buf = pack_frame(42, [7, 8, 9], iq)
        gseq, n, l, unused = struct.unpack_from("<IIII", buf, 0)
        assert (gseq, n, l, unused) == (42, 3, 8, 0)
        seqs = struct.unpack_from("<III", buf, HDR_BYTES)
        assert seqs == (7, 8, 9)
        assert len(buf) == frame_length(3, 8)

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        iq = rng.integers(-128, 128, (4, 16, 2)).astype(np.int8)
        buf = pack_frame(5, [1, 2, 3, 4], iq)
        frame = unpack_frame(buf)
        assert frame.globalseqn == 5
        np.testing.assert_array_equal(frame.seqnums, [1, 2, 3, 4])
        np.testing.assert_array_equal(frame.iq, iq)

    def test_raw_mode(self):
        """-R raw mode drops header+seqnums (main.cc:105,148-150)."""
        iq = np.ones((2, 4, 2), np.int8)
        buf = pack_frame(0, [0, 0], iq, header=False)
        assert len(buf) == 2 * 2 * 4
        frame = unpack_frame(buf, header=False, n_channels=2, block_len=4)
        np.testing.assert_array_equal(frame.iq, iq)

    def test_channel_payload_order(self):
        """Payload is channel-major: ch c at offset hdr+4N+c*2L
        (cpacketizer.cc:137-156)."""
        iq = np.zeros((2, 4, 2), np.int8)
        iq[1, 0] = [11, -22]
        buf = pack_frame(0, [0, 0], iq)
        off = HDR_BYTES + 4 * 2 + 1 * 8
        assert buf[off] == 11
        assert np.frombuffer(buf[off + 1 : off + 2], np.int8)[0] == -22

    def test_debug_frame(self):
        """:5557 frame = N raw complex64 (cpacketizer.cc:125-134)."""
        p = np.exp(1j * np.array([0.1, -0.5, 2.0])).astype(np.complex64)
        buf = pack_debug(p)
        assert len(buf) == 3 * 8
        np.testing.assert_array_equal(unpack_debug(buf), p)

    def test_frame_to_matrix_matches_mex_scaling(self):
        """zmqsdr.c:128-135 scales int8 by 1/128."""
        iq = np.array([[[127, -128], [64, 0]]], np.int8)
        frame = unpack_frame(pack_frame(0, [0], iq))
        m = frame_to_matrix(frame)
        np.testing.assert_allclose(
            m[0], [(127 - 128j) / 128.0, 0.5 + 0j], rtol=1e-6
        )

    def test_gseq_wraps_uint32(self):
        buf = pack_frame(2**32 + 3, [0], np.zeros((1, 2, 2), np.int8))
        assert unpack_frame(buf).globalseqn == 3


class TestConfig:
    CFG = """#comment line
R :'M REF'
1 :'M 1'
2 :'M 2'
10:'M 10'
"""

    def test_parse(self):
        defs = parse_config(self.CFG)
        assert len(defs) == 4
        assert defs[0].devindex == 0 and defs[0].serial == "M REF"
        assert defs[3].devindex == 10 and defs[3].serial == "M 10"

    def test_refname(self):
        assert get_refname(parse_config(self.CFG)) == "M REF"

    def test_signal_channel_order(self):
        chans = signal_channels(parse_config(self.CFG))
        assert [c.devindex for c in chans] == [1, 2, 10]

    def test_per_channel_gains_extension(self):
        """`gain=<dB>` after the serial — the per-channel gains the
        reference marks as future work (examplecfg/four.cfg:4). Lines
        without it keep gain_db=None (CLI default applies)."""
        defs = parse_config(
            "R :'M REF' gain=32.5\n1 :'M 1'\n2 :'M 2' gain=40\n"
        )
        assert defs[0].gain_db == 32.5
        assert defs[1].gain_db is None
        assert defs[2].gain_db == 40.0
        # the reference's own configs (no gains) still parse identically
        assert all(d.gain_db is None for d in parse_config(self.CFG))

    def test_reference_example_configs(self):
        """Parse the reference repo's own example configs."""
        defs = read_config("/root/reference/examplecfg/URA21.cfg")
        assert len(defs) == 22
        assert get_refname(defs) == "M REF"
        assert len(signal_channels(defs)) == 21
        defs4 = read_config("/root/reference/examplecfg/four.cfg")
        assert len(signal_channels(defs4)) == 3


class _FakeController:
    def __init__(self):
        self.log = []
        self.fs = 2.048e6
        self.fc = 1024e6
        self.refnoise = True

    def get_fs(self):
        return self.fs

    def set_fs(self, v):
        self.fs = v
        self.log.append(("fs", v))

    def get_fcenter(self):
        return self.fc

    def set_fcenter(self, v):
        self.fc = v
        self.log.append(("fcenter", v))

    def status(self):
        return "0 / 4 synchronized"

    def list_channels(self, all=False):
        return "ALL" if all else "SOME"

    def phase_table(self):
        return "0\t1\t2"

    def set_refnoise(self, v):
        self.refnoise = v

    def request_lag(self):
        self.log.append(("lag",))

    def request_sync(self):
        self.log.append(("sync",))

    def add_channel(self, s):
        return f"added {s}"

    def del_channel(self, s):
        return f"deleted {s}"

    def drain_log(self):
        return "logs"

    def shutdown(self):
        self.log.append(("quit",))


class TestConsole:
    def test_parse(self):
        p = parse_command("fcenter 868000000")
        assert p.command == Command.FCENTER and p.options == "868000000"
        assert parse_command("garbage xyz").command == Command.NOP
        assert parse_command("").command == Command.NOP

    def test_dispatch_matlab_command_strings(self):
        """The exact strings the MEX client sends (zmqsdr.c:152-181)."""
        c = _FakeController()
        d = ConsoleDispatcher(c)
        d.dispatch("fcenter 868000000")
        assert c.fc == 868000000
        d.dispatch("request re")
        assert c.refnoise is True
        d.dispatch("request rd")
        assert c.refnoise is False
        d.dispatch("request sync")
        assert ("sync",) in c.log

    def test_fcenter_range_check(self):
        """1-1800 MHz accepted range (console.cc:189)."""
        c = _FakeController()
        d = ConsoleDispatcher(c)
        out = d.dispatch("fcenter 500")
        assert "out of range" in out
        assert c.fc == 1024e6

    def test_fs_get_set(self):
        c = _FakeController()
        d = ConsoleDispatcher(c)
        assert "2048000" in d.dispatch("fs")
        d.dispatch("fs 1000000")
        assert c.fs == 1e6

    def test_quit(self):
        c = _FakeController()
        ConsoleDispatcher(c).dispatch("quit")
        assert ("quit",) in c.log
