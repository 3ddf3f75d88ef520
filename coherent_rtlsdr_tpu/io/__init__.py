"""Host edge: the reference's exact wire formats and control surfaces.

Everything here speaks the reference system's protocols bit-for-bit so its
existing clients (matlabclient/zmqsdr.c MEX, CZMQSDR.m, beamformclient
heatmap2d*.cpp) work unmodified against this framework:

  * wire.py     — data frame (hdr0 + seqnums + int8 IQ) and the :5557 debug
                  phase-factor frame
  * config.py   — receiver config files (examplecfg/*.cfg grammar)
  * console.py  — the text command grammar (console.h:57-70) shared by the
                  local shell and the ZMQ ROUTER control plane
  * zmq_edge.py — ZMQ PUB data/debug publishers + ROUTER control socket
  * client.py   — CoherentClient, the CZMQSDR.m / zmqsdr.c analog for
                  Python users (read frames as complex matrices, drive the
                  console grammar)
  * streamio.py — raw capture file playback/recording
"""

from coherent_rtlsdr_tpu.io.wire import (
    HDR_BYTES,
    pack_frame,
    unpack_frame,
    pack_debug,
    unpack_debug,
    frame_length,
)
from coherent_rtlsdr_tpu.io.config import ChannelDef, read_config, get_refname

__all__ = [
    "HDR_BYTES",
    "pack_frame",
    "unpack_frame",
    "pack_debug",
    "unpack_debug",
    "frame_length",
    "ChannelDef",
    "read_config",
    "get_refname",
]
