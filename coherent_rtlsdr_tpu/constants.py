"""Operating constants, kept in parity with the reference system.

Reference pointers (see SURVEY.md):
  * default sample rate / block size / async depth: main.cc:95-96,165-167
  * sync threshold: common.h:32
  * control-law constants: ccontrol.cc:25-29
  * quantization scale 1/127: cdsp.cc:36-44
"""

# Default complex sample rate per channel (samples/s). main.cc:167
DEFAULT_FS = 2.048e6

# Default block length in *complex* samples (reference: 16384 bytes = 8192
# complex int8 IQ samples). main.cc:95,167
DEFAULT_BLOCK_LEN = 8192

# Number of FFT slots in the reference lag-estimation batch (1 ref + up to 7
# signal channels per round). main.cc:165 — our batched estimator does *all*
# channels every round instead; this is kept only for wire/telemetry parity.
DEFAULT_NFFT_SLOTS = 8

# Convergence criterion: a channel is "synchronized" when |lag| <= this
# (in samples). common.h:32
SYNC_THRESHOLD = 0.005

# Control law (ccontrol.cc:25-29). In the reference these drive the RTL2832's
# hardware resampler ppm skew; here they parameterize the numerical delay
# update so convergence dynamics match.
RTL_XTAL = 28.8e6
MAX_PPM = float(2**13) / float(2**24)  # ~488 ppm
CTRL_SCALE = 100.0  # tanh softness, in samples
CTRL_FRAC_T = 0.90  # fraction of ideal dwell time

# Phase-correction EMA weight (csdrdevice.cc:58-69).
PHASE_EMA_ALPHA = 0.5

# int8 <-> float quantization scale (cdsp.cc:36-44; zmqsdr.c uses 1/128 on the
# client side — the server emits x*127).
IQ_SCALE = 1.0 / 127.0

# ZMQ ports (cpacketizer.cc:58-66, console.cc:59-81).
DATA_PORT = 5555
CONTROL_PORT = 5556
DEBUG_PORT = 5557

# Tuner limits (console.cc:189).
FCENTER_MIN_HZ = 1e6
FCENTER_MAX_HZ = 1800e6

# Defaults from main.cc:167,133-136.
DEFAULT_FCENTER = 1024e6
DEFAULT_GAIN_DB = 50.0
DEFAULT_ASYNC_BUF_N = 8
