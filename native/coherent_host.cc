// coherent_host — native host-edge runtime for coherent_rtlsdr_tpu.
//
// The reference implements its runtime in C++ (capture ring `cbuffer`
// common.h:41-149, packetizer `cpacketize` cpacketizer.cc, ZMQ publisher);
// this library provides the TPU framework's equivalents as a small C ABI
// consumed from Python via ctypes (no pybind11 in this image):
//
//   * block ring buffer: single-producer single-consumer ring of fixed-size
//     sample blocks with seqnums + nanosecond timestamps. Unlike the
//     reference's pointer-stealing ring (the documented stale-buffer race,
//     README.md:42), blocks are copied into owned slots — at 21ch x 4 MB/s
//     the copy is ~90 MB/s, irrelevant next to PCIe, and the race class is
//     gone.
//   * frame packetizer: assembles the exact wire frame (hdr0 + seqnums +
//     int8 IQ payload, cpacketizer.h:32-37) into an owned buffer and
//     publishes it on ZMQ PUB sockets (data + phase-debug), libzmq loaded
//     with dlopen (stable C ABI, no headers needed).
//   * float->int8 requantizer: the cdsp::convto8bit hot loop (cdsp.cc:51-54)
//     as portable C++ that the compiler auto-vectorizes.
//
// Build: native/Makefile -> coherent_rtlsdr_tpu/_native/libcoherent_host.so

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <dlfcn.h>

// ---------------------------------------------------------------- libzmq --

namespace zmqdl {

// Stable libzmq C ABI constants (zmq.h).
constexpr int PUB = 1;
constexpr int SUB = 2;
constexpr int SNDMORE = 2;      // unused; frames are single-part like the ref
constexpr int SUBSCRIBE = 6;    // ZMQ_SUBSCRIBE
constexpr int RCVTIMEO = 27;    // ZMQ_RCVTIMEO

using ctx_new_t = void *(*)();
using ctx_term_t = int (*)(void *);
using socket_t = void *(*)(void *, int);
using close_t = int (*)(void *);
using bind_t = int (*)(void *, const char *);
using connect_t = int (*)(void *, const char *);
using send_t = int (*)(void *, const void *, size_t, int);
using recv_t = int (*)(void *, void *, size_t, int);
using setsockopt_t = int (*)(void *, int, const void *, size_t);

struct Api {
  void *handle = nullptr;
  ctx_new_t ctx_new = nullptr;
  ctx_term_t ctx_term = nullptr;
  socket_t socket = nullptr;
  close_t close = nullptr;
  bind_t bind = nullptr;
  connect_t connect = nullptr;
  send_t send = nullptr;
  recv_t recv = nullptr;
  setsockopt_t setsockopt = nullptr;
  bool ok = false;
};

static Api &api() {
  static Api a;
  static std::once_flag once;
  std::call_once(once, [] {
    const char *names[] = {"libzmq.so.5", "libzmq.so"};
    for (const char *n : names) {
      a.handle = dlopen(n, RTLD_NOW | RTLD_GLOBAL);
      if (a.handle) break;
    }
    if (!a.handle) return;
    a.ctx_new = reinterpret_cast<ctx_new_t>(dlsym(a.handle, "zmq_ctx_new"));
    a.ctx_term = reinterpret_cast<ctx_term_t>(dlsym(a.handle, "zmq_ctx_term"));
    a.socket = reinterpret_cast<socket_t>(dlsym(a.handle, "zmq_socket"));
    a.close = reinterpret_cast<close_t>(dlsym(a.handle, "zmq_close"));
    a.bind = reinterpret_cast<bind_t>(dlsym(a.handle, "zmq_bind"));
    a.connect = reinterpret_cast<connect_t>(dlsym(a.handle, "zmq_connect"));
    a.send = reinterpret_cast<send_t>(dlsym(a.handle, "zmq_send"));
    a.recv = reinterpret_cast<recv_t>(dlsym(a.handle, "zmq_recv"));
    a.setsockopt =
        reinterpret_cast<setsockopt_t>(dlsym(a.handle, "zmq_setsockopt"));
    a.ok = a.ctx_new && a.socket && a.bind && a.connect && a.send && a.recv &&
           a.close;
  });
  return a;
}

}  // namespace zmqdl

// ------------------------------------------------------------- ring buffer --

namespace {

struct BlockRing {
  uint32_t nslots;       // power of two
  uint32_t block_bytes;  // bytes per block (all channels concatenated)
  std::vector<uint8_t> data;
  std::vector<uint64_t> seqnum;
  std::vector<int64_t> ts_ns;
  std::atomic<uint64_t> wp{0};
  std::atomic<uint64_t> rp{0};
  std::atomic<uint64_t> dropped{0};
  std::mutex mtx;
  std::condition_variable cv;
};

int64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

struct Publisher {
  void *ctx = nullptr;
  void *data_sock = nullptr;
  void *debug_sock = nullptr;
  uint32_t globalseqn = 0;
  bool header = true;
  std::vector<uint8_t> frame;  // assembly buffer
};

#pragma pack(push, 1)
struct Hdr0 {  // include/cpacketizer.h:32-37
  uint32_t globalseqn;
  uint32_t N;
  uint32_t L;
  uint32_t unused;
};
#pragma pack(pop)

}  // namespace

extern "C" {

// ---- ring --------------------------------------------------------------

void *chost_ring_create(uint32_t nslots_pow2, uint32_t block_bytes) {
  if (nslots_pow2 == 0 || (nslots_pow2 & (nslots_pow2 - 1))) return nullptr;
  auto *r = new BlockRing();
  r->nslots = nslots_pow2;
  r->block_bytes = block_bytes;
  r->data.resize(size_t(nslots_pow2) * block_bytes);
  r->seqnum.resize(nslots_pow2);
  r->ts_ns.resize(nslots_pow2);
  return r;
}

void chost_ring_destroy(void *rv) { delete static_cast<BlockRing *>(rv); }

// Producer: copy a block in. Returns slot index, or -1 when the ring is
// full (the block is counted as dropped — seqnum-gap detection downstream
// mirrors the reference's documented drop behavior, README.md:42).
int64_t chost_ring_push(void *rv, const uint8_t *block, uint64_t seqnum) {
  auto *r = static_cast<BlockRing *>(rv);
  uint64_t wp = r->wp.load(std::memory_order_relaxed);
  uint64_t rp = r->rp.load(std::memory_order_acquire);
  if (wp - rp >= r->nslots) {
    r->dropped.fetch_add(1, std::memory_order_relaxed);
    return -1;
  }
  uint32_t slot = wp & (r->nslots - 1);
  std::memcpy(&r->data[size_t(slot) * r->block_bytes], block, r->block_bytes);
  r->seqnum[slot] = seqnum;
  r->ts_ns[slot] = now_ns();
  r->wp.store(wp + 1, std::memory_order_release);
  {
    std::lock_guard<std::mutex> g(r->mtx);
    r->cv.notify_one();
  }
  return static_cast<int64_t>(slot);
}

// Consumer: copy the oldest block out (blocking with timeout_ms; 0 = poll).
// Returns 1 on success, 0 on timeout.
int chost_ring_pop(void *rv, uint8_t *out, uint64_t *seqnum, int64_t *ts_ns,
                   int timeout_ms) {
  auto *r = static_cast<BlockRing *>(rv);
  uint64_t rp = r->rp.load(std::memory_order_relaxed);
  if (r->wp.load(std::memory_order_acquire) == rp) {
    if (timeout_ms <= 0) return 0;
    std::unique_lock<std::mutex> lk(r->mtx);
    if (!r->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), [&] {
          return r->wp.load(std::memory_order_acquire) != rp;
        }))
      return 0;
  }
  uint32_t slot = rp & (r->nslots - 1);
  std::memcpy(out, &r->data[size_t(slot) * r->block_bytes], r->block_bytes);
  if (seqnum) *seqnum = r->seqnum[slot];
  if (ts_ns) *ts_ns = r->ts_ns[slot];
  r->rp.store(rp + 1, std::memory_order_release);
  return 1;
}

uint64_t chost_ring_dropped(void *rv) {
  return static_cast<BlockRing *>(rv)->dropped.load();
}

uint32_t chost_ring_fill(void *rv) {
  auto *r = static_cast<BlockRing *>(rv);
  return static_cast<uint32_t>(r->wp.load() - r->rp.load());
}

// ---- DSP helpers -------------------------------------------------------

// float32 (interleaved IQ or any layout) -> int8 with scale, round-to-
// nearest, saturation. cdsp::convto8bit analog (cdsp.cc:51-54).
void chost_requantize_i8(const float *in, int8_t *out, size_t n, float scale) {
  for (size_t i = 0; i < n; ++i) {
    float v = in[i] * scale;
    v = v < -128.0f ? -128.0f : (v > 127.0f ? 127.0f : v);
    out[i] = static_cast<int8_t>(lrintf(v));
  }
}

// uint8 offset-binary -> float32, scale 1/127 (cdsp::convtosigned +
// convtofloat, cdsp.cc:21-44).
void chost_dequantize_u8(const uint8_t *in, float *out, size_t n) {
  constexpr float k = 1.0f / 127.0f;
  for (size_t i = 0; i < n; ++i) out[i] = (static_cast<int>(in[i]) - 128) * k;
}

// ---- publisher ---------------------------------------------------------

int chost_zmq_available(void) { return zmqdl::api().ok ? 1 : 0; }

void *chost_pub_create(const char *data_addr, const char *debug_addr,
                       int header) {
  auto &z = zmqdl::api();
  if (!z.ok) return nullptr;
  auto *p = new Publisher();
  p->ctx = z.ctx_new();
  p->data_sock = z.socket(p->ctx, zmqdl::PUB);
  if (z.bind(p->data_sock, data_addr) != 0) {
    z.close(p->data_sock);
    z.ctx_term(p->ctx);
    delete p;
    return nullptr;
  }
  if (debug_addr && debug_addr[0]) {
    p->debug_sock = z.socket(p->ctx, zmqdl::PUB);
    if (z.bind(p->debug_sock, debug_addr) != 0) {
      z.close(p->debug_sock);
      p->debug_sock = nullptr;
    }
  }
  p->header = header != 0;
  return p;
}

void chost_pub_destroy(void *pv) {
  auto *p = static_cast<Publisher *>(pv);
  if (!p) return;
  auto &z = zmqdl::api();
  if (p->data_sock) z.close(p->data_sock);
  if (p->debug_sock) z.close(p->debug_sock);
  if (p->ctx && z.ctx_term) z.ctx_term(p->ctx);
  delete p;
}

// Assemble + send one frame: hdr0 {gseq, N, L} + N x uint32 seqnums +
// N x L x 2 int8 payload (cpacketizer.cc:109-172 layout), then the debug
// phase factors (N complex64) on the debug socket. Returns bytes sent or -1.
int64_t chost_pub_send(void *pv, uint32_t n_channels, uint32_t block_len,
                       const uint32_t *seqnums, const int8_t *iq,
                       const float *phases_iq /* 2*N floats, may be null */) {
  auto *p = static_cast<Publisher *>(pv);
  auto &z = zmqdl::api();
  size_t payload = size_t(2) * n_channels * block_len;
  size_t len = p->header ? sizeof(Hdr0) + 4 * size_t(n_channels) + payload
                         : payload;
  p->frame.resize(len);
  uint8_t *w = p->frame.data();
  if (p->header) {
    Hdr0 h{p->globalseqn, n_channels, block_len, 0};
    std::memcpy(w, &h, sizeof(h));
    w += sizeof(h);
    std::memcpy(w, seqnums, 4 * size_t(n_channels));
    w += 4 * size_t(n_channels);
  }
  std::memcpy(w, iq, payload);
  int rc = z.send(p->data_sock, p->frame.data(), len, 0);
  if (rc < 0) return -1;
  if (p->debug_sock && phases_iq) {
    z.send(p->debug_sock, phases_iq, 8 * size_t(n_channels), 0);
  }
  p->globalseqn++;
  return static_cast<int64_t>(len);
}

uint32_t chost_pub_gseq(void *pv) {
  return static_cast<Publisher *>(pv)->globalseqn;
}

}  // extern "C"

// -------------------------------------------------------------- producers --
//
// The capture side of the runtime: an asynchronous reader thread pushing raw
// blocks into the ring — the reference's per-device `asynch_threadf`
// (src/crtlsdr.cc:44-59, librtlsdr USB callbacks) generalized to the two
// ingest transports the TPU host actually has: file replay (recorded
// captures, rate-paced to simulate a live array) and a ZMQ raw-stream
// receiver (the czmqsdr stub's intent, include/csdrdevice.h:270-272 — a
// remote capture daemon streams raw frames over the network).

namespace {

struct Producer {
  BlockRing *ring = nullptr;
  std::thread th;
  std::atomic<bool> stop{false};
  std::atomic<bool> done{false};
  std::atomic<uint64_t> pushed{0};
  std::atomic<int> error{0};
  // file replay
  std::string path;
  double rate = 0.0;  // blocks/s; <= 0 => flat out
  bool loop = false;
  // zmq receiver
  void *zctx = nullptr;
  void *zsock = nullptr;
};

void file_producer_main(Producer *p) {
  std::vector<uint8_t> buf(p->ring->block_bytes);
  uint64_t seq = 0;
  auto next = std::chrono::steady_clock::now();
  do {
    FILE *f = std::fopen(p->path.c_str(), "rb");
    if (!f) {
      p->error.store(1);
      p->done.store(true);  // keep chost_producer_running truthful on error
      return;
    }
    while (!p->stop.load(std::memory_order_relaxed)) {
      size_t got = std::fread(buf.data(), 1, buf.size(), f);
      if (got < buf.size()) break;  // EOF or short tail
      if (p->rate > 0) {
        next += std::chrono::nanoseconds(
            static_cast<int64_t>(1e9 / p->rate));
        std::this_thread::sleep_until(next);
      }
      // A full ring counts a drop and the block is lost — exactly the
      // reference's under-load failure mode (README.md:42); downstream
      // seqnum-gap detection (pipeline/step.py) sees the jump.
      chost_ring_push(p->ring, buf.data(), ++seq);
      p->pushed.fetch_add(1, std::memory_order_relaxed);
    }
    std::fclose(f);
  } while (p->loop && !p->stop.load(std::memory_order_relaxed));
  p->done.store(true);
}

void zmq_producer_main(Producer *p) {
  auto &z = zmqdl::api();
  std::vector<uint8_t> buf(p->ring->block_bytes);
  uint64_t seq = 0;
  while (!p->stop.load(std::memory_order_relaxed)) {
    int n = z.recv(p->zsock, buf.data(), buf.size(), 0);
    if (n < 0) continue;  // RCVTIMEO poll tick
    if (static_cast<size_t>(n) != buf.size()) continue;  // not a raw block
    chost_ring_push(p->ring, buf.data(), ++seq);
    p->pushed.fetch_add(1, std::memory_order_relaxed);
  }
  p->done.store(true);
}

}  // namespace

extern "C" {

// Replay a raw capture file (contiguous [n_blocks x block_bytes] u8 blocks,
// each block = one ring slot: (N+1) x L x 2 interleaved IQ, ref first) into
// the ring at `rate_blocks_per_s` (<= 0 = as fast as the ring drains).
void *chost_producer_file_start(void *ring, const char *path,
                                double rate_blocks_per_s, int loop) {
  auto *p = new Producer();
  p->ring = static_cast<BlockRing *>(ring);
  p->path = path;
  p->rate = rate_blocks_per_s;
  p->loop = loop != 0;
  p->th = std::thread(file_producer_main, p);
  return p;
}

// Receive raw blocks (header-less frames of exactly block_bytes) from a ZMQ
// SUB connection and push them into the ring — the network capture daemon
// contract (reference raw mode, src/main.cc:105,148-150).
void *chost_producer_zmq_start(void *ring, const char *addr) {
  auto &z = zmqdl::api();
  if (!z.ok) return nullptr;
  auto *p = new Producer();
  p->ring = static_cast<BlockRing *>(ring);
  p->zctx = z.ctx_new();
  p->zsock = z.socket(p->zctx, zmqdl::SUB);
  int timeout = 100;
  z.setsockopt(p->zsock, zmqdl::SUBSCRIBE, "", 0);
  z.setsockopt(p->zsock, zmqdl::RCVTIMEO, &timeout, sizeof(timeout));
  if (z.connect(p->zsock, addr) != 0) {
    z.close(p->zsock);
    z.ctx_term(p->zctx);
    delete p;
    return nullptr;
  }
  p->th = std::thread(zmq_producer_main, p);
  return p;
}

uint64_t chost_producer_pushed(void *pv) {
  return static_cast<Producer *>(pv)->pushed.load();
}

int chost_producer_error(void *pv) {
  return static_cast<Producer *>(pv)->error.load();
}

// Returns 1 while the producer thread is still running (file replay ends on
// EOF when not looping).
int chost_producer_running(void *pv) {
  return static_cast<Producer *>(pv)->done.load() ? 0 : 1;
}

void chost_producer_stop(void *pv) {
  auto *p = static_cast<Producer *>(pv);
  if (!p) return;
  p->stop.store(true);
  if (p->th.joinable()) p->th.join();
  if (p->zsock) zmqdl::api().close(p->zsock);
  if (p->zctx) zmqdl::api().ctx_term(p->zctx);
  delete p;
}

}  // extern "C"

// ------------------------------------------------------------- librtlsdr --
//
// The hardware capture path: drive real RTL-SDR dongles through librtlsdr
// (dlopen'd, same shim pattern as libzmq above — the tejeez fork's extra
// symbols `rtlsdr_set_dithering` / `rtlsdr_set_sample_freq_correction_f`
// are resolved when present, README.md:35-37). Behavioral contract taken
// from the reference's crtlsdr:
//
//   * enumeration by USB serial string      (src/crtlsdr.cc:70-106)
//   * order-sensitive open sequence: sample rate -> dithering OFF (MUST
//     precede tuning, src/crtlsdr.cc:121) -> center freq -> AGC -> tuner
//     gain mode/gain -> zero freq correction (src/crtlsdr.cc:112-135)
//   * per-device async capture thread released by a shared start barrier
//     so all dongles begin within one async window (src/crtlsdr.cc:44-59,
//     common.h:151-168, main.cc:252-258)
//   * retune re-disables dithering before set_center_freq
//     (src/crtlsdr.cc:142-146)
//
// Topology differs from the reference by design: instead of pointer-
// stealing rings + mutex choreography per device, each device's USB
// callback appends into a bounded per-device byte FIFO and one assembler
// thread builds combined [ref | ch1..chN] blocks (the RingSource layout)
// into the owned-slot ring. Overflow drops whole channel-blocks, keeping
// IQ framing; downstream seqnum-gap detection reports the loss.

namespace rtldl {

using get_count_t = uint32_t (*)();
using usb_strings_t = int (*)(uint32_t, char *, char *, char *);
using open_t = int (*)(void **, uint32_t);
using close_t = int (*)(void *);
using set_u32_t = int (*)(void *, uint32_t);
using set_int_t = int (*)(void *, int);
using set_f_t = int (*)(void *, float);
using reset_t = int (*)(void *);
using read_cb_t = void (*)(unsigned char *, uint32_t, void *);
using read_async_t = int (*)(void *, read_cb_t, void *, uint32_t, uint32_t);
using cancel_t = int (*)(void *);

struct Api {
  void *handle = nullptr;
  get_count_t get_device_count = nullptr;
  usb_strings_t get_device_usb_strings = nullptr;
  open_t open = nullptr;
  close_t close = nullptr;
  set_u32_t set_sample_rate = nullptr;
  set_u32_t set_center_freq = nullptr;
  set_int_t set_agc_mode = nullptr;
  set_int_t set_tuner_gain_mode = nullptr;
  set_int_t set_tuner_gain = nullptr;
  set_int_t set_freq_correction = nullptr;   // stock librtlsdr (ppm int)
  reset_t reset_buffer = nullptr;
  read_async_t read_async = nullptr;
  cancel_t cancel_async = nullptr;
  // tejeez coherent-rtlsdr fork extensions (optional symbols)
  set_int_t set_dithering = nullptr;
  set_f_t set_sample_freq_correction_f = nullptr;
  bool ok = false;
};

static Api g_api;
static std::mutex g_api_mtx;

static bool load(const char *path) {
  std::lock_guard<std::mutex> g(g_api_mtx);
  Api a;
  if (path && path[0]) {
    a.handle = dlopen(path, RTLD_NOW | RTLD_LOCAL);
  } else {
    const char *env = std::getenv("COHERENT_LIBRTLSDR");
    const char *names[] = {env, "librtlsdr.so.0", "librtlsdr.so"};
    for (const char *n : names) {
      if (!n || !n[0]) continue;
      a.handle = dlopen(n, RTLD_NOW | RTLD_LOCAL);
      if (a.handle) break;
    }
  }
  if (!a.handle) return false;
  auto sym = [&](const char *n) { return dlsym(a.handle, n); };
  a.get_device_count =
      reinterpret_cast<get_count_t>(sym("rtlsdr_get_device_count"));
  a.get_device_usb_strings =
      reinterpret_cast<usb_strings_t>(sym("rtlsdr_get_device_usb_strings"));
  a.open = reinterpret_cast<open_t>(sym("rtlsdr_open"));
  a.close = reinterpret_cast<close_t>(sym("rtlsdr_close"));
  a.set_sample_rate = reinterpret_cast<set_u32_t>(sym("rtlsdr_set_sample_rate"));
  a.set_center_freq = reinterpret_cast<set_u32_t>(sym("rtlsdr_set_center_freq"));
  a.set_agc_mode = reinterpret_cast<set_int_t>(sym("rtlsdr_set_agc_mode"));
  a.set_tuner_gain_mode =
      reinterpret_cast<set_int_t>(sym("rtlsdr_set_tuner_gain_mode"));
  a.set_tuner_gain = reinterpret_cast<set_int_t>(sym("rtlsdr_set_tuner_gain"));
  a.set_freq_correction =
      reinterpret_cast<set_int_t>(sym("rtlsdr_set_freq_correction"));
  a.reset_buffer = reinterpret_cast<reset_t>(sym("rtlsdr_reset_buffer"));
  a.read_async = reinterpret_cast<read_async_t>(sym("rtlsdr_read_async"));
  a.cancel_async = reinterpret_cast<cancel_t>(sym("rtlsdr_cancel_async"));
  a.set_dithering = reinterpret_cast<set_int_t>(sym("rtlsdr_set_dithering"));
  a.set_sample_freq_correction_f =
      reinterpret_cast<set_f_t>(sym("rtlsdr_set_sample_freq_correction_f"));
  a.ok = a.get_device_count && a.get_device_usb_strings && a.open && a.close &&
         a.set_sample_rate && a.set_center_freq && a.reset_buffer &&
         a.read_async && a.cancel_async;
  if (!a.ok) return false;
  g_api = a;  // old handle (if any) is intentionally never dlclosed
  return true;
}

static Api &api() {
  static std::once_flag once;
  std::call_once(once, [] { load(nullptr); });
  return g_api;
}

}  // namespace rtldl

namespace {

struct RtlCapture;

struct RtlDev {
  RtlCapture *owner = nullptr;
  void *dev = nullptr;
  int index = -1;
  uint32_t gain = 0;  // tenths of dB, per dongle (config-file gains)
  std::string serial;
  std::thread th;
  // bounded byte FIFO: USB callback -> assembler
  std::mutex mtx;
  std::condition_variable cv;
  std::vector<uint8_t> fifo;
  size_t fifo_cap = 0;
  std::atomic<uint64_t> dropped_blocks{0};
};

struct RtlCapture {
  BlockRing *ring = nullptr;
  std::vector<std::unique_ptr<RtlDev>> devs;  // [0] = reference channel
  std::thread assembler;
  std::atomic<bool> stop{false};
  std::atomic<bool> done{false};
  std::atomic<int> error{0};
  std::atomic<uint64_t> pushed{0};
  uint32_t chan_bytes = 0;  // 2 * block_len (one channel-block)
  uint32_t asyncbufn = 8;
  uint32_t fs = 0, fcenter = 0, gain = 0, ref_gain = 0;
  int agc = 0;
  // start barrier (common.h:151-168 analog): capture begins only once every
  // device is opened+configured, so dongles start within one async window.
  std::mutex bmtx;
  std::condition_variable bcv;
  uint32_t ready = 0;
  bool aborted = false;
};

int rtl_find_index_by_serial(const std::string &serial) {
  auto &r = rtldl::api();
  if (!r.ok) return -1;
  uint32_t n = r.get_device_count();
  char manufact[256], product[256], ser[256];
  for (uint32_t i = 0; i < n; ++i) {
    if (r.get_device_usb_strings(i, manufact, product, ser) != 0) continue;
    if (serial == ser) return static_cast<int>(i);
  }
  return -1;
}

// The reference's order-sensitive open sequence (src/crtlsdr.cc:112-135):
// samplerate -> dithering OFF (before tuning!) -> fcenter -> AGC -> tuner
// gain mode manual -> tuner gain -> zero the retained freq correction.
int rtl_open_configure(RtlDev *d, uint32_t fs, uint32_t fcenter, uint32_t gain,
                       int agc) {
  auto &r = rtldl::api();
  int idx = rtl_find_index_by_serial(d->serial);
  if (idx < 0) return -1;
  d->index = idx;
  if (r.open(&d->dev, static_cast<uint32_t>(idx)) != 0) return -2;
  if (r.set_sample_rate(d->dev, fs) != 0) return -3;
  if (r.set_dithering && r.set_dithering(d->dev, 0) != 0) return -4;
  if (r.set_center_freq(d->dev, fcenter) != 0) return -5;
  if (r.set_agc_mode && r.set_agc_mode(d->dev, agc) != 0) return -6;
  if (r.set_tuner_gain_mode && r.set_tuner_gain_mode(d->dev, 1) != 0) return -7;
  if (r.set_tuner_gain && r.set_tuner_gain(d->dev, static_cast<int>(gain)) != 0)
    return -8;
  if (r.set_sample_freq_correction_f) {
    if (r.set_sample_freq_correction_f(d->dev, 0.0f) != 0) return -9;
  } else if (r.set_freq_correction) {
    r.set_freq_correction(d->dev, 0);  // stock lib returns -2 for ppm=0: ignore
  }
  return 0;
}

void rtl_async_callback(unsigned char *buf, uint32_t len, void *ctx) {
  auto *d = static_cast<RtlDev *>(ctx);
  std::lock_guard<std::mutex> g(d->mtx);
  if (d->fifo.size() + len > d->fifo_cap) {
    // Drop OLDEST whole channel-blocks (keeps IQ framing; the time skew
    // this introduces vs other channels is the reference's documented
    // under-load stale-buffer failure, README.md:42 — visible downstream).
    size_t need = d->fifo.size() + len - d->fifo_cap;
    size_t chan = d->owner->chan_bytes;
    size_t drop = ((need + chan - 1) / chan) * chan;
    drop = std::min(drop, d->fifo.size());
    d->fifo.erase(d->fifo.begin(), d->fifo.begin() + drop);
    d->dropped_blocks.fetch_add(drop / chan, std::memory_order_relaxed);
  }
  d->fifo.insert(d->fifo.end(), buf, buf + len);
  d->cv.notify_one();
}

void rtl_device_main(RtlDev *d) {
  auto *c = d->owner;
  auto &r = rtldl::api();
  int rc = rtl_open_configure(d, c->fs, c->fcenter, d->gain, c->agc);
  {
    std::unique_lock<std::mutex> lk(c->bmtx);
    if (rc != 0) {
      c->error.store(rc);
      c->aborted = true;
    }
    c->ready++;
    c->bcv.notify_all();
    c->bcv.wait(lk, [&] { return c->ready == c->devs.size(); });
    if (c->aborted) {
      if (d->dev) r.close(d->dev);
      d->dev = nullptr;
      return;
    }
  }
  // Barrier released: start streaming (src/crtlsdr.cc:44-59).
  r.reset_buffer(d->dev);
  r.read_async(d->dev, rtl_async_callback, d, c->asyncbufn, c->chan_bytes);
  // read_async returns after rtlsdr_cancel_async (stop path).
  r.close(d->dev);
  d->dev = nullptr;
}

void rtl_assembler_main(RtlCapture *c) {
  std::vector<uint8_t> block(c->ring->block_bytes);
  uint64_t seq = 0;
  const size_t chan = c->chan_bytes;
  while (!c->stop.load(std::memory_order_relaxed)) {
    bool got_all = true;
    for (size_t i = 0; i < c->devs.size(); ++i) {
      RtlDev *d = c->devs[i].get();
      std::unique_lock<std::mutex> lk(d->mtx);
      if (!d->cv.wait_for(lk, std::chrono::milliseconds(200), [&] {
            return d->fifo.size() >= chan ||
                   c->stop.load(std::memory_order_relaxed);
          })) {
        got_all = false;
        break;
      }
      if (c->stop.load(std::memory_order_relaxed)) return;
      std::memcpy(&block[i * chan], d->fifo.data(), chan);
      d->fifo.erase(d->fifo.begin(), d->fifo.begin() + chan);
    }
    if (!got_all) continue;  // timeout tick; re-check stop
    chost_ring_push(c->ring, block.data(), ++seq);
    c->pushed.fetch_add(1, std::memory_order_relaxed);
  }
}

}  // namespace

extern "C" {

// Load librtlsdr from an explicit path (tests inject a mock here), or pass
// NULL for the default search (env COHERENT_LIBRTLSDR, then system names).
int chost_rtlsdr_load(const char *path) { return rtldl::load(path) ? 1 : 0; }

int chost_rtlsdr_available(void) { return rtldl::api().ok ? 1 : 0; }

int chost_rtlsdr_device_count(void) {
  auto &r = rtldl::api();
  return r.ok ? static_cast<int>(r.get_device_count()) : 0;
}

// USB serial string of device `idx` -> out (returns length, or -1).
int chost_rtlsdr_device_serial(uint32_t idx, char *out, int cap) {
  auto &r = rtldl::api();
  if (!r.ok) return -1;
  char manufact[256], product[256], ser[256];
  if (r.get_device_usb_strings(idx, manufact, product, ser) != 0) return -1;
  int n = static_cast<int>(std::strlen(ser));
  if (n + 1 > cap) return -1;
  std::memcpy(out, ser, n + 1);
  return n;
}

// Start a multi-dongle coherent capture: `serials_csv` is a comma-separated
// list, REFERENCE FIRST (the RingSource block layout), e.g.
// "REF0001,SIG0001,SIG0002". block_len = complex samples per channel-block
// (ring block_bytes must equal n_serials * 2 * block_len). Gains in tenths
// of dB like the reference CLI (main.cc:133-136).
void *chost_rtlsdr_capture_start(void *ring, const char *serials_csv,
                                 uint32_t block_len, uint32_t fs,
                                 uint32_t fcenter, uint32_t gain,
                                 uint32_t ref_gain, int enable_agc,
                                 uint32_t asyncbufn) {
  auto &r = rtldl::api();
  if (!r.ok || !ring || !serials_csv || block_len == 0) return nullptr;
  auto *c = new RtlCapture();
  c->ring = static_cast<BlockRing *>(ring);
  c->chan_bytes = 2 * block_len;
  c->asyncbufn = asyncbufn ? asyncbufn : 8;
  c->fs = fs;
  c->fcenter = fcenter;
  c->gain = gain;
  c->ref_gain = ref_gain;
  c->agc = enable_agc;
  std::string csv(serials_csv);
  size_t pos = 0;
  while (pos <= csv.size()) {
    size_t comma = csv.find(',', pos);
    if (comma == std::string::npos) comma = csv.size();
    std::string s = csv.substr(pos, comma - pos);
    if (!s.empty()) {
      auto d = std::make_unique<RtlDev>();
      d->owner = c;
      d->serial = s;
      d->gain = c->devs.empty() ? ref_gain : gain;
      d->fifo_cap = size_t(c->asyncbufn) * c->chan_bytes * 2;
      c->devs.push_back(std::move(d));
    }
    pos = comma + 1;
  }
  if (c->devs.empty() ||
      c->ring->block_bytes != c->devs.size() * c->chan_bytes) {
    delete c;
    return nullptr;
  }
  for (auto &d : c->devs) d->th = std::thread(rtl_device_main, d.get());
  c->assembler = std::thread(rtl_assembler_main, c);
  return c;
}

// Start variant with PER-DONGLE tuner gains (tenths of dB, reference
// first, comma-separated, exactly one per serial) — the per-channel gain
// configuration the reference left as future work (examplecfg/four.cfg:4).
// Gains must be known before the order-sensitive open sequence runs, so
// they are a start parameter, not a setter.
void *chost_rtlsdr_capture_start_gains(void *ring, const char *serials_csv,
                                       const char *gains_csv,
                                       uint32_t block_len, uint32_t fs,
                                       uint32_t fcenter, int enable_agc,
                                       uint32_t asyncbufn) {
  auto &r = rtldl::api();
  if (!r.ok || !ring || !serials_csv || !gains_csv || block_len == 0)
    return nullptr;
  std::vector<uint32_t> gains;
  {
    std::string gcsv(gains_csv);
    size_t pos = 0;
    while (pos <= gcsv.size()) {
      size_t comma = gcsv.find(',', pos);
      if (comma == std::string::npos) comma = gcsv.size();
      std::string s = gcsv.substr(pos, comma - pos);
      if (!s.empty()) gains.push_back(static_cast<uint32_t>(std::atoi(s.c_str())));
      pos = comma + 1;
    }
  }
  auto *c = new RtlCapture();
  c->ring = static_cast<BlockRing *>(ring);
  c->chan_bytes = 2 * block_len;
  c->asyncbufn = asyncbufn ? asyncbufn : 8;
  c->fs = fs;
  c->fcenter = fcenter;
  c->agc = enable_agc;
  std::string csv(serials_csv);
  size_t pos = 0;
  while (pos <= csv.size()) {
    size_t comma = csv.find(',', pos);
    if (comma == std::string::npos) comma = csv.size();
    std::string s = csv.substr(pos, comma - pos);
    if (!s.empty()) {
      auto d = std::make_unique<RtlDev>();
      d->owner = c;
      d->serial = s;
      d->gain = c->devs.size() < gains.size() ? gains[c->devs.size()] : 500;
      d->fifo_cap = size_t(c->asyncbufn) * c->chan_bytes * 2;
      c->devs.push_back(std::move(d));
    }
    pos = comma + 1;
  }
  if (c->devs.empty() || c->devs.size() != gains.size() ||
      c->ring->block_bytes != c->devs.size() * c->chan_bytes) {
    delete c;
    return nullptr;
  }
  for (auto &d : c->devs) d->th = std::thread(rtl_device_main, d.get());
  c->assembler = std::thread(rtl_assembler_main, c);
  return c;
}

uint64_t chost_rtlsdr_capture_pushed(void *cv) {
  return cv ? static_cast<RtlCapture *>(cv)->pushed.load() : 0;
}

// Negative open/config rc of the first failing device (0 = healthy).
int chost_rtlsdr_capture_error(void *cv) {
  return cv ? static_cast<RtlCapture *>(cv)->error.load() : 0;
}

int chost_rtlsdr_capture_running(void *cv) {
  if (!cv) return 0;
  auto *c = static_cast<RtlCapture *>(cv);
  return (c->done.load() || c->aborted) ? 0 : 1;
}

uint64_t chost_rtlsdr_capture_dropped(void *cv) {
  if (!cv) return 0;
  auto *c = static_cast<RtlCapture *>(cv);
  uint64_t n = 0;
  for (auto &d : c->devs) n += d->dropped_blocks.load();
  return n;
}

// Hardware resampler skew — the reference control loop's actuator
// (ccontrol.cc:78-123 via rtlsdr_set_sample_freq_correction_f). ch 0 = the
// reference dongle (never skewed by the reference; exposed anyway).
// Returns -1 when the fork extension is absent or the device is down.
int chost_rtlsdr_capture_set_correction_f(void *cv, uint32_t ch, float ppm) {
  auto &r = rtldl::api();
  auto *c = static_cast<RtlCapture *>(cv);
  if (!c || ch >= c->devs.size()) return -1;
  RtlDev *d = c->devs[ch].get();
  if (!r.set_sample_freq_correction_f || !d->dev) return -1;
  return r.set_sample_freq_correction_f(d->dev, ppm);
}

// Retune every dongle (console `fcenter` semantics, console.cc:176-201) —
// dithering is re-disabled before each tune (src/crtlsdr.cc:142-146).
int chost_rtlsdr_capture_set_fcenter(void *cv, uint32_t hz) {
  auto &r = rtldl::api();
  auto *c = static_cast<RtlCapture *>(cv);
  if (!c) return -1;
  int rc = 0;
  for (auto &d : c->devs) {
    if (!d->dev) return -1;
    if (r.set_dithering) r.set_dithering(d->dev, 0);
    if (r.set_center_freq(d->dev, hz) != 0) rc = -1;
  }
  if (rc == 0) c->fcenter = hz;
  return rc;
}

void chost_rtlsdr_capture_stop(void *cv) {
  auto *c = static_cast<RtlCapture *>(cv);
  if (!c) return;
  auto &r = rtldl::api();
  c->stop.store(true);
  for (auto &d : c->devs) {
    if (d->dev && r.cancel_async) r.cancel_async(d->dev);
    d->cv.notify_all();
  }
  for (auto &d : c->devs)
    if (d->th.joinable()) d->th.join();
  if (c->assembler.joinable()) c->assembler.join();
  c->done.store(true);
  delete c;
}

}  // extern "C"
