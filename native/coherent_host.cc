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
