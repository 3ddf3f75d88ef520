/* Hardware-free mock of the librtlsdr C ABI (tejeez coherent-rtlsdr fork
 * surface: stock symbols + rtlsdr_set_dithering +
 * rtlsdr_set_sample_freq_correction_f) used to verify the native capture
 * runtime's behavior without dongles — above all the ORDER-SENSITIVE open
 * sequence the real hardware demands (reference: src/crtlsdr.cc:112-135,
 * "dithering off MUST PRECEDE THE TUNING FREQ CALL").
 *
 * Every call appends a "<devidx> <fn> <arg>" line to the file named by env
 * MOCK_RTLSDR_LOG. rtlsdr_read_async() synthesizes a deterministic
 * per-device byte pattern (byte j of the stream = idx*37 + (j & 0x7f)) so
 * tests can verify channel->slot mapping in assembled ring blocks.
 *
 * Built at test time: gcc -shared -fPIC -O2 -o libmock_rtlsdr.so mock_librtlsdr.c
 */

#include <stdatomic.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#define NDEV 4
static const char *SERIALS[NDEV] = {"MOCKREF0", "MOCK0001", "MOCK0002",
                                    "MOCK0003"};

typedef struct {
  uint32_t idx;
  atomic_int cancel;
} mockdev;

static void lg(int idx, const char *fn, long arg) {
  const char *path = getenv("MOCK_RTLSDR_LOG");
  if (!path) return;
  FILE *f = fopen(path, "a");
  if (!f) return;
  fprintf(f, "%d %s %ld\n", idx, fn, arg);
  fclose(f);
}

uint32_t rtlsdr_get_device_count(void) { return NDEV; }

int rtlsdr_get_device_usb_strings(uint32_t idx, char *manufact, char *product,
                                  char *serial) {
  if (idx >= NDEV) return -1;
  if (manufact) strcpy(manufact, "MockMfg");
  if (product) strcpy(product, "MockSDR");
  if (serial) strcpy(serial, SERIALS[idx]);
  return 0;
}

int rtlsdr_open(void **dev, uint32_t idx) {
  if (idx >= NDEV) return -1;
  mockdev *d = (mockdev *)calloc(1, sizeof(mockdev));
  d->idx = idx;
  *dev = d;
  lg((int)idx, "open", 0);
  return 0;
}

int rtlsdr_close(void *dev) {
  mockdev *d = (mockdev *)dev;
  lg((int)d->idx, "close", 0);
  free(d);
  return 0;
}

/* Failure injection (checked per call so tests can toggle after start):
 *   MOCK_RTLSDR_FAIL_FS=<idx>    set_sample_rate fails on device <idx>
 *   MOCK_RTLSDR_FAIL_TUNE=<idx>  set_center_freq fails on device <idx>
 */
static int env_is(const char *name, int idx) {
  const char *v = getenv(name);
  return v && atoi(v) == idx;
}

int rtlsdr_set_sample_rate(void *dev, uint32_t fs) {
  int idx = (int)((mockdev *)dev)->idx;
  lg(idx, "set_sample_rate", (long)fs);
  return env_is("MOCK_RTLSDR_FAIL_FS", idx) ? -1 : 0;
}

int rtlsdr_set_center_freq(void *dev, uint32_t f) {
  int idx = (int)((mockdev *)dev)->idx;
  lg(idx, "set_center_freq", (long)f);
  return env_is("MOCK_RTLSDR_FAIL_TUNE", idx) ? -1 : 0;
}

int rtlsdr_set_agc_mode(void *dev, int on) {
  lg((int)((mockdev *)dev)->idx, "set_agc_mode", on);
  return 0;
}

int rtlsdr_set_tuner_gain_mode(void *dev, int manual) {
  lg((int)((mockdev *)dev)->idx, "set_tuner_gain_mode", manual);
  return 0;
}

int rtlsdr_set_tuner_gain(void *dev, int gain) {
  lg((int)((mockdev *)dev)->idx, "set_tuner_gain", gain);
  return 0;
}

int rtlsdr_set_freq_correction(void *dev, int ppm) {
  lg((int)((mockdev *)dev)->idx, "set_freq_correction", ppm);
  return ppm == 0 ? -2 /* stock librtlsdr quirk: 0 -> "already 0" */ : 0;
}

/* tejeez fork extensions */
int rtlsdr_set_dithering(void *dev, int dither) {
  lg((int)((mockdev *)dev)->idx, "set_dithering", dither);
  return 0;
}

int rtlsdr_set_sample_freq_correction_f(void *dev, float corr) {
  /* corr is a dimensionless fraction (~1e-4 scale); log nano-units so
   * tests can assert the tanh-law values. */
  lg((int)((mockdev *)dev)->idx, "set_sample_freq_correction_f",
     (long)(corr * 1e9f));
  return 0;
}

int rtlsdr_reset_buffer(void *dev) {
  lg((int)((mockdev *)dev)->idx, "reset_buffer", 0);
  return 0;
}

typedef void (*rtlsdr_read_async_cb_t)(unsigned char *buf, uint32_t len,
                                       void *ctx);

/* Fault-injection knobs (read per block so tests can set them pre-start):
 *   MOCK_RTLSDR_FAST=<idx>       device <idx> streams 10x faster than the
 *                                rest -> its consumer-side FIFO overflows
 *                                (per-channel drop/seqnum-gap tests)
 *   MOCK_RTLSDR_STALL=<idx>      device <idx> goes silent for 500 ms before
 *                                its 6th block (two-pass no-skew tests)
 *   MOCK_RTLSDR_DIE_AFTER=<n>    read_async returns on its own after n
 *                                blocks on every device (USB-death tests)
 */
static long env_long(const char *name, long dflt) {
  const char *v = getenv(name);
  return v ? atol(v) : dflt;
}

int rtlsdr_read_async(void *dev, rtlsdr_read_async_cb_t cb, void *ctx,
                      uint32_t buf_num, uint32_t buf_len) {
  mockdev *d = (mockdev *)dev;
  (void)buf_num;
  lg((int)d->idx, "read_async", (long)buf_len);
  unsigned char *buf = (unsigned char *)malloc(buf_len);
  uint64_t k = 0, nblocks = 0;
  while (!atomic_load(&d->cancel)) {
    if (env_long("MOCK_RTLSDR_DIE_AFTER", -1) >= 0 &&
        nblocks >= (uint64_t)env_long("MOCK_RTLSDR_DIE_AFTER", -1))
      break; /* simulate spontaneous USB death: async read just returns */
    if (env_long("MOCK_RTLSDR_STALL", -1) == (long)d->idx && nblocks == 5)
      usleep(500000);
    for (uint32_t i = 0; i < buf_len; ++i)
      buf[i] = (unsigned char)(d->idx * 37 + ((k + i) & 0x7f));
    cb(buf, buf_len, ctx);
    k += buf_len;
    nblocks++;
    usleep(env_long("MOCK_RTLSDR_FAST", -1) == (long)d->idx ? 200 : 2000);
  }
  free(buf);
  lg((int)d->idx, "read_async_exit", 0);
  return 0;
}

int rtlsdr_cancel_async(void *dev) {
  mockdev *d = (mockdev *)dev;
  atomic_store(&d->cancel, 1);
  lg((int)d->idx, "cancel_async", 0);
  return 0;
}
