/* fake_librtlsdr — an ABI-compatible librtlsdr stand-in for full-CLI
 * end-to-end tests on hosts with no radio hardware (the same role the
 * protocol-faithful fake SpyServer plays for the network input).
 *
 * The REAL RtlSdrInput ctypes path (iq_tool_tpu/modules/input_sdr.py)
 * loads this via IQTOOL_RTLSDR_LIB and drives the exact call sequence it
 * would issue against the vendor library (reference analog:
 * input_rtlsdr.c:295-372 sync-read loop).  rtlsdr_read_sync() synthesizes
 * a deterministic cu8 complex tone:
 *
 *   I[i] = lround(127.5 + 0.45*128*cos(2*pi*FAKE_HZ*i/rate))
 *   Q[i] = likewise with sin
 *
 * for FAKE_RTLSDR_FRAMES frames (env, default 2^19), then returns -1
 * (stream end).  rtlsdr_cancel_async() makes the next read fail, matching
 * the unblock-then-join teardown contract.
 *
 * build: gcc -shared -fPIC -O2 -o librtlsdr.so fake_librtlsdr.c -lm
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define FAKE_HZ 100000.0

typedef struct {
    long delivered, total;
    int cancel;
    uint32_t rate, freq;
    int gain_mode, gain_tenths, ppm, direct_sampling, bias_t;
} fake_dev;

static fake_dev g_dev;

int rtlsdr_open(void **out, uint32_t idx) {
    (void)idx;
    memset(&g_dev, 0, sizeof(g_dev));
    const char *n = getenv("FAKE_RTLSDR_FRAMES");
    g_dev.total = n ? atol(n) : (1L << 19);
    g_dev.rate = 2400000;
    *out = &g_dev;
    return 0;
}

int rtlsdr_set_sample_rate(void *d, uint32_t r) { (void)d; g_dev.rate = r; return 0; }
int rtlsdr_set_center_freq(void *d, uint32_t f) { (void)d; g_dev.freq = f; return 0; }
int rtlsdr_set_freq_correction(void *d, int p) { (void)d; g_dev.ppm = p; return 0; }
int rtlsdr_set_tuner_gain_mode(void *d, int m) { (void)d; g_dev.gain_mode = m; return 0; }
int rtlsdr_set_tuner_gain(void *d, int g) { (void)d; g_dev.gain_tenths = g; return 0; }
int rtlsdr_set_direct_sampling(void *d, int m) { (void)d; g_dev.direct_sampling = m; return 0; }
int rtlsdr_set_bias_tee(void *d, int on) { (void)d; g_dev.bias_t = on; return 0; }
int rtlsdr_reset_buffer(void *d) { (void)d; return 0; }
int rtlsdr_cancel_async(void *d) { (void)d; g_dev.cancel = 1; return 0; }
int rtlsdr_close(void *d) { (void)d; return 0; }

int rtlsdr_read_sync(void *d, unsigned char *buf, int len, int *n_read) {
    (void)d;
    if (g_dev.cancel || g_dev.delivered >= g_dev.total) {
        *n_read = 0;
        return -1;
    }
    long frames = len / 2;
    if (frames > g_dev.total - g_dev.delivered)
        frames = g_dev.total - g_dev.delivered;
    double w = 2.0 * M_PI * FAKE_HZ / (double)g_dev.rate;
    for (long i = 0; i < frames; i++) {
        double ph = w * (double)(g_dev.delivered + i);
        buf[2 * i] = (unsigned char)lround(127.5 + 0.45 * 128.0 * cos(ph));
        buf[2 * i + 1] = (unsigned char)lround(127.5 + 0.45 * 128.0 * sin(ph));
    }
    g_dev.delivered += frames;
    *n_read = (int)(frames * 2);
    return 0;
}
