/* fake_libbladerf — ABI-compatible libbladeRF stand-in for full-CLI e2e
 * tests (loaded by the REAL BladeRfInput ctypes path via
 * IQTOOL_BLADERF_LIB).  bladerf_sync_rx synthesizes a deterministic
 * sc16q11 (12-bit) tone and returns -1 after FAKE_BLADERF_FRAMES frames
 * (stream end), exercising the sync-RX loop, adaptive stream profile
 * configuration, and teardown (reference analog: input_bladerf.c sync
 * interface).
 *
 * build: gcc -shared -fPIC -O2 -o libbladeRF.so fake_libbladerf.c -lm
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#define FAKE_HZ 100000.0

typedef struct {
    uint64_t integer, num, den;
} bladerf_rational_rate;

typedef struct {
    long delivered, total;
    double rate;
    uint64_t freq;
    int gain_mode, gain, bias, module_on;
    int sync_fmt, num_buffers, buffer_size, num_transfers;
} fake_dev;

static fake_dev g_dev;

int bladerf_open(void **out, const char *ident) {
    (void)ident;
    memset(&g_dev, 0, sizeof(g_dev));
    const char *n = getenv("FAKE_BLADERF_FRAMES");
    g_dev.total = n ? atol(n) : (1L << 19);
    g_dev.rate = 2000000.0;
    *out = &g_dev;
    return 0;
}

int bladerf_close(void *d) { (void)d; return 0; }

/* FPGA state machine (input_bladerf.c:334-347, 794-894 counterpart):
 * FAKE_BLADERF_FPGA_CONFIGURED=0 makes the device report an unloaded
 * FPGA, FAKE_BLADERF_FPGA_SIZE picks the bladerf_fpga_size enum value
 * (default 301 = BLADERF_FPGA_A9), and a successful bladerf_load_fpga
 * flips the configured flag and appends the loaded path to
 * FAKE_BLADERF_FPGA_LOG so tests can assert which file was chosen. */
static int g_fpga_configured = -2;   /* -2 = read env on first use */

static int fpga_configured_init(void) {
    if (g_fpga_configured == -2) {
        const char *v = getenv("FAKE_BLADERF_FPGA_CONFIGURED");
        g_fpga_configured = v ? atoi(v) : 1;
    }
    return g_fpga_configured;
}

int bladerf_is_fpga_configured(void *d) {
    (void)d;
    return fpga_configured_init();
}

int bladerf_get_fpga_size(void *d, int *size) {
    (void)d;
    const char *v = getenv("FAKE_BLADERF_FPGA_SIZE");
    *size = v ? atoi(v) : 301;
    return 0;
}

int bladerf_load_fpga(void *d, const char *f) {
    (void)d;
    if (!f || access(f, R_OK) != 0)
        return -1;                           /* unreadable bitstream */
    const char *logp = getenv("FAKE_BLADERF_FPGA_LOG");
    if (logp) {
        FILE *fp = fopen(logp, "a");
        if (fp) { fprintf(fp, "%s\n", f); fclose(fp); }
    }
    fpga_configured_init();
    g_fpga_configured = 1;
    return 0;
}
int bladerf_enable_feature(void *d, int feat, int on) { (void)d; (void)feat; (void)on; return 0; }

int bladerf_set_sample_rate(void *d, int ch, unsigned rate, unsigned *actual) {
    (void)d; (void)ch;
    g_dev.rate = rate;
    if (actual) *actual = rate;
    return 0;
}

int bladerf_set_rational_sample_rate(void *d, int ch,
                                     bladerf_rational_rate *want,
                                     bladerf_rational_rate *got) {
    (void)d; (void)ch;
    if (got) *got = *want;
    g_dev.rate = (double)want->integer + (double)want->num / (double)want->den;
    return 0;
}

int bladerf_set_frequency(void *d, int ch, uint64_t f) { (void)d; (void)ch; g_dev.freq = f; return 0; }
int bladerf_set_bandwidth(void *d, int ch, unsigned bw, unsigned *actual) { (void)d; (void)ch; (void)bw; (void)actual; return 0; }
int bladerf_set_gain_mode(void *d, int ch, int m) { (void)d; (void)ch; g_dev.gain_mode = m; return 0; }
int bladerf_set_gain(void *d, int ch, int g) { (void)d; (void)ch; g_dev.gain = g; return 0; }
int bladerf_set_bias_tee(void *d, int ch, int on) { (void)d; (void)ch; g_dev.bias = on; return 0; }

int bladerf_sync_config(void *d, int layout, int fmt, unsigned nb,
                        unsigned bs, unsigned nt, unsigned timeout_ms) {
    (void)d; (void)layout; (void)timeout_ms;
    g_dev.sync_fmt = fmt;
    g_dev.num_buffers = (int)nb;
    g_dev.buffer_size = (int)bs;
    g_dev.num_transfers = (int)nt;
    return 0;
}

int bladerf_enable_module(void *d, int ch, int on) { (void)d; (void)ch; g_dev.module_on = on; return 0; }

int bladerf_sync_rx(void *d, void *samples, unsigned n, void *meta,
                    unsigned timeout_ms) {
    (void)d; (void)meta; (void)timeout_ms;
    if (g_dev.delivered >= g_dev.total)
        return -1;                          /* stream end */
    long frames = n;
    if (frames > g_dev.total - g_dev.delivered)
        frames = g_dev.total - g_dev.delivered;
    double w = 2.0 * M_PI * FAKE_HZ / g_dev.rate;
    int16_t *s = (int16_t *)samples;
    for (long i = 0; i < frames; i++) {
        double ph = w * (double)(g_dev.delivered + i);
        s[2 * i] = (int16_t)lround(0.45 * 2047.0 * cos(ph));
        s[2 * i + 1] = (int16_t)lround(0.45 * 2047.0 * sin(ph));
    }
    /* short final read: zero the remainder (the real API fills n or
     * times out; the module trusts n frames) */
    for (long i = frames; i < (long)n; i++) {
        s[2 * i] = 0;
        s[2 * i + 1] = 0;
    }
    g_dev.delivered += frames;
    return 0;
}
