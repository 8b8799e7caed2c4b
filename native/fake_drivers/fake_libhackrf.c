/* fake_libhackrf — ABI-compatible libhackrf stand-in for full-CLI e2e
 * tests (loaded by the REAL HackRfInput ctypes path via
 * IQTOOL_HACKRF_LIB).  hackrf_start_rx spawns a thread that drives the
 * RX callback with cs8 tone transfers, matching libhackrf's
 * libusb-async delivery (reference analog: input_hackrf.c:186-219).
 * The stream keeps delivering until hackrf_stop_rx (or the callback
 * returns nonzero) — like real hardware, it never ends on its own, so
 * the e2e bounds the run with SIGTERM (the reference's Ctrl-C path).
 *
 * build: gcc -shared -fPIC -O2 -o libhackrf.so fake_libhackrf.c -lm -lpthread
 */

#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#define FAKE_HZ 100000.0
#define XFER_BYTES (64 * 1024)

typedef struct hackrf_transfer {
    void *device;
    unsigned char *buffer;
    int buffer_length;
    int valid_length;
    void *rx_ctx;
    void *tx_ctx;
} hackrf_transfer;

typedef int (*rx_cb_t)(hackrf_transfer *);

typedef struct {
    double rate;
    uint64_t freq;
    int lna, vga, amp, ant;
    volatile int stop;
    long delivered;
    rx_cb_t cb;
    void *ctx;
    pthread_t thread;
    int thread_live;
} fake_dev;

static fake_dev g_dev;

int hackrf_init(void) { return 0; }
int hackrf_exit(void) { return 0; }

int hackrf_open(void **out) {
    memset(&g_dev, 0, sizeof(g_dev));
    g_dev.rate = 10e6;
    *out = &g_dev;
    return 0;
}

int hackrf_close(void *d) { (void)d; return 0; }
int hackrf_set_sample_rate(void *d, double r) { (void)d; g_dev.rate = r; return 0; }
int hackrf_set_freq(void *d, uint64_t f) { (void)d; g_dev.freq = f; return 0; }
int hackrf_set_lna_gain(void *d, int g) { (void)d; g_dev.lna = g; return 0; }
int hackrf_set_vga_gain(void *d, int g) { (void)d; g_dev.vga = g; return 0; }
int hackrf_set_amp_enable(void *d, int on) { (void)d; g_dev.amp = on; return 0; }
int hackrf_set_antenna_enable(void *d, int on) { (void)d; g_dev.ant = on; return 0; }

static void *rx_thread(void *arg) {
    (void)arg;
    unsigned char buf[XFER_BYTES];
    hackrf_transfer t;
    memset(&t, 0, sizeof(t));
    t.device = &g_dev;
    t.buffer = buf;
    t.buffer_length = XFER_BYTES;
    while (!g_dev.stop) {
        long frames = XFER_BYTES / 2;
        double w = 2.0 * M_PI * FAKE_HZ / g_dev.rate;
        for (long i = 0; i < frames; i++) {
            double ph = w * (double)(g_dev.delivered + i);
            buf[2 * i] = (unsigned char)(int8_t)lround(0.45 * 127.0 * cos(ph));
            buf[2 * i + 1] = (unsigned char)(int8_t)lround(0.45 * 127.0 * sin(ph));
        }
        g_dev.delivered += frames;
        t.valid_length = (int)(frames * 2);
        if (g_dev.cb(&t) != 0)
            break;
        /* pace roughly at the sample rate so the host sees a realtime-
         * like stream instead of an unbounded burst */
        usleep((useconds_t)(1e6 * frames / g_dev.rate));
    }
    return NULL;
}

int hackrf_start_rx(void *d, rx_cb_t cb, void *ctx) {
    (void)d;
    g_dev.cb = cb;
    g_dev.ctx = ctx;
    g_dev.stop = 0;
    if (pthread_create(&g_dev.thread, NULL, rx_thread, NULL) != 0)
        return -1;
    g_dev.thread_live = 1;
    return 0;
}

int hackrf_stop_rx(void *d) {
    (void)d;
    g_dev.stop = 1;
    if (g_dev.thread_live) {
        pthread_join(g_dev.thread, NULL);
        g_dev.thread_live = 0;
    }
    return 0;
}
