/* fake_libsdrplay — ABI-compatible sdrplay_api 3.x service stand-in for
 * full-CLI e2e tests (loaded by the REAL SdrPlayInput ctypes path via
 * IQTOOL_SDRPLAY_API_LIB).  Struct layouts mirror
 * iq_tool_tpu/modules/sdrplay_api.py (which mirrors the vendor 3.x
 * headers).  sdrplay_api_Init spawns a thread that drives StreamACbFn
 * with PLANAR short xi/xq tone packets (the API's native delivery,
 * input_sdrplay.c:433-437), fires one mid-stream reset (discontinuity
 * propagation) and one power-overload detect/correct pair (ack via
 * sdrplay_api_Update), then ends the stream with DeviceRemoved after
 * FAKE_SDRPLAY_FRAMES frames (clean EOS path).
 *
 * build: gcc -shared -fPIC -O2 -o libsdrplay_api.so fake_libsdrplay.c -lm -lpthread
 */

#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#define FAKE_HZ 100000.0
#define PKT 2048

/* ---- struct layouts (subset, matching modules/sdrplay_api.py) ---------- */

typedef struct {
    char SerNo[64];
    unsigned char hwVer;
    int tuner;
    int rspDuoMode;
    unsigned char valid;
    double rspDuoSampleFreq;
    void *dev;
} DeviceT;

typedef struct { double fsHz; unsigned char syncUpdate, reCal; } FsFreqT;
typedef struct { unsigned sampleNum, period; } SyncUpdateT;
typedef struct { unsigned char a, b, c; } ResetFlagsT;
typedef struct { unsigned char a, b; } Rsp1aParamsT;
typedef struct { unsigned char a; } Rsp2ParamsT;
typedef struct { int a; } RspDuoParamsT;
typedef struct { unsigned char hdrEnable, biasTEnable; int antennaSel;
                 unsigned char rfNotchEnable, rfDabNotchEnable; } RspDxParamsT;

typedef struct {
    double ppm;
    FsFreqT fsFreq;
    SyncUpdateT syncUpdate;
    ResetFlagsT resetFlags;
    int mode;
    unsigned samplesPerPkt;
    Rsp1aParamsT rsp1aParams;
    Rsp2ParamsT rsp2Params;
    RspDuoParamsT rspDuoParams;
    RspDxParamsT rspDxParams;
} DevParamsT;

typedef struct { float curr, max, min; } GainValuesT;
typedef struct { int gRdB; unsigned char LNAstate, syncUpdate;
                 int minGr; GainValuesT gainVals; } GainT;
typedef struct { double rfHz; unsigned char syncUpdate; } RfFreqT;
typedef struct { unsigned char dcCal, speedUp; int trackTime,
                 refreshRateTime; } DcOffsetTunerT;
typedef struct { int bwType, ifType, loMode; GainT gain; RfFreqT rfFreq;
                 DcOffsetTunerT dcOffsetTuner; } TunerParamsT;
typedef struct { unsigned char DCenable, IQenable; } DcOffsetT;
typedef struct { unsigned char enable, decimationFactor,
                 wideBandSignal; } DecimationT;
typedef struct { int enable, setPoint_dBfs;
                 unsigned short attack_ms, decay_ms, decay_delay_ms,
                 decay_threshold_dB; int syncUpdate; } AgcT;
typedef struct { unsigned char biasTEnable; } Rsp1aTunerParamsT;
typedef struct { unsigned char biasTEnable; int amPortSel, antennaSel;
                 unsigned char rfNotchEnable; } Rsp2TunerParamsT;
typedef struct { unsigned char biasTEnable; int tuner1AmPortSel;
                 unsigned char tuner1AmNotchEnable, rfNotchEnable,
                 rfDabNotchEnable; } RspDuoTunerParamsT;
typedef struct { int hdrBw; } RspDxTunerParamsT;
typedef struct { DcOffsetT dcOffset; DecimationT decimation; AgcT agc;
                 int adsbMode; } CtrlParamsT;
typedef struct {
    TunerParamsT tunerParams;
    CtrlParamsT ctrlParams;
    Rsp1aTunerParamsT rsp1aTunerParams;
    Rsp2TunerParamsT rsp2TunerParams;
    RspDuoTunerParamsT rspDuoTunerParams;
    RspDxTunerParamsT rspDxTunerParams;
} RxChannelParams;

typedef struct {
    DevParamsT *devParams;
    RxChannelParams *rxChannelA;
    RxChannelParams *rxChannelB;
} DeviceParamsT;

typedef struct { unsigned firstSampleNum; int grChanged, rfChanged,
                 fsChanged; unsigned numSamples; } StreamCbParamsT;
typedef struct { int powerOverloadChangeType; } PowerOverloadCbParamT;
typedef union { PowerOverloadCbParamT powerOverloadParams;
                char _pad[32]; } EventParamsT;

typedef void (*stream_cb_t)(short *, short *, StreamCbParamsT *,
                            unsigned, unsigned, void *);
typedef void (*event_cb_t)(int, int, EventParamsT *, void *);
typedef struct { stream_cb_t StreamACbFn, StreamBCbFn;
                 event_cb_t EventCbFn; } CallbackFnsT;

/* ------------------------------- state ---------------------------------- */

static DevParamsT g_devp;
static RxChannelParams g_rxa;
static DeviceParamsT g_params;
static CallbackFnsT g_cbs;
static void *g_ctx;
static volatile int g_stop;
static pthread_t g_thread;
static int g_thread_live;
static long g_total;
static unsigned g_acks;

#define EVT_POWER_OVERLOAD 1
#define EVT_DEVICE_REMOVED 2

int sdrplay_api_Open(void) { return 0; }
int sdrplay_api_Close(void) { return 0; }

const char *sdrplay_api_GetErrorString(int err) {
    return err == 0 ? "Success" : "Fail";
}

int sdrplay_api_GetDevices(DeviceT *devs, unsigned *n, unsigned max) {
    if (max < 1) { *n = 0; return 0; }
    memset(&devs[0], 0, sizeof(DeviceT));
    strcpy(devs[0].SerNo, "FAKE0001");
    devs[0].hwVer = 255;                 /* RSP1A */
    devs[0].tuner = 1;                   /* Tuner_A */
    devs[0].valid = 1;
    *n = 1;
    return 0;
}

int sdrplay_api_SelectDevice(DeviceT *dev) {
    dev->dev = (void *)0xFA4E;
    return 0;
}

int sdrplay_api_ReleaseDevice(DeviceT *dev) { (void)dev; return 0; }
int sdrplay_api_LockDeviceApi(void) { return 0; }
int sdrplay_api_UnlockDeviceApi(void) { return 0; }

int sdrplay_api_GetDeviceParams(void *h, DeviceParamsT **out) {
    (void)h;
    memset(&g_devp, 0, sizeof(g_devp));
    memset(&g_rxa, 0, sizeof(g_rxa));
    g_devp.fsFreq.fsHz = 2000000.0;
    g_devp.samplesPerPkt = PKT;
    g_params.devParams = &g_devp;
    g_params.rxChannelA = &g_rxa;
    g_params.rxChannelB = NULL;
    *out = &g_params;
    return 0;
}

int sdrplay_api_Update(void *h, int tuner, unsigned reason, unsigned ext1) {
    (void)h; (void)tuner; (void)ext1;
    if (reason == 0x04000000u)           /* Ctrl_OverloadMsgAck */
        g_acks++;
    return 0;
}

static void *stream_thread(void *arg) {
    (void)arg;
    short xi[PKT], xq[PKT];
    StreamCbParamsT p;
    EventParamsT ev;
    long delivered = 0;
    double rate = g_devp.fsFreq.fsHz;
    long reset_at = g_total / 3, overload_at = g_total / 2;
    int reset_done = 0, overload_done = 0;
    while (!g_stop && delivered < g_total) {
        long frames = PKT;
        if (frames > g_total - delivered) frames = g_total - delivered;
        double w = 2.0 * M_PI * FAKE_HZ / rate;
        for (long i = 0; i < frames; i++) {
            double ph = w * (double)(delivered + i);
            xi[i] = (short)lround(0.45 * 32767.0 * cos(ph));
            xq[i] = (short)lround(0.45 * 32767.0 * sin(ph));
        }
        memset(&p, 0, sizeof(p));
        p.numSamples = (unsigned)frames;
        unsigned reset = 0;
        if (!reset_done && delivered >= reset_at) {
            reset = 1;                    /* stream reset -> discontinuity */
            reset_done = 1;
        }
        g_cbs.StreamACbFn(xi, xq, &p, (unsigned)frames, reset, g_ctx);
        if (!overload_done && delivered >= overload_at) {
            overload_done = 1;
            memset(&ev, 0, sizeof(ev));
            ev.powerOverloadParams.powerOverloadChangeType = 0; /* detected */
            g_cbs.EventCbFn(EVT_POWER_OVERLOAD, 1, &ev, g_ctx);
            ev.powerOverloadParams.powerOverloadChangeType = 1; /* corrected */
            g_cbs.EventCbFn(EVT_POWER_OVERLOAD, 1, &ev, g_ctx);
        }
        delivered += frames;
        usleep((useconds_t)(1e6 * frames / rate / 4));  /* 4x realtime */
    }
    memset(&ev, 0, sizeof(ev));
    g_cbs.EventCbFn(EVT_DEVICE_REMOVED, 1, &ev, g_ctx);   /* clean EOS */
    return NULL;
}

int sdrplay_api_Init(void *h, CallbackFnsT *cbs, void *ctx) {
    (void)h;
    g_cbs = *cbs;
    g_ctx = ctx;
    g_stop = 0;
    const char *n = getenv("FAKE_SDRPLAY_FRAMES");
    g_total = n ? atol(n) : (1L << 19);
    if (pthread_create(&g_thread, NULL, stream_thread, NULL) != 0)
        return 3;                        /* Fail */
    g_thread_live = 1;
    return 0;
}

int sdrplay_api_Uninit(void *h) {
    (void)h;
    g_stop = 1;
    if (g_thread_live) {
        pthread_join(g_thread, NULL);
        g_thread_live = 0;
    }
    return 0;
}
