// Native ingest runtime: format conversion + bounded sample ring.
//
// The reference's device layer runs a dedicated thread converting CF32
// stream reads into batches pushed through bounded blocking queues
// (ref: src/sdr/SoapySDRThread.cpp:195-433 readStream/readLoop,
// src/util/ThreadBlockingQueue.h). This is its TPU-host equivalent: tight
// SIMD-friendly conversion loops from wire formats into the PLANAR float32
// layout the device consumes, plus a mutex-guarded ring buffer providing
// the same bounded back-pressure semantics (try_push shedding when full,
// ref: SoapySDRThread.cpp:384-399).
//
// Built as a shared library, bound via ctypes (cubicsdr_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

extern "C" {

// ---- wire-format conversions into planar float32 ----

void cs_deinterleave_cf32(const float* in, int64_t n, float* re, float* im) {
    for (int64_t i = 0; i < n; ++i) {
        re[i] = in[2 * i];
        im[i] = in[2 * i + 1];
    }
}

void cs_convert_cs16(const int16_t* in, int64_t n, float* re, float* im) {
    const float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) {
        re[i] = in[2 * i] * k;
        im[i] = in[2 * i + 1] * k;
    }
}

void cs_convert_cs8(const int8_t* in, int64_t n, float* re, float* im) {
    const float k = 1.0f / 128.0f;
    for (int64_t i = 0; i < n; ++i) {
        re[i] = in[2 * i] * k;
        im[i] = in[2 * i + 1] * k;
    }
}

void cs_convert_cu8(const uint8_t* in, int64_t n, float* re, float* im) {
    const float k = 1.0f / 127.5f;
    for (int64_t i = 0; i < n; ++i) {
        re[i] = (in[2 * i] - 127.5f) * k;
        im[i] = (in[2 * i + 1] - 127.5f) * k;
    }
}

// Audio float32 [-1,1] -> int16 PCM (WAV writer hot loop,
// ref: src/audio/AudioFileWAV.cpp write path).
void cs_float_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        out[i] = (int16_t)(v * 32767.0f);
    }
}

// ---- bounded planar sample ring (ThreadBlockingQueue + ReBuffer role) ----

struct Ring {
    std::vector<float> re, im;
    int64_t cap = 0;
    int64_t head = 0;   // read position
    int64_t size = 0;   // valid samples
    int64_t dropped = 0;
    std::mutex mu;
};

void* cs_ring_create(int64_t capacity) {
    Ring* r = new Ring();
    r->cap = capacity;
    r->re.resize(capacity);
    r->im.resize(capacity);
    return r;
}

void cs_ring_destroy(void* h) { delete (Ring*)h; }

// try_push semantics: if there is not enough room, the whole batch is
// dropped and counted (back-pressure shedding; the reference drops the
// batch when its queue is full rather than blocking the device thread).
int32_t cs_ring_write(void* h, const float* re, const float* im,
                      int64_t n) {
    Ring* r = (Ring*)h;
    std::lock_guard<std::mutex> lock(r->mu);
    if (r->size + n > r->cap) {
        r->dropped += n;
        return 0;
    }
    int64_t w = (r->head + r->size) % r->cap;
    int64_t first = std::min(n, r->cap - w);
    std::memcpy(&r->re[w], re, first * sizeof(float));
    std::memcpy(&r->im[w], im, first * sizeof(float));
    if (n > first) {
        std::memcpy(&r->re[0], re + first, (n - first) * sizeof(float));
        std::memcpy(&r->im[0], im + first, (n - first) * sizeof(float));
    }
    r->size += n;
    return 1;
}

// Blocking-read analog: returns n samples only when available (else 0) —
// the consumer polls at block cadence like the compiled pipeline does.
int32_t cs_ring_read(void* h, float* re, float* im, int64_t n) {
    Ring* r = (Ring*)h;
    std::lock_guard<std::mutex> lock(r->mu);
    if (r->size < n) return 0;
    int64_t first = std::min(n, r->cap - r->head);
    std::memcpy(re, &r->re[r->head], first * sizeof(float));
    std::memcpy(im, &r->im[r->head], first * sizeof(float));
    if (n > first) {
        std::memcpy(re + first, &r->re[0], (n - first) * sizeof(float));
        std::memcpy(im + first, &r->im[0], (n - first) * sizeof(float));
    }
    r->head = (r->head + n) % r->cap;
    r->size -= n;
    return 1;
}

int64_t cs_ring_fill(void* h) {
    Ring* r = (Ring*)h;
    std::lock_guard<std::mutex> lock(r->mu);
    return r->size;
}

int64_t cs_ring_dropped(void* h) {
    Ring* r = (Ring*)h;
    std::lock_guard<std::mutex> lock(r->mu);
    return r->dropped;
}

}  // extern "C"
