// crispy native runtime: the host-side streaming tier.
//
// The reference implements its real-time engine in Rust (ring buffers,
// mixer worker, streaming resampler, WAV writer — src-tauri/src/audio.rs,
// recording.rs). The TPU build keeps the accelerator math in JAX/Pallas and
// implements the same host runtime natively here: single-producer/
// single-consumer audio rings, the 1152-sample dual-mono mixer with 50 ms
// desync trimming, the sample-exact streaming linear resampler
// (audio.rs:73-134 semantics), an incremental s16 WAV writer, and a
// throttled RMS level meter. C ABI, consumed from Python via ctypes.
//
// Build: g++ -O2 -shared -fPIC -o libcrispy_runtime.so crispy_runtime.cpp

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Ring buffer (bounded FIFO, drop-oldest like the reference's VecDeque use)
// ---------------------------------------------------------------------------

struct Ring {
    std::vector<float> buf;
    size_t head = 0;  // read position
    size_t len = 0;   // valid samples
    size_t cap = 0;
    std::mutex mu;
};

Ring* ring_new(size_t capacity) {
    Ring* r = new Ring();
    r->buf.resize(capacity);
    r->cap = capacity;
    return r;
}

void ring_free(Ring* r) { delete r; }

size_t ring_len(Ring* r) {
    std::lock_guard<std::mutex> g(r->mu);
    return r->len;
}

void ring_clear(Ring* r) {
    std::lock_guard<std::mutex> g(r->mu);
    r->head = 0;
    r->len = 0;
}

// Push samples; oldest samples drop when capacity is exceeded.
void ring_push(Ring* r, const float* data, size_t n) {
    std::lock_guard<std::mutex> g(r->mu);
    for (size_t i = 0; i < n; i++) {
        size_t tail = (r->head + r->len) % r->cap;
        r->buf[tail] = data[i];
        if (r->len < r->cap) {
            r->len++;
        } else {
            r->head = (r->head + 1) % r->cap;  // overwrite oldest
        }
    }
}

// Pop up to n samples; returns the number actually popped.
size_t ring_pop(Ring* r, float* out, size_t n) {
    std::lock_guard<std::mutex> g(r->mu);
    size_t take = n < r->len ? n : r->len;
    for (size_t i = 0; i < take; i++) {
        out[i] = r->buf[(r->head + i) % r->cap];
    }
    r->head = (r->head + take) % r->cap;
    r->len -= take;
    return take;
}

void ring_trim_front(Ring* r, size_t n) {
    std::lock_guard<std::mutex> g(r->mu);
    size_t drop = n < r->len ? n : r->len;
    r->head = (r->head + drop) % r->cap;
    r->len -= drop;
}

// ---------------------------------------------------------------------------
// Mixer: one 1152-sample dual-mono frame from the two rings
// (commands/recording.rs:188-291 semantics).
// ---------------------------------------------------------------------------

// Returns 1 if a frame was produced into `mixed` (frame_len samples),
// 0 if not enough mic audio is buffered.
int mixer_step(Ring* mic, Ring* app, float* mixed, size_t frame_len,
               size_t max_desync) {
    size_t mic_len = ring_len(mic);
    size_t app_len = ring_len(app);
    if (mic_len < frame_len) return 0;
    if (mic_len > app_len + max_desync && app_len > 0) {
        ring_trim_front(mic, mic_len - app_len - max_desync);
    } else if (app_len > mic_len + max_desync) {
        ring_trim_front(app, app_len - mic_len - max_desync);
    }
    std::vector<float> m(frame_len, 0.0f), a(frame_len, 0.0f);
    size_t got = ring_pop(mic, m.data(), frame_len);
    for (size_t i = got; i < frame_len; i++) m[i] = 0.0f;
    size_t ga = ring_pop(app, a.data(), frame_len);
    for (size_t i = ga; i < frame_len; i++) a[i] = 0.0f;
    for (size_t i = 0; i < frame_len; i++) mixed[i] = m[i] + a[i];
    return 1;
}

// ---------------------------------------------------------------------------
// Streaming linear resampler (audio.rs:73-134 semantics, sample-exact)
// ---------------------------------------------------------------------------

struct LinResampler {
    float input_rate, output_rate;
    float last_sample = 0.0f;
    bool has_last = false;
    double input_pos = 0.0;
    double next_output_pos = 0.0;
};

LinResampler* resampler_new(float input_rate, float output_rate) {
    LinResampler* s = new LinResampler();
    s->input_rate = input_rate;
    s->output_rate = output_rate;
    return s;
}

void resampler_free(LinResampler* s) { delete s; }

void resampler_set_rates(LinResampler* s, float input_rate, float output_rate) {
    s->input_rate = input_rate;
    s->output_rate = output_rate;
    s->last_sample = 0.0f;
    s->has_last = false;
    s->input_pos = 0.0;
    s->next_output_pos = 0.0;
}

// Process a block; writes emitted samples to `out` (caller sizes it
// generously: n * out_rate/in_rate + 2). Returns the emitted count.
size_t resampler_process(LinResampler* s, const float* x, size_t n,
                         float* out, size_t out_cap) {
    if (std::fabs(s->input_rate - s->output_rate) < 1.0f) {
        size_t take = n < out_cap ? n : out_cap;
        std::memcpy(out, x, take * sizeof(float));
        return take;
    }
    size_t emitted = 0;
    double step = (double)(s->input_rate / s->output_rate);
    for (size_t i = 0; i < n; i++) {
        float sample = x[i];
        if (!s->has_last) {
            s->last_sample = sample;
            s->has_last = true;
            s->input_pos = 0.0;
            s->next_output_pos = 0.0;
            continue;
        }
        s->input_pos += 1.0;
        while (s->next_output_pos <= s->input_pos) {
            float t = (float)(s->next_output_pos - (s->input_pos - 1.0));
            if (t < 0.0f) t = 0.0f;
            if (t > 1.0f) t = 1.0f;
            if (emitted < out_cap) {
                out[emitted++] = s->last_sample + (sample - s->last_sample) * t;
            }
            s->next_output_pos += step;
        }
        s->last_sample = sample;
    }
    return emitted;
}

// ---------------------------------------------------------------------------
// Incremental s16 stereo WAV writer (recording.rs:78-134 semantics)
// ---------------------------------------------------------------------------

struct WavW {
    FILE* f = nullptr;
    uint32_t data_bytes = 0;
    uint16_t channels = 2;
    uint32_t sample_rate = 48000;
};

static void wavw_header(WavW* w) {
    uint32_t byte_rate = w->sample_rate * w->channels * 2;
    uint16_t block_align = w->channels * 2;
    uint32_t chunk = 36 + w->data_bytes;
    fseek(w->f, 0, SEEK_SET);
    fwrite("RIFF", 1, 4, w->f);
    fwrite(&chunk, 4, 1, w->f);
    fwrite("WAVE", 1, 4, w->f);
    fwrite("fmt ", 1, 4, w->f);
    uint32_t fmt_size = 16;
    uint16_t pcm = 1;
    fwrite(&fmt_size, 4, 1, w->f);
    fwrite(&pcm, 2, 1, w->f);
    fwrite(&w->channels, 2, 1, w->f);
    fwrite(&w->sample_rate, 4, 1, w->f);
    fwrite(&byte_rate, 4, 1, w->f);
    fwrite(&block_align, 2, 1, w->f);
    uint16_t bits = 16;
    fwrite(&bits, 2, 1, w->f);
    fwrite("data", 1, 4, w->f);
    fwrite(&w->data_bytes, 4, 1, w->f);
}

WavW* wav_open(const char* path, uint32_t sample_rate, uint16_t channels) {
    WavW* w = new WavW();
    w->sample_rate = sample_rate;
    w->channels = channels;
    w->f = fopen(path, "wb");
    if (!w->f) {
        delete w;
        return nullptr;
    }
    wavw_header(w);
    return w;
}

// Interleave equal-length L/R blocks, clamp, x32767, truncate toward zero.
int wav_write_stereo(WavW* w, const float* left, const float* right, size_t n) {
    if (!w->f) return 0;
    std::vector<int16_t> pcm(n * 2);
    for (size_t i = 0; i < n; i++) {
        float l = left[i], r = right[i];
        l = l < -1.0f ? -1.0f : (l > 1.0f ? 1.0f : l);
        r = r < -1.0f ? -1.0f : (r > 1.0f ? 1.0f : r);
        pcm[2 * i] = (int16_t)(l * 32767.0f);
        pcm[2 * i + 1] = (int16_t)(r * 32767.0f);
    }
    size_t wrote = fwrite(pcm.data(), 2, pcm.size(), w->f);
    w->data_bytes += (uint32_t)(wrote * 2);
    return wrote == pcm.size();
}

int wav_finalize(WavW* w) {
    if (!w->f) return 0;
    wavw_header(w);
    fclose(w->f);
    w->f = nullptr;
    delete w;
    return 1;
}

// ---------------------------------------------------------------------------
// RMS level meter
// ---------------------------------------------------------------------------

float rms_level(const float* x, size_t n) {
    if (n == 0) return 0.0f;
    double acc = 0.0;
    for (size_t i = 0; i < n; i++) acc += (double)x[i] * (double)x[i];
    return (float)std::sqrt(acc / (double)n);
}

}  // extern "C"
