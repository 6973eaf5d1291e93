// yume_decode: native video frame decoder (libavformat/libavcodec).
//
// The reference's data path decodes video with decord, a native
// libavcodec-based decoder (fastvideo/dataset/t2v_datasets.py imports
// decord; SURVEY §2.3). This is the TPU build's equivalent: demux + decode
// + RGB24 conversion in C++, exposed through a small C API consumed via
// ctypes (no pybind11 in the image). Selective frame fetch decodes
// sequentially up to the highest wanted index (matching the cv2 fallback's
// semantics) and converts only the wanted frames.
//
// Build: g++ -O3 -shared -fPIC -o libyume_decode.so yume_decode.cpp \
//            $(pkg-config --cflags --libs libavformat libavcodec \
//                                          libswscale libavutil)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Ctx {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* dec = nullptr;
    int stream = -1;
    int width = 0;
    int height = 0;
    int64_t nb_frames = -1;
};

}  // namespace

extern "C" {

// Open a video file; returns an opaque handle or nullptr.
void* yd_open(const char* path) {
    auto* c = new Ctx();
    if (avformat_open_input(&c->fmt, path, nullptr, nullptr) < 0) {
        delete c;
        return nullptr;
    }
    if (avformat_find_stream_info(c->fmt, nullptr) < 0) {
        avformat_close_input(&c->fmt);
        delete c;
        return nullptr;
    }
    const AVCodec* codec = nullptr;
    c->stream = av_find_best_stream(c->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                    &codec, 0);
    if (c->stream < 0 || !codec) {
        avformat_close_input(&c->fmt);
        delete c;
        return nullptr;
    }
    AVStream* st = c->fmt->streams[c->stream];
    c->dec = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(c->dec, st->codecpar);
    if (avcodec_open2(c->dec, codec, nullptr) < 0) {
        avcodec_free_context(&c->dec);
        avformat_close_input(&c->fmt);
        delete c;
        return nullptr;
    }
    c->width = c->dec->width;
    c->height = c->dec->height;
    c->nb_frames = st->nb_frames;  // 0 when the container doesn't record it
    return c;
}

int yd_width(void* h) { return static_cast<Ctx*>(h)->width; }
int yd_height(void* h) { return static_cast<Ctx*>(h)->height; }

// Container-recorded frame count (0/-1 when unknown — caller may decode
// through to count).
int64_t yd_frame_count(void* h) { return static_cast<Ctx*>(h)->nb_frames; }

// Decode frames `indices[0..n)` (ascending, deduplicated by caller) into
// `out` as [n, out_h, out_w, 3] RGB24. out_h/out_w <= 0 means native size.
// Returns the number of frames written (== n on success).
int yd_read_frames(void* h, const int64_t* indices, int n,
                   uint8_t* out, int out_h, int out_w) {
    auto* c = static_cast<Ctx*>(h);
    if (n <= 0) return 0;
    if (out_h <= 0) out_h = c->height;
    if (out_w <= 0) out_w = c->width;
    const int64_t max_idx = indices[n - 1];
    const size_t frame_bytes = (size_t)out_h * out_w * 3;

    SwsContext* sws = sws_getContext(
        c->width, c->height, c->dec->pix_fmt, out_w, out_h, AV_PIX_FMT_RGB24,
        out_h == c->height && out_w == c->width ? SWS_POINT : SWS_AREA,
        nullptr, nullptr, nullptr);
    if (!sws) return 0;

    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    int64_t pos = 0;  // decode-order frame counter
    int want_i = 0;   // next index to satisfy
    int written = 0;

    auto handle_frame = [&]() {
        while (want_i < n && indices[want_i] == pos) {
            uint8_t* dst[1] = {out + (size_t)want_i * frame_bytes};
            int dst_stride[1] = {out_w * 3};
            sws_scale(sws, frame->data, frame->linesize, 0, c->height, dst,
                      dst_stride);
            ++want_i;
            ++written;
        }
        ++pos;
    };

    bool eof = false;
    while (!eof && pos <= max_idx && want_i < n) {
        int r = av_read_frame(c->fmt, pkt);
        if (r < 0) {
            // flush the decoder
            avcodec_send_packet(c->dec, nullptr);
            eof = true;
        } else if (pkt->stream_index != c->stream) {
            av_packet_unref(pkt);
            continue;
        } else {
            avcodec_send_packet(c->dec, pkt);
            av_packet_unref(pkt);
        }
        while (avcodec_receive_frame(c->dec, frame) == 0 && want_i < n &&
               pos <= max_idx) {
            handle_frame();
        }
    }

    av_frame_free(&frame);
    av_packet_free(&pkt);
    sws_freeContext(sws);
    return written;
}

void yd_close(void* h) {
    auto* c = static_cast<Ctx*>(h);
    if (c->dec) avcodec_free_context(&c->dec);
    if (c->fmt) avformat_close_input(&c->fmt);
    delete c;
}

}  // extern "C"
