/* Oracle encode/decode shim over the system libavformat/libavcodec,
 * compiled on demand by scripts/aac_oracle.py (test/dev ONLY — the
 * shipped decoder, native/aacdec.c, has no dependency on libav*).
 *
 * Role mirrors scripts/mp3_oracle.py for the mp3 decoder: (a) encode
 * synthetic fixtures as AAC-LC in .m4a/.adts containers, (b) decode any
 * container through an independent reference implementation so the
 * native decoder's output can be compared (SURVEY.md §4's oracle
 * strategy; reference ingest contract: lib/dataset.py:147 lists .m4a/
 * .mp4, decoded there via librosa -> audioread -> ffmpeg).
 */
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* log capture: the table-extraction rig classifies probe streams by   */
/* the decoder's diagnostic messages (e.g. "Gain control is not        */
/* implemented" fires iff a specific bit position read 1), so keep a   */
/* ring of recent log lines instead of spamming stderr.                */

static char log_buf[8192];
static size_t log_len = 0;

static void log_cb(void *avcl, int level, const char *fmt, va_list vl) {
    (void)avcl;
    if (level > AV_LOG_WARNING) return;
    if (log_len < sizeof(log_buf) - 256) {
        int n = vsnprintf(log_buf + log_len, sizeof(log_buf) - log_len - 1,
                          fmt, vl);
        if (n > 0) log_len += (size_t)n;
    }
}

void oracle_log_capture(int enable) {
    if (enable) {
        av_log_set_callback(log_cb);
    } else {
        av_log_set_callback(av_log_default_callback);
    }
    log_len = 0;
    log_buf[0] = 0;
}

const char *oracle_last_log(void) {
    log_buf[log_len] = 0;
    return log_buf;
}

void oracle_clear_log(void) {
    log_len = 0;
    log_buf[0] = 0;
}

/* ------------------------------------------------------------------ */
/* decode: any container/codec -> interleaved float32                  */
/* returns 0 on success; caller frees *out with oracle_free            */

int oracle_decode_file(const char *path, float **out, long long *n_samples,
                       int *channels, int *sample_rate, char *err,
                       int errlen) {
    AVFormatContext *fmt = NULL;
    AVCodecContext *ctx = NULL;
    AVPacket *pkt = NULL;
    AVFrame *frame = NULL;
    float *buf = NULL;
    long long cap = 0, n = 0;
    int ch = 0, sr = 0, rc = -1, stream_idx = -1;
    err[0] = 0;

    /* tiny hand-crafted ADTS probe files score too low for format
     * auto-detection — force the demuxer by extension */
    const AVInputFormat *ifmt = NULL;
    size_t plen = strlen(path);
    if (plen > 4 && !strcmp(path + plen - 4, ".aac"))
        ifmt = av_find_input_format("aac");
    if (avformat_open_input(&fmt, path, ifmt, NULL) < 0) {
        snprintf(err, errlen, "open_input failed");
        goto done;
    }
    if (avformat_find_stream_info(fmt, NULL) < 0) {
        snprintf(err, errlen, "find_stream_info failed");
        goto done;
    }
    const AVCodec *dec = NULL;
    stream_idx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (stream_idx < 0 || !dec) {
        snprintf(err, errlen, "no audio stream");
        goto done;
    }
    ctx = avcodec_alloc_context3(dec);
    if (!ctx ||
        avcodec_parameters_to_context(ctx, fmt->streams[stream_idx]->codecpar) < 0 ||
        avcodec_open2(ctx, dec, NULL) < 0) {
        snprintf(err, errlen, "decoder open failed");
        goto done;
    }
    pkt = av_packet_alloc();
    frame = av_frame_alloc();
    if (!pkt || !frame) goto done;

    int drained = 0;
    while (!drained) {
        int r = av_read_frame(fmt, pkt);
        if (r < 0) {
            avcodec_send_packet(ctx, NULL); /* flush */
            drained = 1;
        } else if (pkt->stream_index != stream_idx) {
            av_packet_unref(pkt);
            continue;
        } else {
            if (avcodec_send_packet(ctx, pkt) < 0) {
                av_packet_unref(pkt);
                continue;
            }
            av_packet_unref(pkt);
        }
        for (;;) {
            int rr = avcodec_receive_frame(ctx, frame);
            if (rr == AVERROR(EAGAIN) || rr == AVERROR_EOF) break;
            if (rr < 0) { snprintf(err, errlen, "receive_frame failed"); goto done; }
            int fch = frame->ch_layout.nb_channels;
            int ns = frame->nb_samples;
            if (!ch) { ch = fch; sr = frame->sample_rate; }
            if (fch != ch) { snprintf(err, errlen, "channel count changed"); goto done; }
            if (n + ns > cap) {
                cap = (n + ns) * 2 + 4096;
                float *nb = realloc(buf, (size_t)cap * ch * sizeof(float));
                if (!nb) { snprintf(err, errlen, "oom"); goto done; }
                buf = nb;
            }
            /* convert to interleaved float32 */
            enum AVSampleFormat sf = frame->format;
            for (int s = 0; s < ns; s++)
                for (int c = 0; c < ch; c++) {
                    float v;
                    switch (sf) {
                    case AV_SAMPLE_FMT_FLTP:
                        v = ((float *)frame->extended_data[c])[s]; break;
                    case AV_SAMPLE_FMT_FLT:
                        v = ((float *)frame->extended_data[0])[s * ch + c]; break;
                    case AV_SAMPLE_FMT_S16P:
                        v = ((int16_t *)frame->extended_data[c])[s] / 32768.0f; break;
                    case AV_SAMPLE_FMT_S16:
                        v = ((int16_t *)frame->extended_data[0])[s * ch + c] / 32768.0f; break;
                    case AV_SAMPLE_FMT_S32P:
                        v = ((int32_t *)frame->extended_data[c])[s] / 2147483648.0f; break;
                    case AV_SAMPLE_FMT_S32:
                        v = ((int32_t *)frame->extended_data[0])[s * ch + c] / 2147483648.0f; break;
                    case AV_SAMPLE_FMT_DBLP:
                        v = (float)((double *)frame->extended_data[c])[s]; break;
                    default:
                        snprintf(err, errlen, "unhandled sample fmt %d", sf);
                        goto done;
                    }
                    buf[(n + s) * ch + c] = v;
                }
            n += ns;
        }
    }
    *out = buf;
    *n_samples = n;
    *channels = ch;
    *sample_rate = sr;
    buf = NULL;
    rc = 0;
done:
    free(buf);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
    return rc;
}

/* ------------------------------------------------------------------ */
/* encode: interleaved float32 -> AAC-LC in the container implied by   */
/* the output path (.m4a/.mp4 -> mp4, .aac -> adts)                    */

int oracle_encode_aac(const float *pcm, long long n_samples, int channels,
                      int sample_rate, int bitrate, const char *outpath,
                      const char *opts, char *err, int errlen) {
    AVFormatContext *fmt = NULL;
    AVCodecContext *ctx = NULL;
    AVPacket *pkt = NULL;
    AVFrame *frame = NULL;
    int rc = -1, opened = 0;
    err[0] = 0;

    if (avformat_alloc_output_context2(&fmt, NULL, NULL, outpath) < 0 || !fmt) {
        snprintf(err, errlen, "output context failed (extension?)");
        goto done;
    }
    const AVCodec *enc = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (!enc) { snprintf(err, errlen, "no AAC encoder"); goto done; }
    ctx = avcodec_alloc_context3(enc);
    if (!ctx) goto done;
    ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    ctx->sample_rate = sample_rate;
    av_channel_layout_default(&ctx->ch_layout, channels);
    ctx->bit_rate = bitrate;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    AVDictionary *dict = NULL;
    if (opts && opts[0])
        av_dict_parse_string(&dict, opts, "=", ":", 0);
    int orc = avcodec_open2(ctx, enc, &dict);
    av_dict_free(&dict);
    if (orc < 0) {
        snprintf(err, errlen, "encoder open failed");
        goto done;
    }
    AVStream *st = avformat_new_stream(fmt, NULL);
    if (!st || avcodec_parameters_from_context(st->codecpar, ctx) < 0)
        goto done;
    st->time_base = (AVRational){1, sample_rate};
    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
        if (avio_open(&fmt->pb, outpath, AVIO_FLAG_WRITE) < 0) {
            snprintf(err, errlen, "avio_open failed");
            goto done;
        }
        opened = 1;
    }
    if (avformat_write_header(fmt, NULL) < 0) {
        snprintf(err, errlen, "write_header failed");
        goto done;
    }
    pkt = av_packet_alloc();
    frame = av_frame_alloc();
    if (!pkt || !frame) goto done;
    int fsz = ctx->frame_size > 0 ? ctx->frame_size : 1024;
    long long pos = 0;
    int64_t pts = 0;
    int flushed = 0;
    while (!flushed) {
        if (pos < n_samples) {
            frame->nb_samples = (int)((n_samples - pos < fsz) ? n_samples - pos : fsz);
            frame->format = AV_SAMPLE_FMT_FLTP;
            av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
            frame->sample_rate = sample_rate;
            if (av_frame_get_buffer(frame, 0) < 0) goto done;
            for (int c = 0; c < channels; c++) {
                float *dst = (float *)frame->extended_data[c];
                for (int s = 0; s < frame->nb_samples; s++)
                    dst[s] = pcm[(pos + s) * channels + c];
            }
            frame->pts = pts;
            pts += frame->nb_samples;
            pos += frame->nb_samples;
            if (avcodec_send_frame(ctx, frame) < 0) {
                snprintf(err, errlen, "send_frame failed");
                goto done;
            }
            av_frame_unref(frame);
        } else {
            avcodec_send_frame(ctx, NULL);
            flushed = 1;
        }
        for (;;) {
            int rr = avcodec_receive_packet(ctx, pkt);
            if (rr == AVERROR(EAGAIN) || rr == AVERROR_EOF) break;
            if (rr < 0) { snprintf(err, errlen, "receive_packet failed"); goto done; }
            av_packet_rescale_ts(pkt, (AVRational){1, sample_rate}, st->time_base);
            pkt->stream_index = st->index;
            if (av_interleaved_write_frame(fmt, pkt) < 0) {
                snprintf(err, errlen, "write_frame failed");
                goto done;
            }
        }
    }
    if (av_write_trailer(fmt) < 0) { snprintf(err, errlen, "trailer failed"); goto done; }
    rc = 0;
done:
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) {
        if (opened) avio_closep(&fmt->pb);
        avformat_free_context(fmt);
    }
    return rc;
}

void oracle_free(void *p) { free(p); }
