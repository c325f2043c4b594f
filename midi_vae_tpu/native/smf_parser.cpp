// Native Standard-MIDI-File event extractor.
//
// The framework's data pipeline is numpy-vectorized except for the raw SMF
// byte walk (midi_vae_tpu/data/smf.py), which is pure Python. This module is
// the native-runtime equivalent: it parses the chunk structure, walks every
// track's running-status event stream, matches note_on/note_off pairs with
// the same semantics as smf.py (vel-0 note_on == note_off; a note_off closes
// every open note at that pitch except ones starting at the same tick;
// hanging notes close at the track's max tick), and returns flat arrays over
// a C ABI consumed via ctypes (no pybind11 in this image).
//
// Python keeps the tempo-map tick->seconds conversion and instrument
// grouping -- identical behavior, one code path for both parsers.
//
// Build: g++ -O3 -shared -fPIC -o libsmf_parser.so smf_parser.cpp

#include <array>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <map>
#include <string>
#include <vector>

namespace {

struct Note {
    int64_t track, channel, program, pitch, velocity, start_tick, end_tick;
};

struct Parser {
    const uint8_t* data;
    int64_t len;
    int64_t limit;  // current read bound: chunk body end inside a track
    int64_t pos = 0;
    bool ok = true;
    std::string error;

    explicit Parser(const uint8_t* d, int64_t n)
        : data(d), len(n), limit(n) {}

    bool avail(int64_t n) const { return pos + n <= limit; }

    uint8_t u8() {
        if (!avail(1)) { fail("truncated"); return 0; }
        return data[pos++];
    }
    uint16_t u16() { uint16_t v = u8(); return (uint16_t)((v << 8) | u8()); }
    uint32_t u32() { uint32_t v = u16(); return (v << 16) | u16(); }

    int64_t varlen() {
        int64_t value = 0;
        for (int i = 0; i < 4; i++) {
            uint8_t b = u8();
            value = (value << 7) | (b & 0x7F);
            if (!(b & 0x80)) return value;
        }
        fail("varlen too long");
        return value;
    }

    void fail(const char* msg) {
        if (ok) { ok = false; error = msg; }
    }
};

}  // namespace

extern "C" {

struct SmfResult {
    int32_t format;       // MThd format word (0/1/2)
    int32_t division;     // raw MThd division word (bit 15 set = SMPTE;
                          // Python decodes -- smf.decode_division)
    int64_t n_notes;
    int64_t* note_data;   // n_notes x 7: track,channel,program,pitch,vel,start,end
    int64_t n_tempo;
    int64_t* tempo_data;  // n_tempo x 2: tick, us_per_quarter
    int64_t n_timesig;
    int64_t* ts_data;     // n_timesig x 3: tick, numerator, denominator
    char error[256];
};

void smf_free(SmfResult* r) {
    if (!r) return;
    std::free(r->note_data);
    std::free(r->tempo_data);
    std::free(r->ts_data);
    r->note_data = r->tempo_data = r->ts_data = nullptr;
    r->n_notes = r->n_tempo = r->n_timesig = 0;
}

static void set_error(SmfResult* out, const std::string& msg) {
    std::snprintf(out->error, sizeof(out->error), "%s", msg.c_str());
}

// returns 0 on success, nonzero on parse error
int smf_parse(const uint8_t* data, int64_t len, SmfResult* out) {
    std::memset(out, 0, sizeof(*out));
    Parser p(data, len);
    if (len < 14 || std::memcmp(data, "MThd", 4) != 0) {
        set_error(out, "not a MIDI file (missing MThd)");
        return 1;
    }
    p.pos = 4;
    uint32_t header_len = p.u32();
    out->format = p.u16();
    uint16_t ntracks = p.u16();
    // raw division word: PPQ or SMPTE, decoded on the Python side
    out->division = p.u16();
    p.pos = 8 + header_len;

    std::vector<Note> notes;
    std::vector<std::pair<int64_t, int64_t>> tempos;    // tick, uspq
    std::vector<std::array<int64_t, 3>> timesigs;

    int track_idx = -1;
    int tracks_seen = 0;
    while (p.avail(8) && tracks_seen < ntracks) {
        char chunk_type[4];
        std::memcpy(chunk_type, data + p.pos, 4);
        p.pos += 4;
        uint32_t chunk_len = p.u32();
        int64_t body_start = p.pos;
        int64_t body_end = body_start + chunk_len;
        if (body_end > len) body_end = len;
        if (std::memcmp(chunk_type, "MTrk", 4) != 0) {
            p.pos = body_end;
            continue;
        }
        tracks_seen++;
        track_idx++;

        int64_t tick = 0;
        int64_t max_tick = 0;
        int running_status = -1;
        int current_program[16] = {0};
        // open notes per (channel, pitch): list of (start_tick, velocity, program)
        std::map<std::pair<int, int>, std::vector<std::array<int64_t, 3>>> open;

        p.pos = body_start;
        // bound all byte/varlen reads to the chunk body: a varlen or meta
        // field crossing body_end must fail exactly like the Python
        // parser, whose per-track slice cannot see past the chunk
        p.limit = body_end;
        while (p.pos < body_end && p.ok) {
            tick += p.varlen();
            if (tick > max_tick) max_tick = tick;
            if (p.pos >= body_end) break;
            int status = data[p.pos];
            if (status & 0x80) {
                p.pos++;
                if (status < 0xF0) running_status = status;
            } else {
                if (running_status < 0) { p.fail("running status w/o status"); break; }
                status = running_status;
            }
            if (status == 0xFF) {
                int meta_type = p.u8();
                int64_t mlen = p.varlen();
                int64_t mstart = p.pos;
                // the declared payload must actually fit in the chunk body:
                // a truncated file would otherwise be read past the buffer
                int64_t mend = mstart + mlen;
                bool payload_ok = mlen >= 0 && mend <= body_end && mend <= len;
                // tempo/time-signature honored from the FIRST track only
                // (pretty_midi semantics, mirrored by smf.parse_midi_bytes
                // pass 1 -- see PARITY.md "SMF format and division
                // semantics")
                if (meta_type == 0x51 && mlen >= 3 && payload_ok &&
                    track_idx == 0) {
                    int64_t uspq = ((int64_t)data[mstart] << 16) |
                                   ((int64_t)data[mstart + 1] << 8) |
                                   (int64_t)data[mstart + 2];
                    if (uspq > 0) tempos.push_back({tick, uspq});
                } else if (meta_type == 0x58 && mlen >= 2 && payload_ok &&
                           track_idx == 0) {
                    // shift clamped: den_pow >= 63 would be UB (and sane
                    // MIDI uses <= 7); the Python parser clamps identically
                    int den_pow = data[mstart + 1];
                    if (den_pow > 62) den_pow = 62;
                    timesigs.push_back({tick, (int64_t)data[mstart],
                                        (int64_t)1 << den_pow});
                }
                p.pos = mstart + mlen;
                if (meta_type == 0x2F) break;  // end of track
            } else if (status == 0xF0 || status == 0xF7) {
                int64_t slen = p.varlen();
                p.pos += slen;
            } else if (status >= 0xF0) {
                // system common (0xF1-0xF6) / realtime (0xF8-0xFE):
                // fixed-size payloads; misreading them as 2-byte channel
                // events desynchronizes every later delta-time
                if (status == 0xF2) p.pos += 2;
                else if (status == 0xF1 || status == 0xF3) p.pos += 1;
            } else {
                int kind = status & 0xF0;
                int channel = status & 0x0F;
                int nbytes = (kind == 0xC0 || kind == 0xD0) ? 1 : 2;
                if (p.pos + nbytes > body_end) break;
                int d0 = data[p.pos];
                int d1 = nbytes > 1 ? data[p.pos + 1] : 0;
                p.pos += nbytes;
                if (kind == 0xC0) {
                    current_program[channel] = d0 & 0x7F;
                } else if (kind == 0x90 && d1 > 0) {
                    open[{channel, d0}].push_back(
                        {tick, (int64_t)d1, (int64_t)current_program[channel]});
                } else if (kind == 0x80 || (kind == 0x90 && d1 == 0)) {
                    auto it = open.find({channel, d0});
                    if (it != open.end()) {
                        std::vector<std::array<int64_t, 3>> keep;
                        for (auto& e : it->second) {
                            if (e[0] == tick) {
                                keep.push_back(e);
                            } else {
                                notes.push_back({track_idx, channel, e[2], d0,
                                                 e[1], e[0], tick});
                            }
                        }
                        if (keep.empty()) open.erase(it);
                        else it->second = keep;
                    }
                }
            }
        }
        // close hanging notes at the track's max tick
        for (auto& kv : open) {
            int channel = kv.first.first;
            int pitch = kv.first.second;
            for (auto& e : kv.second) {
                if (e[0] < max_tick) {
                    notes.push_back({track_idx, channel, e[2], pitch, e[1],
                                     e[0], max_tick});
                }
            }
        }
        p.pos = body_end;
        p.limit = p.len;
        if (!p.ok) { set_error(out, p.error); return 1; }
    }

    out->n_notes = (int64_t)notes.size();
    out->note_data = (int64_t*)std::malloc(sizeof(int64_t) * 7 * notes.size());
    for (size_t i = 0; i < notes.size(); i++) {
        int64_t* row = out->note_data + i * 7;
        row[0] = notes[i].track;
        row[1] = notes[i].channel;
        row[2] = notes[i].program;
        row[3] = notes[i].pitch;
        row[4] = notes[i].velocity;
        row[5] = notes[i].start_tick;
        row[6] = notes[i].end_tick;
    }
    out->n_tempo = (int64_t)tempos.size();
    out->tempo_data = (int64_t*)std::malloc(sizeof(int64_t) * 2 * tempos.size());
    for (size_t i = 0; i < tempos.size(); i++) {
        out->tempo_data[i * 2] = tempos[i].first;
        out->tempo_data[i * 2 + 1] = tempos[i].second;
    }
    out->n_timesig = (int64_t)timesigs.size();
    out->ts_data = (int64_t*)std::malloc(sizeof(int64_t) * 3 * timesigs.size());
    for (size_t i = 0; i < timesigs.size(); i++) {
        out->ts_data[i * 3] = timesigs[i][0];
        out->ts_data[i * 3 + 1] = timesigs[i][1];
        out->ts_data[i * 3 + 2] = timesigs[i][2];
    }
    return 0;
}

}  // extern "C"
