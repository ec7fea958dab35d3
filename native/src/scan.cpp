// Model-file scanner: one sequential pass over ggml_weights.bin producing a
// compact text index (section boundaries, hparams, tensor offsets) so the
// Python loader can mmap the file and slice tensor bytes zero-copy instead
// of issuing tens of thousands of small reads.
//
// Native counterpart of the reference's streaming loader
// (/root/reference/bark.cpp:664-1184); format defined by convert.py:293-348.
//
// Index format (text, newline-separated):
//   VOCAB <offset_of_n_vocab> <n_vocab>
//   SEC <name> <h0> ... <hN>          (10 ints for gpt, 9 for codec)
//   TEN <ttype> <data_offset> <data_bytes> <ndims> <ne...> <name>
//   END <file_size>

#include "common.h"

#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

struct Reader {
    FILE* f;
    int64_t pos = 0;
    bool ok = true;

    bool read_i32(int32_t* v) {
        if (fread(v, 4, 1, f) != 1) { ok = false; return false; }
        pos += 4;
        return true;
    }
    // 64-bit seek: plain fseek takes a `long`, which is 32-bit on Windows
    // and 32-bit Linux — multi-GB model files would overflow and mis-parse.
    bool skip(int64_t n) {
#if defined(_WIN32)
        if (_fseeki64(f, n, SEEK_CUR) != 0) { ok = false; return false; }
#else
        if (fseeko(f, (off_t)n, SEEK_CUR) != 0) { ok = false; return false; }
#endif
        pos += n;
        return true;
    }
    bool read_bytes(char* dst, int64_t n) {
        if (fread(dst, 1, (size_t)n, f) != (size_t)n) { ok = false; return false; }
        pos += n;
        return true;
    }
};

const int32_t MAGIC = 0x67676d6c;

struct Out {
    std::string s;
    void addf(const char* fmt, ...) {
        char buf[1024];
        va_list ap;
        va_start(ap, fmt);
        vsnprintf(buf, sizeof(buf), fmt, ap);
        va_end(ap);
        s += buf;
    }
};

// returns false on malformed record
bool scan_tensor(Reader& r, Out& o) {
    int32_t n_dims, name_len, ttype;
    if (!r.read_i32(&n_dims) || !r.read_i32(&name_len) || !r.read_i32(&ttype))
        return false;
    if (n_dims < 1 || n_dims > 4 || name_len < 0 || name_len > 512) return false;
    int64_t ne[4], n_elem = 1;
    for (int i = 0; i < n_dims; ++i) {
        int32_t d;
        if (!r.read_i32(&d) || d <= 0) return false;
        ne[i] = d;
        n_elem *= d;
    }
    char name[513];
    if (!r.read_bytes(name, name_len)) return false;
    name[name_len] = 0;
    int64_t nbytes = type_size_bytes(ttype, n_elem);
    if (nbytes < 0) return false;
    int64_t off = r.pos;
    if (!r.skip(nbytes)) return false;
    o.addf("TEN %d %lld %lld %d", ttype, (long long)off, (long long)nbytes, n_dims);
    for (int i = 0; i < n_dims; ++i) o.addf(" %lld", (long long)ne[i]);
    o.addf(" %s\n", name);
    return true;
}

}  // namespace

extern "C" {

// Scans `path`; writes the text index into out (cap bytes, NUL-terminated).
// Returns the index length, or -1 (io/parse error) / -2 (buffer too small).
int64_t bark_scan_model(const char* path, char* out, int64_t cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    Reader r{f};
    Out o;

    int32_t magic;
    if (!r.read_i32(&magic) || magic != MAGIC) { fclose(f); return -1; }

    // vocab
    int64_t vocab_off = r.pos;
    int32_t n_vocab;
    if (!r.read_i32(&n_vocab) || n_vocab < 0) { fclose(f); return -1; }
    o.addf("VOCAB %lld %d\n", (long long)vocab_off, n_vocab);
    for (int32_t i = 0; i < n_vocab; ++i) {
        int32_t len;
        if (!r.read_i32(&len) || len < 0 || !r.skip(len)) { fclose(f); return -1; }
    }

    // three GPT sections
    static const char* names[3] = {"semantic", "coarse", "fine"};
    for (int s = 0; s < 3; ++s) {
        int32_t hp[10];
        for (int i = 0; i < 10; ++i)
            if (!r.read_i32(&hp[i])) { fclose(f); return -1; }
        o.addf("SEC %s", names[s]);
        for (int i = 0; i < 10; ++i) o.addf(" %d", hp[i]);
        o.addf("\n");
        int32_t n_tensors;
        if (!r.read_i32(&n_tensors) || n_tensors < 0) { fclose(f); return -1; }
        for (int32_t i = 0; i < n_tensors; ++i)
            if (!scan_tensor(r, o)) { fclose(f); return -1; }
    }

    // codec section: magic + 9 hparams + tensors until EOF
    if (!r.read_i32(&magic) || magic != MAGIC) { fclose(f); return -1; }
    int32_t hp[9];
    for (int i = 0; i < 9; ++i)
        if (!r.read_i32(&hp[i])) { fclose(f); return -1; }
    o.addf("SEC codec");
    for (int i = 0; i < 9; ++i) o.addf(" %d", hp[i]);
    o.addf("\n");
    while (true) {
        int32_t peek;
        if (fread(&peek, 4, 1, f) != 1) break;  // EOF
        // un-read the peeked word with a relative 64-bit-safe seek
        // (ftell/fseek long offsets overflow past 2 GB into the codec
        // section of a bark-large file)
#if defined(_WIN32)
        if (_fseeki64(f, -4, SEEK_CUR) != 0) { fclose(f); return -1; }
#else
        if (fseeko(f, (off_t)-4, SEEK_CUR) != 0) { fclose(f); return -1; }
#endif
        if (!scan_tensor(r, o)) { fclose(f); return -1; }
    }
    o.addf("END %lld\n", (long long)r.pos);
    fclose(f);

    int64_t n = (int64_t)o.s.size();
    if (n + 1 > cap) return -2;
    memcpy(out, o.s.data(), (size_t)n);
    out[n] = 0;
    return n;
}

}  // extern "C"
