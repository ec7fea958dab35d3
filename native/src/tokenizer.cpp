// BERT WordPiece tokenizer, native counterpart of bark_tpu/text/tokenizer.py
// (behavioral contract from /root/reference/bark.cpp:480-662):
//
// - accent folding over the 52 hard-coded Latin codepoints only
// - C-locale word split [[:punct:]]|[[:alpha:]]+|[[:digit:]]+ (ASCII-only
//   classes; everything else, including surviving non-ASCII, is dropped)
// - greedy longest-dictionary-prefix WordPiece with "##" continuations; an
//   unmatched leading character is skipped with the prefix applied onward
// - NO lowercasing (upstream quirk, preserved)
// - emission stops once n_max - 1 tokens are produced

#include "common.h"

#include <cctype>
#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
    std::unordered_map<std::string, int32_t> token_to_id;
};

// 52-entry accent map (bark.cpp:488-541), keyed by Unicode codepoint.
char fold_accent(uint32_t cp) {
    switch (cp) {
        case 0xC0: case 0xC1: case 0xC2: case 0xC3: case 0xC4: case 0xC5: return 'A';
        case 0xE0: case 0xE1: case 0xE2: case 0xE3: case 0xE4: case 0xE5: return 'a';
        case 0xC8: case 0xC9: case 0xCA: case 0xCB: return 'E';
        case 0xE8: case 0xE9: case 0xEA: case 0xEB: return 'e';
        case 0xCC: case 0xCD: case 0xCE: case 0xCF: return 'I';
        case 0xEC: case 0xED: case 0xEE: case 0xEF: return 'i';
        case 0xD2: case 0xD3: case 0xD4: case 0xD5: case 0xD6: return 'O';
        case 0xF2: case 0xF3: case 0xF4: case 0xF5: case 0xF6: return 'o';
        case 0xD9: case 0xDA: case 0xDB: case 0xDC: return 'U';
        case 0xF9: case 0xFA: case 0xFB: case 0xFC: return 'u';
        case 0xDD: return 'Y'; case 0xFD: return 'y';
        case 0xC7: return 'C'; case 0xE7: return 'c';
        case 0xD1: return 'N'; case 0xF1: return 'n';
        default: return 0;
    }
}

inline bool is_punct(uint32_t c) {
    return c < 128 && ispunct((int)c);
}
inline bool is_alpha(uint32_t c) {
    return (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z');
}
inline bool is_digit(uint32_t c) { return c >= '0' && c <= '9'; }

// utf8_len LUT semantics (bark.cpp:480-484)
inline int utf8_len(uint8_t b) {
    static const int lut[16] = {1,1,1,1,1,1,1,1,1,1,1,1,2,2,3,4};
    return lut[b >> 4];
}

}  // namespace

extern "C" {

// vocab blob: n_tokens x {int32 len, utf-8 bytes} (the model-file layout)
void* bark_tokenizer_new(const uint8_t* blob, int64_t blob_len, int32_t n_tokens) {
    Tokenizer* t = new Tokenizer();
    int64_t off = 0;
    for (int32_t i = 0; i < n_tokens; ++i) {
        if (off + 4 > blob_len) { delete t; return nullptr; }
        int32_t len;
        memcpy(&len, blob + off, 4);
        off += 4;
        if (len < 0 || off + len > blob_len) { delete t; return nullptr; }
        t->token_to_id.emplace(
            std::string((const char*)(blob + off), (size_t)len), i);
        off += len;
    }
    return t;
}

void bark_tokenizer_free(void* h) { delete (Tokenizer*)h; }

// Tokenize UTF-8 `text`; writes up to n_max ids. Returns the count.
int32_t bark_tokenize(void* h, const char* text, int32_t* out, int32_t n_max) {
    Tokenizer* t = (Tokenizer*)h;

    // decode utf-8 -> codepoints with accent folding
    std::u32string cps;
    const uint8_t* p = (const uint8_t*)text;
    while (*p) {
        int len = utf8_len(*p);
        bool complete = true;
        for (int b = 1; b < len; ++b)
            if (!p[b]) { complete = false; break; }
        if (!complete) break;  // truncated trailing sequence
        uint32_t cp = 0;
        if (len == 1) cp = p[0];
        else if (len == 2) cp = ((uint32_t)(p[0] & 0x1F) << 6) | (p[1] & 0x3F);
        else if (len == 3)
            cp = ((uint32_t)(p[0] & 0x0F) << 12) | ((uint32_t)(p[1] & 0x3F) << 6) | (p[2] & 0x3F);
        else
            cp = ((uint32_t)(p[0] & 0x07) << 18) | ((uint32_t)(p[1] & 0x3F) << 12) |
                 ((uint32_t)(p[2] & 0x3F) << 6) | (p[3] & 0x3F);
        char folded = fold_accent(cp);
        cps.push_back(folded ? (uint32_t)folded : cp);
        p += len;
    }

    // word split: runs of alpha / runs of digits / single punct; drop rest
    std::vector<std::string> words;
    size_t i = 0, n = cps.size();
    while (i < n) {
        uint32_t c = cps[i];
        if (is_alpha(c)) {
            std::string w;
            while (i < n && is_alpha(cps[i])) w.push_back((char)cps[i++]);
            words.push_back(w);
        } else if (is_digit(c)) {
            std::string w;
            while (i < n && is_digit(cps[i])) w.push_back((char)cps[i++]);
            words.push_back(w);
        } else if (is_punct(c)) {
            words.push_back(std::string(1, (char)c));
            ++i;
        } else {
            ++i;  // dropped (whitespace, non-ASCII, ...)
        }
    }

    // greedy longest-match-first WordPiece
    int32_t count = 0;
    for (const std::string& word : words) {
        const char* prefix = "";
        size_t wi = 0, wn = word.size();
        while (wi < wn) {
            if (count >= n_max - 1) return count;
            bool matched = false;
            for (size_t j = wn; j > wi; --j) {
                std::string cand = prefix + word.substr(wi, j - wi);
                auto it = t->token_to_id.find(cand);
                if (it != t->token_to_id.end()) {
                    out[count++] = it->second;
                    wi = j;
                    prefix = "##";
                    matched = true;
                    break;
                }
            }
            if (!matched) {
                prefix = "##";
                ++wi;
            }
        }
    }
    return count;
}

}  // extern "C"
