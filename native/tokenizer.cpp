// Native corpus tokenizer + vocabulary encoder for dvae_tpu.
//
// Implements exactly the reference preprocessing pipeline
// (reference vae/data_utils.py:262-279) as a single byte-level pass:
//   1. strip leading/trailing whitespace, optional ASCII lowercase;
//   2. insert a space before every "n't" occurrence;
//   3. insert a space before every [.!?];
//   4. collapse every run of characters outside [a-zA-Z.!?'] to one space;
//   5. whitespace-split; wrap with SOS/EOS; map tokens to vocab ids with
//      <UNK> fallback; emit fixed-shape int32 [n, max_len] + lengths.
//
// The reference does this in Python re + dict lookups per token; at
// sfu_amazon_100k scale (100k+ sentences x 3 splits) that is the dominant
// startup cost of every training/eval/REPL session. This C++ path is loaded
// via ctypes (no pybind11 in the image) with a pure-Python fallback.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cctype>
#include <string>
#include <vector>
#include <unordered_map>

extern "C" {

struct Vocab {
    std::unordered_map<std::string, int32_t> map;
};

// words: concatenated UTF-8 word bytes; offsets: n_words+1 prefix offsets.
Vocab* vocab_create(const char* words, const int64_t* offsets,
                    int32_t n_words) {
    Vocab* v = new Vocab();
    v->map.reserve(static_cast<size_t>(n_words) * 2);
    for (int32_t i = 0; i < n_words; ++i) {
        std::string w(words + offsets[i],
                      static_cast<size_t>(offsets[i + 1] - offsets[i]));
        v->map.emplace(std::move(w), i);
    }
    return v;
}

void vocab_free(Vocab* v) { delete v; }

int32_t vocab_lookup(Vocab* v, const char* word) {
    auto it = v->map.find(word);
    return it == v->map.end() ? -1 : it->second;
}

static inline bool keep_char(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
           c == '.' || c == '!' || c == '?' || c == '\'';
}

static inline bool is_ws(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
           c == '\f' || c == '\v';
}

// Tokenize one sentence (bytes [s, s+len)) into `toks` (views into `buf`).
static void tokenize_one(const char* s, int64_t len, bool lowercase,
                         std::string& buf,
                         std::vector<std::pair<size_t, size_t>>& toks) {
    // strip
    int64_t b = 0, e = len;
    while (b < e && is_ws(static_cast<unsigned char>(s[b]))) ++b;
    while (e > b && is_ws(static_cast<unsigned char>(s[e - 1]))) --e;

    // passes 2-4 fused: emit into buf with inserted/collapsed spaces
    buf.clear();
    buf.reserve(static_cast<size_t>(e - b) + 16);
    bool last_space = true;  // collapse leading spaces
    for (int64_t i = b; i < e; ++i) {
        unsigned char c = static_cast<unsigned char>(s[i]);
        if (lowercase && c >= 'A' && c <= 'Z') c = c - 'A' + 'a';
        // "n't" boundary: space before the n of n't (the reference regex
        // is case-sensitive and runs after lowercasing)
        if (c == 'n' && i + 2 < e) {
            unsigned char c1 = static_cast<unsigned char>(s[i + 1]);
            unsigned char c2 = static_cast<unsigned char>(s[i + 2]);
            if (lowercase && c2 >= 'A' && c2 <= 'Z') c2 = c2 - 'A' + 'a';
            if (c1 == '\'' && c2 == 't') {
                if (!last_space) buf.push_back(' ');
                last_space = false;
                buf.push_back(c);
                continue;
            }
        }
        if (c == '.' || c == '!' || c == '?') {
            if (!last_space) buf.push_back(' ');
            buf.push_back(static_cast<char>(c));
            last_space = false;
            continue;
        }
        if (keep_char(c)) {
            buf.push_back(static_cast<char>(c));
            last_space = false;
        } else {
            if (!last_space) buf.push_back(' ');
            last_space = true;
        }
    }

    // whitespace split over buf
    toks.clear();
    size_t n = buf.size();
    size_t i = 0;
    while (i < n) {
        while (i < n && buf[i] == ' ') ++i;
        if (i >= n) break;
        size_t start = i;
        while (i < n && buf[i] != ' ') ++i;
        toks.emplace_back(start, i - start);
    }
}

// Tokenize + encode a corpus.
//   text/offs: concatenated sentences with n+1 prefix offsets.
//   out_ids: [n, max_len] int32 prefilled by caller semantics (we fill
//            pad_id beyond each row's length); out_lengths: [n].
// Returns the longest row (incl. SOS/EOS), or -(i+1) if row i overflows
// max_len.
int64_t tokenize_encode(Vocab* v, const char* text, const int64_t* offs,
                        int32_t n, int32_t lowercase, int32_t sos_id,
                        int32_t eos_id, int32_t unk_id, int32_t pad_id,
                        int32_t max_len, int32_t* out_ids,
                        int32_t* out_lengths) {
    std::string buf;
    std::string key;
    std::vector<std::pair<size_t, size_t>> toks;
    int64_t longest = 0;
    for (int32_t i = 0; i < n; ++i) {
        tokenize_one(text + offs[i], offs[i + 1] - offs[i],
                     lowercase != 0, buf, toks);
        int64_t L = static_cast<int64_t>(toks.size()) + 2;  // SOS/EOS
        if (L > max_len) return -(static_cast<int64_t>(i) + 1);
        if (L > longest) longest = L;
        int32_t* row = out_ids + static_cast<int64_t>(i) * max_len;
        row[0] = sos_id;
        for (size_t t = 0; t < toks.size(); ++t) {
            key.assign(buf, toks[t].first, toks[t].second);
            auto it = v->map.find(key);
            row[t + 1] = (it == v->map.end()) ? unk_id : it->second;
        }
        row[toks.size() + 1] = eos_id;
        for (int64_t t = L; t < max_len; ++t) row[t] = pad_id;
        out_lengths[i] = static_cast<int32_t>(L);
    }
    return longest;
}

// Tokenize only: writes token bytes into out_buf (space-separated rows,
// '\n' between sentences). Returns bytes written or -1 if out_cap too
// small. Used for building vocabularies and for Python-level parity tests.
int64_t tokenize_corpus(const char* text, const int64_t* offs, int32_t n,
                        int32_t lowercase, char* out_buf, int64_t out_cap) {
    std::string buf;
    std::vector<std::pair<size_t, size_t>> toks;
    int64_t w = 0;
    for (int32_t i = 0; i < n; ++i) {
        tokenize_one(text + offs[i], offs[i + 1] - offs[i],
                     lowercase != 0, buf, toks);
        for (size_t t = 0; t < toks.size(); ++t) {
            int64_t need = static_cast<int64_t>(toks[t].second) + 1;
            if (w + need >= out_cap) return -1;
            if (t > 0) out_buf[w++] = ' ';
            std::memcpy(out_buf + w, buf.data() + toks[t].first,
                        toks[t].second);
            w += static_cast<int64_t>(toks[t].second);
        }
        if (w + 1 >= out_cap) return -1;
        out_buf[w++] = '\n';
    }
    return w;
}

// Write a [rows, cols] float32 matrix as "%.4f"-formatted CSV, matching
// np.savetxt(fmt="%.4f", delimiter=",") byte for byte (both bottom out in
// C printf "%.4f" on the float64 upcast). The latent-metadata artifact
// contract (reference run.py:166-194) writes ~290 MB/epoch of these at
// flagship scale; formatting here runs without the GIL so the background
// metadata thread no longer steals the training thread's core.
// Returns bytes written, or -1 on open OR write failure (ENOSPC etc. --
// a truncated latents CSV must not look like a successful write).
int64_t write_csv_f32(const char* path, const float* data,
                      int64_t rows, int64_t cols) {
    FILE* f = std::fopen(path, "w");
    if (!f) return -1;
    std::vector<char> iobuf(1 << 22);
    std::setvbuf(f, iobuf.data(), _IOFBF, iobuf.size());
    char tmp[64];
    int64_t total = 0;
    for (int64_t r = 0; r < rows; ++r) {
        const float* row = data + r * cols;
        for (int64_t c = 0; c < cols; ++c) {
            if (c) { std::fputc(',', f); ++total; }
            int n = std::snprintf(tmp, sizeof tmp, "%.4f",
                                  static_cast<double>(row[c]));
            std::fwrite(tmp, 1, static_cast<size_t>(n), f);
            total += n;
        }
        std::fputc('\n', f);
        ++total;
    }
    // buffered writes can fail long after the fwrite call (full-buffer
    // flush, or the final flush inside fclose); check both channels
    int bad = std::ferror(f);
    if (std::fclose(f) != 0) bad = 1;
    return bad ? -1 : total;
}

}  // extern "C"
