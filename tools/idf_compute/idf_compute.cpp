// idf_compute — multithreaded corpus-wide IDF over JSONL triplet shards.
//
// C++17 replacement for the reference's Rust tool
// (reference: tools/idf-compute/src/main.rs:124-235): scans JSONL shards in
// parallel, tokenizes the `query` / `positive` / `negative` / `negatives`
// fields with a WordPiece tokenizer compatible with the 50K Korean vocab
// (BasicTokenizer semantics: whitespace split, punctuation split, CJK
// ideograph per-char split, no lowercasing), counts per-document unique
// token ids into document frequencies, and writes
//   <out>.bin  — little-endian float32 idf[vocab_size]
//   <out>.json — metadata {num_docs, vocab_size, mode, df_nonzero}
//
// IDF modes (same as the reference):
//   bm25:     ln(1 + (N - df + 0.5) / (df + 0.5))
//   standard: ln(N / (df + 1))
//
// Usage:
//   idf_compute --vocab vocab.txt --output out/idf [--mode bm25]
//               [--threads N] file1.jsonl [file2.jsonl ...]

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ------------------------------------------------------------- utf8
// Decode one UTF-8 codepoint starting at s[i]; advances i.
uint32_t decode_utf8(const std::string& s, size_t& i) {
    unsigned char c = s[i];
    if (c < 0x80) { i += 1; return c; }
    if ((c >> 5) == 0x6 && i + 1 < s.size()) {
        uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
        i += 2; return cp;
    }
    if ((c >> 4) == 0xE && i + 2 < s.size()) {
        uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
        i += 3; return cp;
    }
    if ((c >> 3) == 0x1E && i + 3 < s.size()) {
        uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
                      ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
        i += 4; return cp;
    }
    i += 1;
    return 0xFFFD;
}

void encode_utf8(uint32_t cp, std::string& out) {
    if (cp < 0x80) { out += (char)cp; }
    else if (cp < 0x800) {
        out += (char)(0xC0 | (cp >> 6));
        out += (char)(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
        out += (char)(0xE0 | (cp >> 12));
        out += (char)(0x80 | ((cp >> 6) & 0x3F));
        out += (char)(0x80 | (cp & 0x3F));
    } else {
        out += (char)(0xF0 | (cp >> 18));
        out += (char)(0x80 | ((cp >> 12) & 0x3F));
        out += (char)(0x80 | ((cp >> 6) & 0x3F));
        out += (char)(0x80 | (cp & 0x3F));
    }
}

bool is_cjk_ideograph(uint32_t cp) {
    return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
           (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x20000 && cp <= 0x2A6DF);
}

bool is_space_cp(uint32_t cp) {
    // HF BasicTokenizer whitespace = \t\n\r space + Unicode Zs. NBSP and
    // the U+2000 block are ubiquitous in crawled HTML — gluing across
    // them silently shifts document frequencies vs the Python reference.
    if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') return true;
    if (cp == 0x00A0 || cp == 0x1680 || cp == 0x202F || cp == 0x205F ||
        cp == 0x3000) return true;
    if (cp >= 0x2000 && cp <= 0x200A) return true;   // en/em/thin spaces
    return cp == 0x2028 || cp == 0x2029;             // line/para separator
}

bool is_punct_cp(uint32_t cp) {
    // ASCII punctuation ranges (BertTokenizer semantics) + general punct
    // block + CJK symbols + fullwidth/halfwidth forms (！，？ etc. are
    // Po-category punctuation HF splits on; common in Korean web text).
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) return true;
    if ((cp >= 0x2000 && cp <= 0x206F) || (cp >= 0x3001 && cp <= 0x303F))
        return true;
    return (cp >= 0xFF01 && cp <= 0xFF0F) || (cp >= 0xFF1A && cp <= 0xFF20) ||
           (cp >= 0xFF3B && cp <= 0xFF40) || (cp >= 0xFF5B && cp <= 0xFF65);
}

// ------------------------------------------------------------- tokenizer
struct WordPiece {
    std::unordered_map<std::string, int32_t> vocab;
    int32_t unk_id = 2;

    void load(const std::string& path) {
        std::ifstream f(path);
        if (!f) { std::cerr << "cannot open vocab " << path << "\n"; std::exit(2); }
        std::string line;
        int32_t id = 0;
        while (std::getline(f, line)) {
            while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
                line.pop_back();
            vocab.emplace(line, id++);
        }
        auto it = vocab.find("<unk>");
        if (it == vocab.end()) it = vocab.find("[UNK]");
        if (it != vocab.end()) unk_id = it->second;
    }

    // Basic-tokenize into words (whitespace/punct/CJK splitting).
    void basic_tokenize(const std::string& text, std::vector<std::string>& words) const {
        std::string cur;
        size_t i = 0;
        auto flush = [&]() { if (!cur.empty()) { words.push_back(cur); cur.clear(); } };
        while (i < text.size()) {
            uint32_t cp = decode_utf8(text, i);
            if (cp == 0 || cp == 0xFFFD) continue;
            if (is_space_cp(cp)) { flush(); continue; }
            if (is_punct_cp(cp) || is_cjk_ideograph(cp)) {
                flush();
                std::string one;
                encode_utf8(cp, one);
                words.push_back(one);
                continue;
            }
            encode_utf8(cp, cur);
        }
        flush();
    }

    // Greedy longest-match WordPiece of one word into token ids.
    void wordpiece(const std::string& word, std::vector<int32_t>& out) const {
        // HF max_input_chars_per_word = 100 CODEPOINTS -> UNK (a byte
        // cap silently diverged on long non-ASCII runs)
        size_t ncp = 0;
        for (char ch : word) ncp += ((ch & 0xC0) != 0x80);
        if (ncp > 100) { out.push_back(unk_id); return; }
        size_t start = 0;
        std::vector<int32_t> pieces;
        while (start < word.size()) {
            size_t end = word.size();
            int32_t cur_id = -1;
            while (end > start) {
                std::string sub = word.substr(start, end - start);
                if (start > 0) sub = "##" + sub;
                auto it = vocab.find(sub);
                if (it != vocab.end()) { cur_id = it->second; break; }
                // back off one full UTF-8 codepoint
                do { --end; } while (end > start && ((word[end] & 0xC0) == 0x80));
            }
            if (cur_id < 0) { out.push_back(unk_id); return; }
            pieces.push_back(cur_id);
            start = end;
        }
        out.insert(out.end(), pieces.begin(), pieces.end());
    }

    void tokenize(const std::string& text, std::vector<int32_t>& ids) const {
        std::vector<std::string> words;
        basic_tokenize(text, words);
        for (const auto& w : words) wordpiece(w, ids);
    }
};

// ------------------------------------------------------------- json field scan
// Extract string values for "query"/"positive"/"negative" and every element
// of "negatives":[...] from one JSONL row. Minimal decoder: handles \", \\,
// \/, \n, \t, \r, \uXXXX.
void decode_json_string(const std::string& raw, std::string& out) {
    out.clear();
    for (size_t i = 0; i < raw.size(); ++i) {
        char c = raw[i];
        if (c != '\\') { out += c; continue; }
        if (++i >= raw.size()) break;
        switch (raw[i]) {
            case 'n': out += '\n'; break;
            case 't': out += '\t'; break;
            case 'r': out += '\r'; break;
            case 'b': case 'f': out += ' '; break;
            case 'u': {
                // validate hex FIRST: std::stoul on a malformed escape
                // (\uZZZZ in one corrupt row) would throw inside a worker
                // thread and std::terminate the whole multi-hour run
                auto hex4 = [&](size_t pos, uint32_t& v) {
                    if (pos + 4 > raw.size()) return false;
                    v = 0;
                    for (size_t j = pos; j < pos + 4; ++j) {
                        char h = raw[j];
                        uint32_t d;
                        if (h >= '0' && h <= '9') d = h - '0';
                        else if (h >= 'a' && h <= 'f') d = h - 'a' + 10;
                        else if (h >= 'A' && h <= 'F') d = h - 'A' + 10;
                        else return false;
                        v = (v << 4) | d;
                    }
                    return true;
                };
                uint32_t cp;
                if (hex4(i + 1, cp)) {
                    i += 4;
                    uint32_t lo;
                    if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 < raw.size() &&
                        raw[i + 1] == '\\' && raw[i + 2] == 'u' &&
                        hex4(i + 3, lo)) {
                        cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                        i += 6;
                    }
                    encode_utf8(cp, out);
                }  // malformed escape: drop it, keep the row
                break;
            }
            default: out += raw[i];
        }
    }
}

// Find the raw (still-escaped) string value after `"key":`. Returns false if
// the key is absent or not a string.
bool find_string_value(const std::string& line, const std::string& key,
                       size_t from, std::string& raw, size_t* value_end) {
    std::string needle = "\"" + key + "\"";
    size_t k = line.find(needle, from);
    if (k == std::string::npos) return false;
    size_t i = k + needle.size();
    while (i < line.size() && (line[i] == ' ' || line[i] == ':')) ++i;
    if (i >= line.size() || line[i] != '"') return false;
    size_t start = ++i;
    while (i < line.size()) {
        if (line[i] == '\\') { i += 2; continue; }
        if (line[i] == '"') break;
        ++i;
    }
    raw = line.substr(start, i - start);
    if (value_end) *value_end = i;
    return true;
}

void extract_texts(const std::string& line, std::vector<std::string>& texts) {
    std::string raw, decoded;
    for (const char* key : {"query", "positive", "negative"}) {
        if (find_string_value(line, key, 0, raw, nullptr)) {
            decode_json_string(raw, decoded);
            // parity with the Python reference (utils/idf.py
            // triplet_texts): empty fields are not documents — counting
            // them inflates N and shifts EVERY idf value
            if (!decoded.empty()) texts.push_back(decoded);
        }
    }
    // "negatives": [ "...", "..." ]
    size_t k = line.find("\"negatives\"");
    if (k != std::string::npos) {
        size_t lb = line.find('[', k);
        size_t rb = lb;
        if (lb != std::string::npos) {
            size_t i = lb + 1;
            while (i < line.size() && line[i] != ']') {
                if (line[i] == '"') {
                    size_t start = ++i;
                    while (i < line.size()) {
                        if (line[i] == '\\') { i += 2; continue; }
                        if (line[i] == '"') break;
                        ++i;
                    }
                    decode_json_string(line.substr(start, i - start), decoded);
                    if (!decoded.empty()) texts.push_back(decoded);
                }
                ++i;
            }
            (void)rb;
        }
    }
}

}  // namespace

int main(int argc, char** argv) {
    std::string vocab_path, out_prefix, mode = "bm25";
    int threads = (int)std::thread::hardware_concurrency();
    std::vector<std::string> files;
    for (int a = 1; a < argc; ++a) {
        std::string arg = argv[a];
        if (arg == "--vocab" && a + 1 < argc) vocab_path = argv[++a];
        else if (arg == "--output" && a + 1 < argc) out_prefix = argv[++a];
        else if (arg == "--mode" && a + 1 < argc) mode = argv[++a];
        else if (arg == "--threads" && a + 1 < argc) threads = std::stoi(argv[++a]);
        else files.push_back(arg);
    }
    if (vocab_path.empty() || out_prefix.empty() || files.empty()) {
        std::cerr << "usage: idf_compute --vocab vocab.txt --output prefix "
                  << "[--mode bm25|standard] [--threads N] files...\n";
        return 2;
    }

    WordPiece wp;
    wp.load(vocab_path);
    const size_t V = 50000 > wp.vocab.size() ? 50000 : wp.vocab.size();

    // Stream shards in bounded batches (docs = one text each; a triplet
    // row contributes its query/positive/negative(s) as separate
    // documents, matching the reference's per-text counting). Memory is
    // O(batch), not O(corpus): buffering every line of a 10M-doc corpus
    // (tens of GB of JSONL) OOMed the host before tokenization started.
    constexpr size_t kBatchLines = 200000;
    std::vector<std::string> lines;
    lines.reserve(kBatchLines);

    std::atomic<size_t> next_line{0};
    std::atomic<uint64_t> num_docs{0};
    std::mutex merge_mu;
    std::vector<uint64_t> df(V, 0);

    auto worker = [&]() {
        std::vector<uint64_t> local_df(V, 0);
        uint64_t local_docs = 0;
        std::vector<std::string> texts;
        std::vector<int32_t> ids;
        std::unordered_set<int32_t> uniq;
        for (;;) {
            size_t i = next_line.fetch_add(1);
            if (i >= lines.size()) break;
            texts.clear();
            extract_texts(lines[i], texts);
            for (const auto& t : texts) {
                ids.clear();
                uniq.clear();
                wp.tokenize(t, ids);
                for (int32_t id : ids)
                    if (id >= 0 && (size_t)id < V) uniq.insert(id);
                for (int32_t id : uniq) local_df[id]++;
                local_docs++;
            }
        }
        std::lock_guard<std::mutex> g(merge_mu);
        for (size_t v = 0; v < V; ++v) df[v] += local_df[v];
        num_docs += local_docs;
    };

    auto run_batch = [&]() {
        next_line.store(0);
        std::vector<std::thread> pool;
        for (int t = 0; t < std::max(threads, 1); ++t) pool.emplace_back(worker);
        for (auto& t : pool) t.join();
        lines.clear();
    };
    for (const auto& fp : files) {
        std::ifstream f(fp);
        if (!f) { std::cerr << "cannot open " << fp << "\n"; return 2; }
        std::string line;
        while (std::getline(f, line)) {
            if (!line.empty()) lines.push_back(std::move(line));
            if (lines.size() >= kBatchLines) run_batch();
        }
    }
    if (!lines.empty()) run_batch();

    const double N = (double)num_docs.load();
    std::vector<float> idf(V, 0.f);
    size_t nonzero = 0;
    for (size_t v = 0; v < V; ++v) {
        double d = (double)df[v];
        if (d > 0) nonzero++;
        if (mode == "bm25")
            idf[v] = (float)std::log(1.0 + (N - d + 0.5) / (d + 0.5));
        else
            idf[v] = (float)std::log(N / (d + 1.0));
    }

    std::ofstream bin(out_prefix + ".bin", std::ios::binary);
    bin.write(reinterpret_cast<const char*>(idf.data()),
              (std::streamsize)(idf.size() * sizeof(float)));
    bin.close();
    std::ofstream meta(out_prefix + ".json");
    meta << "{\"num_docs\": " << num_docs.load()
         << ", \"vocab_size\": " << V
         << ", \"mode\": \"" << mode << "\""
         << ", \"df_nonzero\": " << nonzero << "}\n";
    meta.close();
    std::cerr << "idf_compute: " << num_docs.load() << " docs, vocab " << V
              << ", nonzero df " << nonzero << " -> " << out_prefix << ".bin\n";
    return 0;
}
