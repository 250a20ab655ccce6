// Native CLIP byte-level BPE tokenizer for photoverse_tpu.
//
// C++ counterpart of photoverse_tpu/data/tokenizer.py (which itself replaces
// the transformers CLIPTokenizer the reference loads at
// /root/reference/models/modeling_utils.py:55): loads vocab.json +
// merges.txt from a Stable Diffusion checkpoint directory and implements
// lowercase + whitespace-collapse + the CLIP pre-tokenizer + GPT-2
// byte-to-unicode + BPE with a merge-rank table and per-word cache,
// emitting BOS + ids + EOS with EOS padding.
//
// Unicode note: the CLIP regex classes \p{L}/\p{N} are approximated —
// ASCII letters/digits exactly, and any non-ASCII codepoint is treated as
// a letter (identical to the Python fallback for the reference's ASCII
// prompt templates; the Python tokenizer remains the reference
// implementation for exotic unicode).
//
// Exposed as a C ABI for ctypes (photoverse_tpu/data/native_tokenizer.py).

#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <limits>
#include <mutex>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// GPT-2 byte <-> unicode symbol mapping (symbols stored as UTF-8 strings)
// ---------------------------------------------------------------------------

std::string cp_to_utf8(int cp) {
  std::string out;
  if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
  return out;
}

std::vector<std::string> bytes_to_unicode() {
  std::vector<int> bs;
  for (int b = '!'; b <= '~'; ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<int> cs = bs;
  std::vector<bool> present(256, false);
  for (int b : bs) present[b] = true;
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    if (!present[b]) {
      bs.push_back(b);
      cs.push_back(256 + n++);
    }
  }
  std::vector<std::string> table(256);
  for (size_t i = 0; i < bs.size(); ++i) table[bs[i]] = cp_to_utf8(cs[i]);
  return table;
}

// ---------------------------------------------------------------------------
// minimal JSON object parser for {"token": id, ...}
// ---------------------------------------------------------------------------

bool parse_json_string(const std::string& s, size_t& i, std::string& out) {
  // expects s[i] == '"'
  out.clear();
  if (s[i] != '"') return false;
  ++i;
  while (i < s.size()) {
    char c = s[i];
    if (c == '"') {
      ++i;
      return true;
    }
    if (c == '\\') {
      ++i;
      if (i >= s.size()) return false;
      char e = s[i];
      switch (e) {
        case '"': out.push_back('"'); break;
        case '\\': out.push_back('\\'); break;
        case '/': out.push_back('/'); break;
        case 'b': out.push_back('\b'); break;
        case 'f': out.push_back('\f'); break;
        case 'n': out.push_back('\n'); break;
        case 'r': out.push_back('\r'); break;
        case 't': out.push_back('\t'); break;
        case 'u': {
          if (i + 4 >= s.size()) return false;
          int cp = std::stoi(s.substr(i + 1, 4), nullptr, 16);
          i += 4;
          if (cp >= 0xD800 && cp <= 0xDBFF) {  // surrogate pair
            if (i + 6 >= s.size() || s[i + 1] != '\\' || s[i + 2] != 'u')
              return false;
            int lo = std::stoi(s.substr(i + 3, 4), nullptr, 16);
            i += 6;
            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            // 4-byte UTF-8
            std::string o;
            o.push_back(static_cast<char>(0xF0 | (cp >> 18)));
            o.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
            o.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
            o.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
            out += o;
          } else {
            out += cp_to_utf8(cp);
          }
          break;
        }
        default: return false;
      }
      ++i;
    } else {
      out.push_back(c);
      ++i;
    }
  }
  return false;
}

bool parse_vocab(const std::string& text,
                 std::unordered_map<std::string, int>& vocab) {
  size_t i = 0;
  auto skip_ws = [&]() {
    while (i < text.size() && std::isspace(static_cast<unsigned char>(text[i])))
      ++i;
  };
  skip_ws();
  if (i >= text.size() || text[i] != '{') return false;
  ++i;
  skip_ws();
  if (i < text.size() && text[i] == '}') return true;
  while (i < text.size()) {
    skip_ws();
    std::string key;
    if (!parse_json_string(text, i, key)) return false;
    skip_ws();
    if (i >= text.size() || text[i] != ':') return false;
    ++i;
    skip_ws();
    size_t j = i;
    while (j < text.size() &&
           (std::isdigit(static_cast<unsigned char>(text[j])) || text[j] == '-'))
      ++j;
    if (j == i) return false;
    vocab[key] = std::stoi(text.substr(i, j - i));
    i = j;
    skip_ws();
    if (i < text.size() && text[i] == ',') {
      ++i;
      continue;
    }
    if (i < text.size() && text[i] == '}') return true;
    return false;
  }
  return false;
}

// ---------------------------------------------------------------------------
// tokenizer
// ---------------------------------------------------------------------------

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003 ^
           std::hash<std::string>()(p.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
  std::vector<std::string> byte_enc = bytes_to_unicode();
  std::unordered_map<std::string, std::vector<int>> cache;
  std::mutex cache_mu;
  int bos = 0, eos = 0;

  std::vector<int> bpe(const std::string& mapped) {
    {
      std::lock_guard<std::mutex> g(cache_mu);
      auto it = cache.find(mapped);
      if (it != cache.end()) return it->second;
    }
    // split mapped (UTF-8) into codepoint symbols; last gets </w>
    std::vector<std::string> word;
    size_t i = 0;
    while (i < mapped.size()) {
      unsigned char c = mapped[i];
      size_t len = c < 0x80 ? 1 : (c < 0xE0 ? 2 : (c < 0xF0 ? 3 : 4));
      word.push_back(mapped.substr(i, len));
      i += len;
    }
    if (word.empty()) return {};
    word.back() += "</w>";

    while (word.size() > 1) {
      int best_rank = std::numeric_limits<int>::max();
      size_t best_i = 0;
      for (size_t k = 0; k + 1 < word.size(); ++k) {
        auto it = ranks.find({word[k], word[k + 1]});
        if (it != ranks.end() && it->second < best_rank) {
          best_rank = it->second;
          best_i = k;
        }
      }
      if (best_rank == std::numeric_limits<int>::max()) break;
      // merge ALL occurrences of this bigram left-to-right (GPT-2 BPE)
      const std::string first = word[best_i], second = word[best_i + 1];
      std::vector<std::string> merged;
      size_t k = 0;
      while (k < word.size()) {
        if (k + 1 < word.size() && word[k] == first && word[k + 1] == second) {
          merged.push_back(first + second);
          k += 2;
        } else {
          merged.push_back(word[k]);
          ++k;
        }
      }
      word.swap(merged);
    }
    std::vector<int> ids;
    ids.reserve(word.size());
    for (const auto& w : word) {
      auto it = vocab.find(w);
      // unknown symbols map to the unk token (= endoftext), matching
      // transformers' CLIPTokenizer
      ids.push_back(it != vocab.end() ? it->second : eos);
    }
    {
      std::lock_guard<std::mutex> g(cache_mu);
      cache.emplace(mapped, ids);
    }
    return ids;
  }

  // CLIP pre-tokenizer over a cleaned, lowercased string
  std::vector<std::string> pretokenize(const std::string& text) {
    std::vector<std::string> out;
    size_t i = 0;
    auto is_ascii_letter = [](unsigned char c) {
      return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
    };
    auto is_letterish = [&](unsigned char c) {
      return is_ascii_letter(c) || c >= 0x80;  // non-ASCII ~ letter
    };
    while (i < text.size()) {
      unsigned char c = text[i];
      if (std::isspace(c)) {
        ++i;
        continue;
      }
      // special tokens pass through verbatim
      if (c == '<') {
        static const char* kSpecials[] = {"<|startoftext|>", "<|endoftext|>"};
        bool matched = false;
        for (const char* sp : kSpecials) {
          size_t n = std::strlen(sp);
          if (text.compare(i, n, sp) == 0) {
            out.emplace_back(sp);
            i += n;
            matched = true;
            break;
          }
        }
        if (matched) continue;
      }
      // contractions 's 't 're 've 'm 'll 'd
      if (c == '\'') {
        static const char* kContr[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
        bool matched = false;
        for (const char* ct : kContr) {
          size_t n = std::strlen(ct);
          if (text.compare(i, n, ct) == 0) {
            // longest-first ordering matters for 'l vs 'll etc.; the array
            // is checked in the regex's alternation order like Python
            out.emplace_back(ct);
            i += n;
            matched = true;
            break;
          }
        }
        if (matched) continue;
      }
      if (is_letterish(c)) {
        size_t j = i;
        while (j < text.size() && is_letterish(static_cast<unsigned char>(text[j])))
          ++j;
        out.push_back(text.substr(i, j - i));
        i = j;
        continue;
      }
      if (std::isdigit(c)) {  // single digit per token
        out.push_back(text.substr(i, 1));
        ++i;
        continue;
      }
      // punctuation run [^\s\p{L}\p{N}]+ — '_' is neither letter nor digit
      // in CLIP's regex, so it belongs to this run (the Python port matches
      // with (?:[^\s\w]|_)+). NOTE: like the regex, the greedy run consumes
      // ' and < too; special tokens / contractions are only recognized at
      // scan-start positions (the alternation is tried once per position,
      // so "!!'s" tokenizes as ["!!'", "s"], not ["!!", "'s"])
      size_t j = i;
      while (j < text.size()) {
        unsigned char d = text[j];
        if (d != '_' && (std::isspace(d) || is_letterish(d) || std::isdigit(d)))
          break;
        ++j;
      }
      out.push_back(text.substr(i, j - i));
      i = j;
    }
    return out;
  }

  void encode(const std::string& raw, int32_t* out, int max_len) {
    // whitespace-collapse + strip + ASCII lowercase
    std::string text;
    text.reserve(raw.size());
    bool in_space = true;  // strip leading
    for (unsigned char c : raw) {
      if (std::isspace(c)) {
        if (!in_space) text.push_back(' ');
        in_space = true;
      } else {
        text.push_back(std::tolower(c));
        in_space = false;
      }
    }
    while (!text.empty() && text.back() == ' ') text.pop_back();

    std::vector<int> ids;
    for (const auto& tok : pretokenize(text)) {
      auto sp = vocab.find(tok);
      if ((tok == "<|startoftext|>" || tok == "<|endoftext|>") &&
          sp != vocab.end()) {
        ids.push_back(sp->second);
        continue;
      }
      std::string mapped;
      for (unsigned char b : tok) mapped += byte_enc[b];
      auto sub = bpe(mapped);
      ids.insert(ids.end(), sub.begin(), sub.end());
    }
    if (static_cast<int>(ids.size()) > max_len - 2)
      ids.resize(max_len - 2);
    int n = 0;
    out[n++] = bos;
    for (int id : ids) out[n++] = id;
    while (n < max_len) out[n++] = eos;
  }
};

Tokenizer* pvtok_create_impl(const char* vocab_path, const char* merges_path) {
  std::ifstream vf(vocab_path, std::ios::binary);
  if (!vf) return nullptr;
  std::stringstream vs;
  vs << vf.rdbuf();
  auto* t = new Tokenizer();
  if (!parse_vocab(vs.str(), t->vocab)) {
    delete t;
    return nullptr;
  }
  std::ifstream mf(merges_path, std::ios::binary);
  if (!mf) {
    delete t;
    return nullptr;
  }
  std::string line;
  int rank = 0;
  bool first_line = true;
  // transformers drops exactly the FIRST line (version header) and caps the
  // merge count; merges whose first symbol is '#' are kept
  constexpr int kMaxMerges = 49152 - 256 - 2;
  while (std::getline(mf, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (first_line) {
      first_line = false;
      continue;
    }
    if (line.empty() || rank >= kMaxMerges) continue;
    size_t sp = line.find(' ');
    if (sp == std::string::npos) continue;
    t->ranks[{line.substr(0, sp), line.substr(sp + 1)}] = rank++;
  }
  auto b = t->vocab.find("<|startoftext|>");
  auto e = t->vocab.find("<|endoftext|>");
  if (b == t->vocab.end() || e == t->vocab.end()) {
    delete t;
    return nullptr;
  }
  t->bos = b->second;
  t->eos = e->second;
  return t;
}

}  // namespace

extern "C" {

Tokenizer* pvtok_create(const char* vocab_path, const char* merges_path) {
  // exceptions (e.g. std::stoi on a malformed \u escape in a corrupt
  // vocab.json) must not cross the C ABI into ctypes — that would
  // std::terminate the whole Python process instead of triggering the
  // caller's NativeTokenizerUnavailable fallback
  try {
    return pvtok_create_impl(vocab_path, merges_path);
  } catch (...) {
    return nullptr;
  }
}

void pvtok_destroy(Tokenizer* t) { delete t; }

// Encodes n texts into out (n x max_len int32, BOS + ids + EOS, EOS-padded).
void pvtok_encode_batch(Tokenizer* t, const char** texts, int n,
                        int32_t* out, int max_len) {
  for (int i = 0; i < n; ++i)
    t->encode(texts[i] ? texts[i] : "", out + static_cast<size_t>(i) * max_len,
              max_len);
}

}  // extern "C"
