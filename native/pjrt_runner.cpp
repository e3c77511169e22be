// pjrt_runner — native serving host for exported StableHLO executables.
//
// Drives any PJRT plugin (libtpu.so, a tunneled PJRT proxy, ...) through the
// stable PJRT C API: dlopen → GetPjrtApi → client → compile the StableHLO
// module exported by iris_tts_tpu.serve.export (the raw `.mlir.bc` beside
// each `.shlo`) → execute with .npy inputs → write .npy outputs. This is the
// zero-Python serving path the AOT artifact docstring promises: the whole
// Python framework is needed only at export time; production inference is
// this binary plus the artifact directory.
//
// The reference project has no native runtime at all (SURVEY.md §2.3 — all
// its native functionality is third-party libraries); this and wavio.cpp are
// the rebuild's first-party native runtime components.
//
// Usage:
//   pjrt_runner --plugin /path/libtpu.so --probe
//   pjrt_runner --plugin SO [--option k=s:v|i:v|b:v|f:v ...]
//       --module synth_b1_p64.mlir.bc [--compile-options opts.pb]
//       --arg ids.npy --arg lengths.npy --arg i32:0 --arg f32:1.0
//       [--iters N] [--out-prefix /tmp/out] [--device 0]
//   pjrt_runner --npy-roundtrip in.npy out.npy   # IO self-test, no device
//
// `--serve` turns the one-shot run into a long-lived serving process:
// after compiling once it reads requests from stdin, one per line —
//   <arg> <arg> ... <out-prefix>
// (same <arg> syntax as --arg) — executes, writes the outputs, and prints
// one JSON line per request to stdout. The per-process compile cost is
// paid once; every request after that is upload + execute + fetch.
//
// ARTIFACT MODE — the full serving host (VERDICT r3 item 2):
//   pjrt_runner --plugin SO [--option ...] --artifact DIR
//       [--lexicon cmu_dict.txt] [--lazy] [--npy] [--dry-run]
// loads the WHOLE AOT artifact directory (manifest.json + vocab.json +
// every (B, P) synthesis bucket, docs/AOT_ARTIFACT.md), compiles all
// buckets up front (or per-use with --lazy), and serves TEXT requests on
// stdin, one per line, tab-separated:
//   synth<TAB>out_base<TAB>seed<TAB>temperature<TAB>raw text...
//   ids<TAB>out_base<TAB>seed<TAB>temperature<TAB>4,12,9,31
// For each request the host tokenizes (lowercase words → CMUdict phones →
// stress-stripped vocab ids; words missing from the lexicon → <UNK>; a
// pre-tokenized `ids` request skips the frontend), picks the smallest
// exported bucket that fits, executes, trims the audio to the true frame
// count, and writes `out_base.wav` (16-bit PCM, the wavio.cpp codec).
// One JSON reply per request on stdout: bucket, frames, deficit, timing.
// `--dry-run` exercises the identical request path without any plugin
// (tokenize + bucket pick only) — the CPU-testable contract. Text
// normalization (numbers, dates) is the Python frontend's job; this host
// expects normalized text and maps anything unpronounceable to <UNK>.
//
// `--arg` order must match the executable's flattened argument order; a
// bare path loads a .npy array, `TYPE:value` makes a rank-0 scalar. Exactly
// one JSON line goes to stdout per request (timings + shapes); diagnostics
// go to stderr. Exit 0 on success.

#include <dlfcn.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <deque>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

// wavio.cpp (linked into this binary): mono float32 → 16-bit PCM WAV.
extern "C" int iris_write_wav_pcm16(const char* path, const float* samples,
                                    int64_t n_samples, int sample_rate);

namespace {

struct FatalError {
  std::string msg;
};

[[noreturn]] void Fatal(const std::string& msg) { throw FatalError{msg}; }

std::string ErrorMessage(const PJRT_Api* api, PJRT_Error* err) {
  PJRT_Error_Message_Args m;
  std::memset(&m, 0, sizeof(m));
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  api->PJRT_Error_Message(&m);
  std::string out(m.message, m.message_size);
  PJRT_Error_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  api->PJRT_Error_Destroy(&d);
  return out;
}

#define CALL(api, fn, args)                                         \
  do {                                                              \
    PJRT_Error* _err = (api)->fn(&(args));                          \
    if (_err != nullptr) Fatal(#fn ": " + ErrorMessage(api, _err)); \
  } while (0)

void AwaitEvent(const PJRT_Api* api, PJRT_Event* ev) {
  PJRT_Event_Await_Args a;
  std::memset(&a, 0, sizeof(a));
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  CALL(api, PJRT_Event_Await, a);
  PJRT_Event_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  CALL(api, PJRT_Event_Destroy, d);
}

// ---------------------------------------------------------------------------
// Minimal .npy v1.0 IO (C-order, little-endian; the formats the framework's
// serving surface uses).
// ---------------------------------------------------------------------------

struct DtypeInfo {
  const char* npy;  // descr string
  PJRT_Buffer_Type pjrt;
  size_t itemsize;
};

const DtypeInfo kDtypes[] = {
    {"<f4", PJRT_Buffer_Type_F32, 4}, {"<i4", PJRT_Buffer_Type_S32, 4},
    {"<i8", PJRT_Buffer_Type_S64, 8}, {"<i2", PJRT_Buffer_Type_S16, 2},
    {"<f2", PJRT_Buffer_Type_F16, 2}, {"|b1", PJRT_Buffer_Type_PRED, 1},
};

const DtypeInfo* DtypeByNpy(const std::string& descr) {
  for (const auto& d : kDtypes)
    if (descr == d.npy) return &d;
  return nullptr;
}

const DtypeInfo* DtypeByPjrt(PJRT_Buffer_Type t) {
  for (const auto& d : kDtypes)
    if (t == d.pjrt) return &d;
  return nullptr;
}

struct HostArray {
  const DtypeInfo* dtype = nullptr;
  std::vector<int64_t> dims;
  std::vector<char> data;
  size_t NumElements() const {
    size_t n = 1;
    for (int64_t d : dims) n *= static_cast<size_t>(d);
    return n;
  }
};

HostArray ReadNpy(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Fatal("cannot open " + path);
  char magic[8];
  f.read(magic, 8);
  if (!f || std::memcmp(magic, "\x93NUMPY", 6) != 0)
    Fatal(path + ": not a .npy file");
  uint8_t major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t hl;
    f.read(reinterpret_cast<char*>(&hl), 2);
    header_len = hl;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
  }
  // Hostile-input bound: real npy headers are well under 64 KiB; a forged
  // multi-GiB header_len must not drive a giant allocation.
  if (header_len == 0 || header_len > (1u << 20))
    Fatal(path + ": implausible npy header length");
  std::string header(header_len, '\0');
  f.read(header.data(), header_len);
  if (!f) Fatal(path + ": truncated npy header");
  auto field = [&](const char* key) -> std::string {
    size_t k = header.find(key);
    if (k == std::string::npos) Fatal(path + ": npy header missing " + key);
    return header.substr(k);
  };
  std::string descr = field("'descr'");
  size_t q1 = descr.find('\'', 8);
  size_t q2 = q1 == std::string::npos
                  ? std::string::npos
                  : descr.find('\'', q1 + 1);
  if (q2 == std::string::npos) Fatal(path + ": malformed descr field");
  std::string dt = descr.substr(q1 + 1, q2 - q1 - 1);
  HostArray arr;
  arr.dtype = DtypeByNpy(dt);
  if (arr.dtype == nullptr) Fatal(path + ": unsupported dtype " + dt);
  if (field("'fortran_order'").find("True") < 32)
    Fatal(path + ": fortran_order arrays unsupported");
  std::string shape = field("'shape'");
  size_t p1 = shape.find('('), p2 = shape.find(')');
  if (p1 == std::string::npos || p2 == std::string::npos || p2 < p1)
    Fatal(path + ": malformed shape field");
  std::stringstream ss(shape.substr(p1 + 1, p2 - p1 - 1));
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    if (tok.find_first_of("0123456789") == std::string::npos) continue;
    int64_t d = 0;
    try {
      d = std::stoll(tok);
    } catch (const std::exception&) {  // 10^40-digit dims etc.
      Fatal(path + ": malformed shape dimension '" + tok + "'");
    }
    if (d < 0) Fatal(path + ": negative shape dimension");
    arr.dims.push_back(d);
  }
  // Overflow-safe element count: forged shapes must not wrap size_t and
  // under-allocate (heap overflow on the subsequent read).
  size_t n = 1;
  for (int64_t d : arr.dims) {
    if (d != 0 && n > (size_t{1} << 40) / static_cast<size_t>(d))
      Fatal(path + ": implausible element count");
    n *= static_cast<size_t>(d);
  }
  arr.data.resize(n * arr.dtype->itemsize);
  f.read(arr.data.data(), static_cast<std::streamsize>(arr.data.size()));
  if (!f) Fatal(path + ": truncated data");
  return arr;
}

void WriteNpy(const std::string& path, const HostArray& arr) {
  std::ostringstream hdr;
  hdr << "{'descr': '" << arr.dtype->npy << "', 'fortran_order': False, "
      << "'shape': (";
  for (size_t i = 0; i < arr.dims.size(); i++)
    hdr << arr.dims[i] << (arr.dims.size() == 1 ? "," : "")
        << (i + 1 < arr.dims.size() ? ", " : "");
  hdr << "), }";
  std::string h = hdr.str();
  size_t total = 10 + h.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  h += std::string(pad, ' ');
  h += '\n';
  uint16_t hl = static_cast<uint16_t>(h.size());
  std::ofstream f(path, std::ios::binary);
  if (!f) Fatal("cannot write " + path);
  f.write("\x93NUMPY\x01\x00", 8);
  f.write(reinterpret_cast<char*>(&hl), 2);
  f.write(h.data(), static_cast<std::streamsize>(h.size()));
  f.write(arr.data.data(), static_cast<std::streamsize>(arr.data.size()));
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Fatal("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

double NowMs() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1e3 + ts.tv_nsec / 1e6;
}

// ---------------------------------------------------------------------------
// Minimal JSON parser — just enough for the machine-generated manifest.json
// and vocab.json of the AOT artifact (docs/AOT_ARTIFACT.md). Strict bounds,
// depth-limited, hostile input → clean FatalError, never UB.
// ---------------------------------------------------------------------------

struct Json {
  enum Kind { kNull, kBool, kNum, kStr, kArr, kObj } kind = kNull;
  bool b = false;
  double num = 0;
  std::string str;
  std::vector<Json> arr;
  std::vector<std::pair<std::string, Json>> obj;

  const Json* Find(const std::string& key) const {
    for (const auto& kv : obj)
      if (kv.first == key) return &kv.second;
    return nullptr;
  }
  const Json& At(const std::string& key) const {
    const Json* v = Find(key);
    if (v == nullptr) Fatal("json: missing key '" + key + "'");
    return *v;
  }
  int64_t AsInt() const {
    if (kind != kNum) Fatal("json: expected number");
    return static_cast<int64_t>(num);
  }
  const std::string& AsStr() const {
    if (kind != kStr) Fatal("json: expected string");
    return str;
  }
};

class JsonParser {
 public:
  explicit JsonParser(const std::string& text)
      : p_(text.data()), end_(text.data() + text.size()) {}

  Json Parse() {
    Json v = ParseValue(0);
    SkipWs();
    if (p_ != end_) Fatal("json: trailing garbage");
    return v;
  }

 private:
  void SkipWs() {
    while (p_ != end_ && (*p_ == ' ' || *p_ == '\t' || *p_ == '\n' ||
                          *p_ == '\r'))
      p_++;
  }
  char Peek() {
    SkipWs();
    if (p_ == end_) Fatal("json: unexpected end");
    return *p_;
  }
  void Expect(char c) {
    if (Peek() != c) Fatal(std::string("json: expected '") + c + "'");
    p_++;
  }
  bool Eat(const char* lit) {
    size_t n = std::strlen(lit);
    if (static_cast<size_t>(end_ - p_) >= n &&
        std::memcmp(p_, lit, n) == 0) {
      p_ += n;
      return true;
    }
    return false;
  }
  Json ParseValue(int depth) {
    if (depth > 32) Fatal("json: nesting too deep");
    switch (Peek()) {
      case '{': {
        Json v;
        v.kind = Json::kObj;
        p_++;
        if (Peek() == '}') { p_++; return v; }
        while (true) {
          std::string key = ParseString();
          Expect(':');
          v.obj.emplace_back(std::move(key), ParseValue(depth + 1));
          char c = Peek();
          p_++;
          if (c == '}') return v;
          if (c != ',') Fatal("json: expected ',' or '}'");
        }
      }
      case '[': {
        Json v;
        v.kind = Json::kArr;
        p_++;
        if (Peek() == ']') { p_++; return v; }
        while (true) {
          v.arr.push_back(ParseValue(depth + 1));
          char c = Peek();
          p_++;
          if (c == ']') return v;
          if (c != ',') Fatal("json: expected ',' or ']'");
        }
      }
      case '"': {
        Json v;
        v.kind = Json::kStr;
        v.str = ParseString();
        return v;
      }
      default: {
        SkipWs();
        Json v;
        if (Eat("true")) { v.kind = Json::kBool; v.b = true; return v; }
        if (Eat("false")) { v.kind = Json::kBool; v.b = false; return v; }
        if (Eat("null")) { v.kind = Json::kNull; return v; }
        const char* start = p_;
        while (p_ != end_ &&
               (std::isdigit(static_cast<unsigned char>(*p_)) ||
                *p_ == '-' || *p_ == '+' || *p_ == '.' || *p_ == 'e' ||
                *p_ == 'E'))
          p_++;
        if (p_ == start) Fatal("json: unexpected character");
        try {
          v.num = std::stod(std::string(start, p_));
        } catch (const std::exception&) {
          Fatal("json: malformed number");
        }
        v.kind = Json::kNum;
        return v;
      }
    }
  }
  std::string ParseString() {
    Expect('"');
    std::string out;
    while (true) {
      if (p_ == end_) Fatal("json: unterminated string");
      char c = *p_++;
      if (c == '"') return out;
      if (c == '\\') {
        if (p_ == end_) Fatal("json: bad escape");
        char e = *p_++;
        switch (e) {
          case '"': out += '"'; break;
          case '\\': out += '\\'; break;
          case '/': out += '/'; break;
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {
            // Artifact files are ASCII; decode BMP escapes to '?' beyond
            // ASCII rather than implementing UTF-16 surrogates.
            if (end_ - p_ < 4) Fatal("json: bad \\u escape");
            int code = 0;
            for (int i = 0; i < 4; i++) {
              char h = *p_++;
              code <<= 4;
              if (h >= '0' && h <= '9') code += h - '0';
              else if (h >= 'a' && h <= 'f') code += h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') code += h - 'A' + 10;
              else Fatal("json: bad \\u escape");
            }
            out += code < 128 ? static_cast<char>(code) : '?';
            break;
          }
          default:
            Fatal("json: unknown escape");
        }
      } else {
        out += c;
      }
    }
  }
  const char* p_;
  const char* end_;
};

// ---------------------------------------------------------------------------
// Host text frontend for artifact serving: vocab.json + CMUdict lexicon.
// Python's frontend owns normalization/G2P; this maps (normalized) words to
// stress-stripped ARPABET ids with <UNK> fallback — the contract of
// iris_tts_tpu/text/frontend.py:123-171 minus the neural G2P.
// ---------------------------------------------------------------------------

struct Frontend {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, std::vector<std::string>> lexicon;
  int32_t pad_id = 0, unk_id = 1;

  void LoadVocab(const std::string& path) {
    Json v = JsonParser(ReadFile(path)).Parse();
    if (v.kind != Json::kObj) Fatal(path + ": vocab.json must be an object");
    for (const auto& kv : v.obj)
      vocab[kv.first] = static_cast<int32_t>(kv.second.AsInt());
    auto pad = vocab.find("<PAD>"), unk = vocab.find("<UNK>");
    if (pad != vocab.end()) pad_id = pad->second;
    if (unk != vocab.end()) unk_id = unk->second;
  }

  static std::string StripStress(const std::string& phone) {
    std::string out = phone;
    while (!out.empty() &&
           std::isdigit(static_cast<unsigned char>(out.back())))
      out.pop_back();
    return out;
  }

  void LoadLexicon(const std::string& path) {
    std::ifstream f(path);
    if (!f) Fatal("cannot open lexicon " + path);
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty() || line[0] == ';') continue;
      std::stringstream ss(line);
      std::string word;
      ss >> word;
      if (word.empty()) continue;
      // alternate pronunciations "WORD(2)": first one wins, skip the rest
      if (word.back() == ')') continue;
      std::transform(word.begin(), word.end(), word.begin(),
                     [](unsigned char c) { return std::tolower(c); });
      if (lexicon.count(word)) continue;
      std::vector<std::string> phones;
      std::string ph;
      while (ss >> ph) phones.push_back(StripStress(ph));
      if (!phones.empty()) lexicon.emplace(std::move(word),
                                           std::move(phones));
    }
    if (lexicon.empty()) Fatal(path + ": no lexicon entries parsed");
  }

  // normalized text → vocab ids (lowercase, strip non-alpha/apostrophe,
  // lexicon lookup with apostrophe-less retry, <UNK> fallback).
  std::vector<int32_t> TextToIds(const std::string& text) const {
    std::vector<int32_t> ids;
    std::string word;
    auto flush = [&]() {
      if (word.empty()) return;
      const std::vector<std::string>* phones = nullptr;
      auto it = lexicon.find(word);
      if (it != lexicon.end()) {
        phones = &it->second;
      } else if (word.find('\'') != std::string::npos) {
        std::string plain;
        for (char c : word)
          if (c != '\'') plain += c;
        auto it2 = lexicon.find(plain);
        if (it2 != lexicon.end()) phones = &it2->second;
      }
      if (phones == nullptr) {
        ids.push_back(unk_id);
      } else {
        for (const std::string& p : *phones) {
          auto v = vocab.find(p);
          ids.push_back(v == vocab.end() ? unk_id : v->second);
        }
      }
      word.clear();
    };
    for (char ch : text) {
      unsigned char c = static_cast<unsigned char>(ch);
      if (std::isalpha(c)) word += static_cast<char>(std::tolower(c));
      else if (ch == '\'') word += ch;
      else flush();
    }
    flush();
    if (ids.empty()) ids.push_back(unk_id);
    return ids;
  }

  static std::vector<int32_t> ParseIdsCsv(const std::string& csv) {
    std::vector<int32_t> ids;
    std::stringstream ss(csv);
    std::string tok;
    while (std::getline(ss, tok, ',')) {
      try {
        ids.push_back(static_cast<int32_t>(std::stol(tok)));
      } catch (const std::exception&) {
        Fatal("bad id token '" + tok + "'");
      }
    }
    if (ids.empty()) Fatal("empty id list");
    return ids;
  }
};

// ---------------------------------------------------------------------------
// PJRT context: plugin + client + device + buffer/executable plumbing,
// shared by the --module path and the artifact serving host.
// ---------------------------------------------------------------------------

struct OptionStorage {
  // deque: push_back never relocates existing elements, so the c_str()
  // pointers stored into PJRT_NamedValue stay valid as options accumulate.
  std::deque<std::string> strings;
  std::vector<PJRT_NamedValue> values;
};

void ParseOption(const std::string& spec, OptionStorage* out) {
  size_t eq = spec.find('=');
  if (eq == std::string::npos || eq + 2 >= spec.size() || spec[eq + 2] != ':')
    Fatal("--option wants name=TYPE:value (TYPE in s,i,b,f): " + spec);
  out->strings.push_back(spec.substr(0, eq));  // name
  const std::string& name = out->strings.back();
  char type = spec[eq + 1];
  std::string val = spec.substr(eq + 3);
  PJRT_NamedValue nv;
  std::memset(&nv, 0, sizeof(nv));
  nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
  nv.name = name.c_str();
  nv.name_size = name.size();
  nv.value_size = 1;
  switch (type) {
    case 's':
      out->strings.push_back(val);
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = out->strings.back().c_str();
      nv.value_size = out->strings.back().size();
      break;
    case 'i':
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = std::stoll(val);
      break;
    case 'b':
      nv.type = PJRT_NamedValue_kBool;
      nv.bool_value = (val == "true" || val == "1");
      break;
    case 'f':
      nv.type = PJRT_NamedValue_kFloat;
      nv.float_value = std::stof(val);
      break;
    default:
      Fatal(std::string("--option: unknown TYPE '") + type + "'");
  }
  out->values.push_back(nv);
}

// --arg TYPE:value scalar (rank 0).
bool ParseScalarArg(const std::string& spec, HostArray* out) {
  size_t c = spec.find(':');
  if (c == std::string::npos) return false;
  std::string t = spec.substr(0, c), v = spec.substr(c + 1);
  if (t == "i32") {
    out->dtype = DtypeByNpy("<i4");
    int32_t x = static_cast<int32_t>(std::stoll(v));
    out->data.assign(reinterpret_cast<char*>(&x),
                     reinterpret_cast<char*>(&x) + 4);
  } else if (t == "f32") {
    out->dtype = DtypeByNpy("<f4");
    float x = std::stof(v);
    out->data.assign(reinterpret_cast<char*>(&x),
                     reinterpret_cast<char*>(&x) + 4);
  } else if (t == "i64") {
    out->dtype = DtypeByNpy("<i8");
    int64_t x = std::stoll(v);
    out->data.assign(reinterpret_cast<char*>(&x),
                     reinterpret_cast<char*>(&x) + 8);
  } else {
    return false;
  }
  return true;
}

struct Pjrt {
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  double client_ms = 0;

  static const PJRT_Api* LoadPlugin(const std::string& plugin) {
    void* handle = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
    if (handle == nullptr) Fatal(std::string("dlopen: ") + dlerror());
    auto get_api =
        reinterpret_cast<const PJRT_Api* (*)()>(dlsym(handle, "GetPjrtApi"));
    if (get_api == nullptr) Fatal("plugin has no GetPjrtApi symbol");
    const PJRT_Api* api = get_api();
    if (api == nullptr) Fatal("GetPjrtApi returned null");
    std::fprintf(stderr, "pjrt_runner: %s PJRT API %d.%d\n", plugin.c_str(),
                 api->pjrt_api_version.major_version,
                 api->pjrt_api_version.minor_version);
    return api;
  }

  void Open(const PJRT_Api* a, OptionStorage& options, int device_index) {
    api = a;
    PJRT_Plugin_Initialize_Args init;
    std::memset(&init, 0, sizeof(init));
    init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CALL(api, PJRT_Plugin_Initialize, init);

    PJRT_Client_Create_Args cc;
    std::memset(&cc, 0, sizeof(cc));
    cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    cc.create_options = options.values.data();
    cc.num_options = options.values.size();
    double t0 = NowMs();
    CALL(api, PJRT_Client_Create, cc);
    client = cc.client;
    client_ms = NowMs() - t0;

    PJRT_Client_AddressableDevices_Args dev;
    std::memset(&dev, 0, sizeof(dev));
    dev.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    dev.client = client;
    CALL(api, PJRT_Client_AddressableDevices, dev);
    if (dev.num_addressable_devices == 0) Fatal("no addressable devices");
    if (device_index >= static_cast<int>(dev.num_addressable_devices))
      Fatal("--device out of range");
    device = dev.addressable_devices[device_index];
    std::fprintf(stderr, "pjrt_runner: client up (%.0f ms), %zu device(s)\n",
                 client_ms, dev.num_addressable_devices);
  }

  PJRT_LoadedExecutable* Compile(const std::string& code,
                                 const std::string& copts,
                                 double* compile_ms) const {
    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = const_cast<char*>(code.data());
    program.code_size = code.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;
    PJRT_Client_Compile_Args comp;
    std::memset(&comp, 0, sizeof(comp));
    comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    comp.client = client;
    comp.program = &program;
    comp.compile_options = copts.data();
    comp.compile_options_size = copts.size();
    double t0 = NowMs();
    CALL(api, PJRT_Client_Compile, comp);
    if (compile_ms != nullptr) *compile_ms = NowMs() - t0;
    return comp.executable;
  }

  size_t NumOutputs(PJRT_LoadedExecutable* loaded) const {
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    std::memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = loaded;
    CALL(api, PJRT_LoadedExecutable_GetExecutable, ge);
    PJRT_Executable_NumOutputs_Args no;
    std::memset(&no, 0, sizeof(no));
    no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no.executable = ge.executable;
    CALL(api, PJRT_Executable_NumOutputs, no);
    PJRT_Executable_Destroy_Args ed;
    std::memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
    ed.executable = ge.executable;
    CALL(api, PJRT_Executable_Destroy, ed);
    return no.num_outputs;
  }

  PJRT_Buffer* Upload(const HostArray& arr) const {
    PJRT_Client_BufferFromHostBuffer_Args b;
    std::memset(&b, 0, sizeof(b));
    b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    b.client = client;
    b.data = arr.data.data();
    b.type = arr.dtype->pjrt;
    b.dims = arr.dims.data();
    b.num_dims = arr.dims.size();
    b.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    b.device = device;
    CALL(api, PJRT_Client_BufferFromHostBuffer, b);
    AwaitEvent(api, b.done_with_host_buffer);
    return b.buffer;
  }

  void DestroyBuffer(PJRT_Buffer* buf) const {
    PJRT_Buffer_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.buffer = buf;
    CALL(api, PJRT_Buffer_Destroy, d);
  }

  void Fetch(PJRT_Buffer* buf, HostArray* out) const {
    PJRT_Buffer_ElementType_Args et;
    std::memset(&et, 0, sizeof(et));
    et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    et.buffer = buf;
    CALL(api, PJRT_Buffer_ElementType, et);
    out->dtype = DtypeByPjrt(et.type);
    PJRT_Buffer_Dimensions_Args bd;
    std::memset(&bd, 0, sizeof(bd));
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = buf;
    CALL(api, PJRT_Buffer_Dimensions, bd);
    out->dims.assign(bd.dims, bd.dims + bd.num_dims);
    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = buf;
    CALL(api, PJRT_Buffer_ToHostBuffer, th);  // dst=null → size query
    out->data.resize(th.dst_size);
    th.dst = out->data.data();
    CALL(api, PJRT_Buffer_ToHostBuffer, th);
    AwaitEvent(api, th.event);
  }

  // Execute + fetch every output. Timing includes one host fetch of every
  // output — device-completion events alone do not reliably block on
  // proxied backends, and serving pays the fetch anyway.
  double Execute(PJRT_LoadedExecutable* loaded,
                 const std::vector<PJRT_Buffer*>& ins,
                 std::vector<HostArray>* host_out) const {
    size_t num_outputs = host_out->size();
    std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
    PJRT_ExecuteOptions eopts;
    std::memset(&eopts, 0, sizeof(eopts));
    eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* const* arg_list = ins.data();
    PJRT_Buffer** out_list = outputs.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args ex;
    std::memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = loaded;
    ex.options = &eopts;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = ins.size();
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;
    ex.execute_device = device;
    double s = NowMs();
    CALL(api, PJRT_LoadedExecutable_Execute, ex);
    if (done != nullptr) AwaitEvent(api, done);
    for (size_t o = 0; o < num_outputs; o++) {
      Fetch(outputs[o], &(*host_out)[o]);
      DestroyBuffer(outputs[o]);
    }
    return NowMs() - s;
  }

  void DestroyClient() {
    if (client == nullptr) return;
    PJRT_Client_Destroy_Args cd;
    std::memset(&cd, 0, sizeof(cd));
    cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    cd.client = client;
    CALL(api, PJRT_Client_Destroy, cd);
    client = nullptr;
  }
};

std::string ShapesJson(const std::vector<HostArray>& host_out,
                       const std::string& prefix) {
  std::ostringstream shapes;
  shapes << "[";
  for (size_t o = 0; o < host_out.size(); o++) {
    if (host_out[o].dtype == nullptr) Fatal("output dtype unsupported");
    if (!prefix.empty())
      WriteNpy(prefix + "_" + std::to_string(o) + ".npy", host_out[o]);
    shapes << (o ? ", " : "") << "[";
    for (size_t d = 0; d < host_out[o].dims.size(); d++)
      shapes << (d ? ", " : "") << host_out[o].dims[d];
    shapes << "]";
  }
  shapes << "]";
  return shapes.str();
}

std::string JsonEscape(const std::string& in) {
  std::string out;
  for (char c : in)
    out += (c == '"' || c == '\\' || c == '\n' || c == '\r') ? ' ' : c;
  return out;
}

// ---------------------------------------------------------------------------
// Artifact serving host: manifest + all buckets + vocab (+ lexicon) →
// long-lived text/ids request loop (docs/AOT_ARTIFACT.md calling
// convention, format_version 2).
// ---------------------------------------------------------------------------

struct Bucket {
  int64_t batch = 0, phonemes = 0, frames = 0;
  std::string mlir_path;
  PJRT_LoadedExecutable* exe = nullptr;  // compiled lazily or up front
  size_t num_outputs = 0;
  double compile_ms = 0;
};

struct ArtifactHost {
  Pjrt pjrt;
  Frontend frontend;
  std::vector<Bucket> buckets;  // sorted by (batch, phonemes)
  std::string copts;
  int64_t sample_rate = 22050, samples_per_frame = 256;
  bool dry_run = false, write_npy = false;

  void Load(const std::string& dir) {
    Json manifest = JsonParser(ReadFile(dir + "/manifest.json")).Parse();
    int64_t fmt = manifest.At("format_version").AsInt();
    if (fmt != 2)
      Fatal("artifact format_version " + std::to_string(fmt) +
            " unsupported (want 2) — re-export with scripts/"
            "export_serving.py");
    sample_rate = manifest.At("sample_rate").AsInt();
    samples_per_frame = manifest.At("samples_per_frame").AsInt();
    const Json* co = manifest.Find("compile_options");
    if (co != nullptr && co->kind == Json::kStr)
      copts = ReadFile(dir + "/" + co->AsStr());
    for (const Json& e : manifest.At("entries").arr) {
      Bucket b;
      b.batch = e.At("batch").AsInt();
      b.phonemes = e.At("phoneme_bucket").AsInt();
      b.frames = e.At("frame_bucket").AsInt();
      const Json* mf = e.Find("mlir_file");
      if (mf == nullptr)
        Fatal("artifact entry lacks mlir_file (re-export: only .shlo "
              "envelopes present, which need the Python loader)");
      b.mlir_path = dir + "/" + mf->AsStr();
      buckets.push_back(std::move(b));
    }
    if (buckets.empty()) Fatal("artifact has no synthesis entries");
    std::sort(buckets.begin(), buckets.end(),
              [](const Bucket& a, const Bucket& b) {
                return a.batch != b.batch ? a.batch < b.batch
                                          : a.phonemes < b.phonemes;
              });
    frontend.LoadVocab(dir + "/vocab.json");
  }

  Bucket* Pick(size_t n_ids) {
    // smallest (batch, P) with P >= n_ids; prefer batch 1 (one request at
    // a time on stdin), fall back to the smallest exported batch.
    Bucket* best = nullptr;
    for (Bucket& b : buckets) {
      if (static_cast<size_t>(b.phonemes) < n_ids) continue;
      if (best == nullptr || b.batch < best->batch ||
          (b.batch == best->batch && b.phonemes < best->phonemes))
        best = &b;
    }
    return best;
  }

  void EnsureCompiled(Bucket* b) {
    if (b->exe != nullptr || dry_run) return;
    b->exe = pjrt.Compile(ReadFile(b->mlir_path), copts, &b->compile_ms);
    // The format_version-2 calling convention is exactly 4 outputs
    // (audio, mel, n_frames, deficit; docs/AOT_ARTIFACT.md). Execute()
    // sizes the PJRT output array from this count, so a mismatched
    // executable must fail HERE, not scribble past the array.
    b->num_outputs = pjrt.NumOutputs(b->exe);
    if (b->num_outputs != 4)
      Fatal(b->mlir_path + ": executable has " +
            std::to_string(b->num_outputs) +
            " outputs, format_version 2 wants 4 — re-export the artifact");
    std::fprintf(stderr, "pjrt_runner: compiled b%ld_p%ld (%.0f ms)\n",
                 static_cast<long>(b->batch),
                 static_cast<long>(b->phonemes), b->compile_ms);
  }

  void PrecompileAll() {
    for (Bucket& b : buckets) EnsureCompiled(&b);
  }

  // One request: tokenized ids → execute → trim → wav. Returns the JSON
  // reply line.
  std::string Handle(const std::vector<int32_t>& ids, int32_t seed,
                     float temperature, const std::string& out_base) {
    double t_start = NowMs();
    Bucket* b = Pick(ids.size());
    if (b == nullptr)
      Fatal("no exported bucket fits " + std::to_string(ids.size()) +
            " ids (largest is " +
            std::to_string(buckets.back().phonemes) +
            ") — split the text or re-export with bigger buckets");
    if (dry_run) {
      std::ostringstream js;
      js << "{\"dry_run\": true, \"bucket\": [" << b->batch << ", "
         << b->phonemes << "], \"n_ids\": " << ids.size() << ", \"ids\": [";
      for (size_t i = 0; i < ids.size(); i++)
        js << (i ? ", " : "") << ids[i];
      js << "]}";
      return js.str();
    }
    EnsureCompiled(b);

    // Pack [B, P] ids + [B] lengths per the calling convention; pad rows
    // get lengths=1 and their outputs are dropped.
    HostArray ids_arr;
    ids_arr.dtype = DtypeByNpy("<i4");
    ids_arr.dims = {b->batch, b->phonemes};
    ids_arr.data.assign(ids_arr.NumElements() * 4, 0);
    int32_t* idp = reinterpret_cast<int32_t*>(ids_arr.data.data());
    for (size_t i = 0; i < static_cast<size_t>(b->phonemes); i++)
      idp[i] = i < ids.size() ? ids[i] : frontend.pad_id;
    HostArray len_arr;
    len_arr.dtype = DtypeByNpy("<i4");
    len_arr.dims = {b->batch};
    len_arr.data.assign(static_cast<size_t>(b->batch) * 4, 0);
    int32_t* lp = reinterpret_cast<int32_t*>(len_arr.data.data());
    lp[0] = static_cast<int32_t>(ids.size());
    for (int64_t r = 1; r < b->batch; r++) lp[r] = 1;
    HostArray seed_arr;
    ParseScalarArg("i32:" + std::to_string(seed), &seed_arr);
    HostArray temp_arr;
    ParseScalarArg("f32:" + std::to_string(temperature), &temp_arr);

    std::vector<PJRT_Buffer*> ins;
    std::vector<HostArray> out(b->num_outputs);
    double exec_ms = 0;
    try {
      for (const HostArray* a : {&ids_arr, &len_arr, &seed_arr, &temp_arr})
        ins.push_back(pjrt.Upload(*a));
      exec_ms = pjrt.Execute(b->exe, ins, &out);
      for (PJRT_Buffer* buf : ins) pjrt.DestroyBuffer(buf);
    } catch (...) {
      for (PJRT_Buffer* buf : ins) {
        try {
          pjrt.DestroyBuffer(buf);
        } catch (const FatalError&) {
        }
      }
      throw;
    }
    // outputs: audio [B, T*spf] f32, mel [B, T, n_mels] f32,
    // n_frames [B] i32, deficit [B] i32
    if (out[2].dtype == nullptr ||
        out[2].dtype->pjrt != PJRT_Buffer_Type_S32 ||
        out[2].data.size() < 4)
      Fatal("unexpected n_frames output dtype/size");
    if (out[3].dtype == nullptr ||
        out[3].dtype->pjrt != PJRT_Buffer_Type_S32 ||
        out[3].data.size() < 4)
      Fatal("unexpected deficit output dtype/size");
    if (out[0].dtype == nullptr ||
        out[0].dtype->pjrt != PJRT_Buffer_Type_F32)
      Fatal("unexpected audio output dtype");
    int32_t n_frames =
        reinterpret_cast<const int32_t*>(out[2].data.data())[0];
    int32_t deficit =
        reinterpret_cast<const int32_t*>(out[3].data.data())[0];
    int64_t n_samples =
        static_cast<int64_t>(n_frames) * samples_per_frame;
    int64_t row_samples = out[0].dims.size() == 2 ? out[0].dims[1] : 0;
    if (n_samples > row_samples) n_samples = row_samples;
    const float* audio = reinterpret_cast<const float*>(out[0].data.data());
    std::string wav_path = out_base + ".wav";
    if (iris_write_wav_pcm16(wav_path.c_str(), audio, n_samples,
                             static_cast<int>(sample_rate)) != 0)
      Fatal("wav write failed: " + wav_path);
    if (write_npy) {
      HostArray trimmed;
      trimmed.dtype = out[0].dtype;
      trimmed.dims = {n_samples};
      trimmed.data.assign(out[0].data.data(),
                          out[0].data.data() + n_samples * 4);
      WriteNpy(out_base + "_audio.npy", trimmed);
      WriteNpy(out_base + "_mel.npy", out[1]);
    }
    std::ostringstream js;
    js << "{\"bucket\": [" << b->batch << ", " << b->phonemes << "], "
       << "\"n_ids\": " << ids.size() << ", \"n_frames\": " << n_frames
       << ", \"deficit\": " << deficit << ", \"audio_s\": "
       << static_cast<double>(n_samples) / sample_rate
       << ", \"exec_fetch_ms\": " << exec_ms << ", \"total_ms\": "
       << NowMs() - t_start << ", \"wav\": \"" << JsonEscape(wav_path)
       << "\"}";
    return js.str();
  }

  // stdin loop: synth/ids requests, tab-separated (see file header).
  int Serve() {
    std::fprintf(stderr,
                 "pjrt_runner: artifact serving — "
                 "synth\\tout_base\\tseed\\ttemp\\ttext  |  "
                 "ids\\tout_base\\tseed\\ttemp\\tid,id,...\n");
    std::string line;
    while (std::getline(std::cin, line)) {
      if (line.empty()) continue;
      try {
        std::vector<std::string> f;
        size_t pos = 0;
        while (f.size() < 4) {
          size_t tab = line.find('\t', pos);
          if (tab == std::string::npos) break;
          f.push_back(line.substr(pos, tab - pos));
          pos = tab + 1;
        }
        f.push_back(line.substr(pos));
        if (f.size() != 5)
          Fatal("request wants 5 tab-separated fields: "
                "verb, out_base, seed, temperature, payload");
        const std::string &verb = f[0], &out_base = f[1];
        int32_t seed = static_cast<int32_t>(std::stol(f[2]));
        float temperature = std::stof(f[3]);
        std::vector<int32_t> ids;
        if (verb == "synth") ids = frontend.TextToIds(f[4]);
        else if (verb == "ids") ids = Frontend::ParseIdsCsv(f[4]);
        else Fatal("unknown verb '" + verb + "' (synth|ids)");
        std::string reply = Handle(ids, seed, temperature, out_base);
        std::printf("%s\n", reply.c_str());
      } catch (const FatalError& e) {
        std::printf("{\"error\": \"%s\"}\n", JsonEscape(e.msg).c_str());
      } catch (const std::exception& e) {
        std::printf("{\"error\": \"%s\"}\n", JsonEscape(e.what()).c_str());
      }
      std::fflush(stdout);
    }
    if (!dry_run) pjrt.DestroyClient();
    return 0;
  }
};

}  // namespace

int Run(int argc, char** argv) {
  std::string plugin, module_path, compile_options_path, out_prefix;
  std::string artifact_dir, lexicon_path;
  OptionStorage options;
  std::vector<HostArray> args_in;
  bool probe = false, serve = false, lazy = false, dry_run = false;
  bool write_npy = false;
  int iters = 1, device_index = 0;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) Fatal(a + " wants a value");
      return argv[++i];
    };
    if (a == "--npy-roundtrip") {
      std::string in = next(), out = next();
      HostArray arr = ReadNpy(in);
      WriteNpy(out, arr);
      std::printf("{\"roundtrip\": true, \"bytes\": %zu}\n",
                  arr.data.size());
      return 0;
    }
    if (a == "--plugin") plugin = next();
    else if (a == "--probe") probe = true;
    else if (a == "--option") ParseOption(next(), &options);
    else if (a == "--module") module_path = next();
    else if (a == "--compile-options") compile_options_path = next();
    else if (a == "--artifact") artifact_dir = next();
    else if (a == "--lexicon") lexicon_path = next();
    else if (a == "--lazy") lazy = true;
    else if (a == "--dry-run") dry_run = true;
    else if (a == "--npy") write_npy = true;
    else if (a == "--arg") {
      std::string v = next();
      HostArray arr;
      if (ParseScalarArg(v, &arr)) args_in.push_back(std::move(arr));
      else args_in.push_back(ReadNpy(v));
    } else if (a == "--iters") iters = std::stoi(next());
    else if (a == "--out-prefix") out_prefix = next();
    else if (a == "--device") device_index = std::stoi(next());
    else if (a == "--serve") serve = true;
    else Fatal("unknown flag " + a);
  }

  // ---- artifact serving host ----------------------------------------------
  if (!artifact_dir.empty()) {
    ArtifactHost host;
    host.dry_run = dry_run;
    host.write_npy = write_npy;
    double t0 = NowMs();
    host.Load(artifact_dir);
    if (!lexicon_path.empty()) host.frontend.LoadLexicon(lexicon_path);
    if (!dry_run) {
      if (plugin.empty()) Fatal("--plugin is required (or --dry-run)");
      const PJRT_Api* api = Pjrt::LoadPlugin(plugin);
      host.pjrt.Open(api, options, device_index);
      if (!lazy) host.PrecompileAll();
    }
    double cold_ms = NowMs() - t0;
    std::ostringstream ready;
    ready << "{\"ready\": true, \"buckets\": [";
    for (size_t i = 0; i < host.buckets.size(); i++)
      ready << (i ? ", " : "") << "[" << host.buckets[i].batch << ", "
            << host.buckets[i].phonemes << "]";
    ready << "], \"lexicon_words\": " << host.frontend.lexicon.size()
          << ", \"vocab\": " << host.frontend.vocab.size()
          << ", \"cold_start_ms\": " << cold_ms << ", \"client_ms\": "
          << host.pjrt.client_ms << "}";
    std::printf("%s\n", ready.str().c_str());
    std::fflush(stdout);
    return host.Serve();
  }

  if (plugin.empty()) Fatal("--plugin is required");
  const PJRT_Api* api = Pjrt::LoadPlugin(plugin);
  if (probe) {
    std::printf("{\"plugin\": \"%s\", \"api_version\": \"%d.%d\"}\n",
                plugin.c_str(), api->pjrt_api_version.major_version,
                api->pjrt_api_version.minor_version);
    return 0;
  }
  if (module_path.empty())
    Fatal("--module is required (or --probe / --artifact)");

  Pjrt pjrt;
  pjrt.Open(api, options, device_index);

  // Compile the StableHLO module (format "mlir": bytecode or text).
  std::string code = ReadFile(module_path);
  std::string copts =
      compile_options_path.empty() ? "" : ReadFile(compile_options_path);
  double compile_ms = 0;
  PJRT_LoadedExecutable* loaded = pjrt.Compile(code, copts, &compile_ms);
  std::fprintf(stderr, "pjrt_runner: compiled %s (%.0f ms)\n",
               module_path.c_str(), compile_ms);
  size_t num_outputs = pjrt.NumOutputs(loaded);

  if (serve) {
    // Request loop: "<arg> <arg> ... <out-prefix>" per stdin line.
    std::fprintf(stderr, "pjrt_runner: serving (compile paid; one request "
                         "per line: args... out-prefix)\n");
    std::string line;
    std::vector<HostArray> host_out(num_outputs);
    while (std::getline(std::cin, line)) {
      if (line.empty()) continue;
      std::stringstream ss(line);
      std::vector<std::string> toks;
      std::string t;
      while (ss >> t) toks.push_back(t);
      if (toks.size() < 2) {
        std::printf("{\"error\": \"request wants: args... out-prefix\"}\n");
        std::fflush(stdout);
        continue;
      }
      // A bad request (missing .npy, wrong shape/dtype, device error) must
      // not take down the server — the compile it paid for is the whole
      // point of --serve. Reply with an error line and keep serving.
      std::vector<PJRT_Buffer*> ins;
      try {
        for (size_t k = 0; k + 1 < toks.size(); k++) {
          HostArray arr;
          if (!ParseScalarArg(toks[k], &arr)) arr = ReadNpy(toks[k]);
          ins.push_back(pjrt.Upload(arr));
        }
        double ms = pjrt.Execute(loaded, ins, &host_out);
        for (PJRT_Buffer* buf : ins) pjrt.DestroyBuffer(buf);
        std::string shapes = ShapesJson(host_out, toks.back());
        std::printf("{\"exec_fetch_ms\": %.2f, \"output_shapes\": %s}\n",
                    ms, shapes.c_str());
      } catch (const FatalError& e) {
        for (PJRT_Buffer* buf : ins) {
          try {
            pjrt.DestroyBuffer(buf);
          } catch (const FatalError&) {
          }
        }
        std::printf("{\"error\": \"%s\"}\n", JsonEscape(e.msg).c_str());
      }
      std::fflush(stdout);
    }
    pjrt.DestroyClient();
    return 0;
  }

  // One-shot: upload the --arg inputs once, execute --iters times.
  std::vector<PJRT_Buffer*> in_bufs;
  for (const HostArray& arr : args_in) in_bufs.push_back(pjrt.Upload(arr));
  double exec_total_ms = 0;
  std::vector<HostArray> host_out(num_outputs);
  for (int it = 0; it < iters; it++)
    exec_total_ms += pjrt.Execute(loaded, in_bufs, &host_out);
  std::string shapes = ShapesJson(host_out, out_prefix);
  for (PJRT_Buffer* buf : in_bufs) pjrt.DestroyBuffer(buf);
  PJRT_LoadedExecutable_Destroy_Args ld;
  std::memset(&ld, 0, sizeof(ld));
  ld.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ld.executable = loaded;
  CALL(pjrt.api, PJRT_LoadedExecutable_Destroy, ld);
  pjrt.DestroyClient();

  std::printf(
      "{\"client_ms\": %.1f, \"compile_ms\": %.1f, \"iters\": %d, "
      "\"mean_exec_fetch_ms\": %.2f, \"num_outputs\": %zu, "
      "\"output_shapes\": %s}\n",
      pjrt.client_ms, compile_ms, iters, exec_total_ms / iters, num_outputs,
      shapes.c_str());
  return 0;
}

int main(int argc, char** argv) {
  try {
    return Run(argc, argv);
  } catch (const FatalError& e) {
    std::fprintf(stderr, "pjrt_runner: %s\n", e.msg.c_str());
    return 1;
  } catch (const std::exception& e) {
    // Backstop: NO hostile input may reach std::terminate (SIGABRT). A
    // malformed file must always be a clean diagnostic + exit 1.
    std::fprintf(stderr, "pjrt_runner: error: %s\n", e.what());
    return 1;
  }
}
