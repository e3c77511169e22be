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
// `--arg` order must match the executable's flattened argument order; a
// bare path loads a .npy array, `TYPE:value` makes a rank-0 scalar. Exactly
// one JSON line goes to stdout (timings + output shapes); diagnostics go to
// stderr. Exit 0 on success.

#include <dlfcn.h>

#include <cstdint>
#include <deque>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

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

// --option name=TYPE:value → PJRT_NamedValue (storage kept alive by caller).
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

}  // namespace

int Run(int argc, char** argv) {
  std::string plugin, module_path, compile_options_path, out_prefix;
  OptionStorage options;
  std::vector<HostArray> args_in;
  bool probe = false, serve = false;
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
  if (plugin.empty()) Fatal("--plugin is required");

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
  if (probe) {
    std::printf("{\"plugin\": \"%s\", \"api_version\": \"%d.%d\"}\n",
                plugin.c_str(), api->pjrt_api_version.major_version,
                api->pjrt_api_version.minor_version);
    return 0;
  }
  if (module_path.empty()) Fatal("--module is required (or --probe)");

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
  PJRT_Client* client = cc.client;
  double client_ms = NowMs() - t0;

  PJRT_Client_AddressableDevices_Args dev;
  std::memset(&dev, 0, sizeof(dev));
  dev.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev.client = client;
  CALL(api, PJRT_Client_AddressableDevices, dev);
  if (dev.num_addressable_devices == 0) Fatal("no addressable devices");
  if (device_index >= static_cast<int>(dev.num_addressable_devices))
    Fatal("--device out of range");
  PJRT_Device* device = dev.addressable_devices[device_index];
  std::fprintf(stderr, "pjrt_runner: client up (%.0f ms), %zu device(s)\n",
               client_ms, dev.num_addressable_devices);

  // Compile the StableHLO module (format "mlir": bytecode or text).
  std::string code = ReadFile(module_path);
  std::string copts =
      compile_options_path.empty() ? "" : ReadFile(compile_options_path);
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = code.data();
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
  t0 = NowMs();
  CALL(api, PJRT_Client_Compile, comp);
  PJRT_LoadedExecutable* loaded = comp.executable;
  double compile_ms = NowMs() - t0;
  std::fprintf(stderr, "pjrt_runner: compiled %s (%.0f ms)\n",
               module_path.c_str(), compile_ms);

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
  size_t num_outputs = no.num_outputs;

  auto upload = [&](const HostArray& arr) -> PJRT_Buffer* {
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
  };

  PJRT_ExecuteOptions eopts;
  std::memset(&eopts, 0, sizeof(eopts));
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);

  auto destroy_buffer = [&](PJRT_Buffer* buf) {
    PJRT_Buffer_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.buffer = buf;
    CALL(api, PJRT_Buffer_Destroy, d);
  };
  auto fetch = [&](PJRT_Buffer* buf, HostArray* out, bool want_data) {
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
    if (!want_data) return;
    th.dst = out->data.data();
    CALL(api, PJRT_Buffer_ToHostBuffer, th);
    AwaitEvent(api, th.event);
  };

  // Timing includes one host fetch of every output — device-completion
  // events alone do not reliably block on proxied backends, and serving
  // pays the fetch anyway.
  auto run_once = [&](const std::vector<PJRT_Buffer*>& ins,
                      std::vector<HostArray>* host_out,
                      bool keep_buffers) -> double {
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
      fetch(outputs[o], &(*host_out)[o], /*want_data=*/true);
      if (!keep_buffers) destroy_buffer(outputs[o]);
    }
    return NowMs() - s;
  };

  auto shapes_json = [&](const std::vector<HostArray>& host_out,
                         const std::string& prefix) -> std::string {
    std::ostringstream shapes;
    shapes << "[";
    for (size_t o = 0; o < num_outputs; o++) {
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
  };

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
          ins.push_back(upload(arr));
        }
        double ms = run_once(ins, &host_out, /*keep_buffers=*/false);
        for (PJRT_Buffer* buf : ins) destroy_buffer(buf);
        std::string shapes = shapes_json(host_out, toks.back());
        std::printf("{\"exec_fetch_ms\": %.2f, \"output_shapes\": %s}\n",
                    ms, shapes.c_str());
      } catch (const FatalError& e) {
        for (PJRT_Buffer* buf : ins) {
          try {
            destroy_buffer(buf);
          } catch (const FatalError&) {
          }
        }
        std::string msg = e.msg;
        for (char& c : msg)  // keep the reply a valid one-line JSON string
          if (c == '"' || c == '\\' || c == '\n' || c == '\r') c = ' ';
        std::printf("{\"error\": \"%s\"}\n", msg.c_str());
      }
      std::fflush(stdout);
    }
    PJRT_Client_Destroy_Args cd;
    std::memset(&cd, 0, sizeof(cd));
    cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    cd.client = client;
    CALL(api, PJRT_Client_Destroy, cd);
    return 0;
  }

  // One-shot: upload the --arg inputs once, execute --iters times.
  std::vector<PJRT_Buffer*> in_bufs;
  for (const HostArray& arr : args_in) in_bufs.push_back(upload(arr));
  double exec_total_ms = 0;
  std::vector<HostArray> host_out(num_outputs);
  for (int it = 0; it < iters; it++)
    exec_total_ms +=
        run_once(in_bufs, &host_out, /*keep_buffers=*/it + 1 == iters);
  std::string shapes = shapes_json(host_out, out_prefix);
  for (size_t o = 0; o < num_outputs; o++) destroy_buffer(outputs[o]);
  for (PJRT_Buffer* buf : in_bufs) destroy_buffer(buf);
  PJRT_Executable_Destroy_Args ed;
  std::memset(&ed, 0, sizeof(ed));
  ed.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
  ed.executable = ge.executable;
  CALL(api, PJRT_Executable_Destroy, ed);
  PJRT_LoadedExecutable_Destroy_Args ld;
  std::memset(&ld, 0, sizeof(ld));
  ld.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ld.executable = loaded;
  CALL(api, PJRT_LoadedExecutable_Destroy, ld);
  PJRT_Client_Destroy_Args cd;
  std::memset(&cd, 0, sizeof(cd));
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  CALL(api, PJRT_Client_Destroy, cd);

  std::printf(
      "{\"client_ms\": %.1f, \"compile_ms\": %.1f, \"iters\": %d, "
      "\"mean_exec_fetch_ms\": %.2f, \"num_outputs\": %zu, "
      "\"output_shapes\": %s}\n",
      client_ms, compile_ms, iters, exec_total_ms / iters, num_outputs,
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
