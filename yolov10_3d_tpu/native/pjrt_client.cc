// C++ PJRT inference client for exported StableHLO models.
//
// The TPU-native analogue of the reference's C++ ONNX/TensorRT example
// clients (examples/YOLOv8-ONNXRuntime-CPP etc.): loads any PJRT plugin
// (libtpu.so / libaxon_pjrt.so / a CPU plugin) through the stable PJRT C
// ABI, compiles the MLIR emitted by engine/exporter.py (model.stablehlo.mlir)
// and runs batched float32 NHWC inference.
//
// Build:  g++ -O2 -std=c++17 -I<pjrt_c_api include dir> pjrt_client.cc -ldl
// Usage:  pjrt_client PLUGIN.so --probe
//         pjrt_client PLUGIN.so MODEL.mlir B H W [--opt k=v ...] \
//             < raw_f32_input  > raw_f32_out
//
// --probe only negotiates the API version (safe without hardware).
// --opt passes string create-options to PJRT_Client_Create (plugin-specific,
// e.g. a session/tunnel address).

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_client: %s\n", msg.c_str());
  std::exit(1);
}

std::string ErrorString(const PJRT_Api* api, PJRT_Error* err) {
  PJRT_Error_Message_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  args.error = err;
  api->PJRT_Error_Message(&args);
  std::string msg(args.message, args.message_size);
  PJRT_Error_Destroy_Args d;
  std::memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  api->PJRT_Error_Destroy(&d);
  return msg;
}

void Check(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err != nullptr) Die(std::string(what) + ": " + ErrorString(api, err));
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s PLUGIN.so --probe | PLUGIN.so MODEL.mlir B H W\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];

  void* lib = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (lib == nullptr) Die(std::string("dlopen failed: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(lib, "GetPjrtApi"));
  if (get_api == nullptr)
    Die(std::string("GetPjrtApi not found in ") + plugin_path);
  const PJRT_Api* api = get_api();
  if (api == nullptr) Die("GetPjrtApi returned null");
  std::printf("PJRT API version %d.%d (struct size %zu)\n",
              api->pjrt_api_version.major_version,
              api->pjrt_api_version.minor_version, api->struct_size);

  if (std::string(argv[2]) == "--probe") {
    // version negotiation only; initializing the plugin may require
    // hardware or a session, which --probe deliberately avoids
    return 0;
  }
  if (argc < 6) Die("need MODEL.mlir B H W");

  {
    PJRT_Plugin_Initialize_Args init;
    std::memset(&init, 0, sizeof(init));
    init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    Check(api, api->PJRT_Plugin_Initialize(&init), "plugin init");
  }

  // parse --opt k=v create options (string-valued)
  std::vector<PJRT_NamedValue> create_opts;
  std::vector<std::string> opt_storage;
  for (int i = 6; i + 1 < argc; ++i) {
    if (std::string(argv[i]) == "--opt") {
      std::string kv = argv[++i];
      auto eq = kv.find('=');
      if (eq == std::string::npos) Die("--opt expects key=value");
      opt_storage.push_back(kv.substr(0, eq));
      opt_storage.push_back(kv.substr(eq + 1));
    }
  }
  for (size_t i = 0; i < opt_storage.size(); i += 2) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = opt_storage[i].c_str();
    nv.name_size = opt_storage[i].size();
    nv.type = PJRT_NamedValue_kString;
    nv.string_value = opt_storage[i + 1].c_str();
    nv.value_size = opt_storage[i + 1].size();
    create_opts.push_back(nv);
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = create_opts.empty() ? nullptr : create_opts.data();
    args.num_options = create_opts.size();
    Check(api, api->PJRT_Client_Create(&args), "client create");
    client = args.client;
  }

  // first addressable device
  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = client;
    Check(api, api->PJRT_Client_AddressableDevices(&args), "devices");
    if (args.num_addressable_devices == 0) Die("no addressable devices");
    device = args.addressable_devices[0];
  }

  const std::string mlir = ReadFile(argv[2]);
  const int64_t B = std::atoll(argv[3]);
  const int64_t H = std::atoll(argv[4]);
  const int64_t W = std::atoll(argv[5]);

  // compile the StableHLO module ("mlir" program format)
  PJRT_LoadedExecutable* exe = nullptr;
  {
    PJRT_Program program;
    std::memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = const_cast<char*>(mlir.data());
    program.code_size = mlir.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;

    PJRT_Client_Compile_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.client = client;
    args.program = &program;
    static const char kOpts[] = "";  // default CompileOptionsProto
    args.compile_options = kOpts;
    args.compile_options_size = 0;
    Check(api, api->PJRT_Client_Compile(&args), "compile");
    exe = args.executable;
  }

  // read raw f32 NHWC input from stdin
  const int64_t dims[4] = {B, H, W, 3};
  const size_t n_in = static_cast<size_t>(B * H * W * 3);
  std::vector<float> input(n_in);
  if (std::fread(input.data(), sizeof(float), n_in, stdin) != n_in)
    Die("short read on stdin (expected B*H*W*3 f32)");

  PJRT_Buffer* in_buf = nullptr;
  {
    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = input.data();
    args.type = PJRT_Buffer_Type_F32;
    args.dims = dims;
    args.num_dims = 4;
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    Check(api, api->PJRT_Client_BufferFromHostBuffer(&args), "h2d");
    PJRT_Event_Await_Args ev;
    std::memset(&ev, 0, sizeof(ev));
    ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ev.event = args.done_with_host_buffer;
    Check(api, api->PJRT_Event_Await(&ev), "h2d await");
    PJRT_Event_Destroy_Args evd;
    std::memset(&evd, 0, sizeof(evd));
    evd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    evd.event = args.done_with_host_buffer;
    api->PJRT_Event_Destroy(&evd);
    in_buf = args.buffer;
  }

  // execute
  std::vector<PJRT_Buffer*> outs(16, nullptr);
  size_t num_outputs = 0;
  {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

    PJRT_Buffer* arg_list[1] = {in_buf};
    PJRT_Buffer* const* arg_lists[1] = {arg_list};
    PJRT_Buffer** out_list = outs.data();
    PJRT_Buffer*** out_lists = &out_list;

    PJRT_LoadedExecutable_Execute_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exe;
    args.options = &opts;
    args.num_devices = 1;
    args.num_args = 1;
    args.argument_lists = arg_lists;
    args.output_lists = out_lists;
    Check(api, api->PJRT_LoadedExecutable_Execute(&args), "execute");

    for (num_outputs = 0; num_outputs < outs.size() && outs[num_outputs];
         ++num_outputs) {
    }
  }
  std::fprintf(stderr, "executed: %zu outputs\n", num_outputs);

  // copy each output to host, write raw to stdout
  for (size_t i = 0; i < num_outputs; ++i) {
    PJRT_Buffer_ToHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    args.src = outs[i];
    Check(api, api->PJRT_Buffer_ToHostBuffer(&args), "d2h size query");
    std::vector<char> host(args.dst_size);
    args.dst = host.data();
    Check(api, api->PJRT_Buffer_ToHostBuffer(&args), "d2h");
    PJRT_Event_Await_Args ev;
    std::memset(&ev, 0, sizeof(ev));
    ev.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ev.event = args.event;
    Check(api, api->PJRT_Event_Await(&ev), "d2h await");
    std::fwrite(host.data(), 1, host.size(), stdout);
    std::fprintf(stderr, "output %zu: %zu bytes\n", i, host.size());
  }
  return 0;
}
