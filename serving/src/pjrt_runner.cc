#include "pjrt_runner.h"

#include <dlfcn.h>

#include <algorithm>
#include <chrono>
#include <cstring>
#include <numeric>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace esmstereo {

namespace {

// Conservative struct sizes for cross-version plugin compatibility: a PJRT
// plugin accepts callers whose struct_size <= its own (unknown trailing
// fields read as absent), so we pass sizes that end at fields present
// since early API versions (the axon plugin here reports 0.54; libtpu 0.89).
#define PJRT_COMPAT_SIZE(sname, last_field) \
  (offsetof(sname, last_field) + sizeof(((sname*)nullptr)->last_field))

// Serialized xla.CompileOptionsProto, vendored verbatim from what jax
// sends (num_replicas=1, num_partitions=1, full default debug options).
// A minimal hand-encoded proto ({0x1a,0x04,0x20,0x01,0x28,0x01}) used to
// suffice, but the remote-compile service behind the axon tunnel now
// rejects fresh (non-cached) compiles without the full options (empty
// PJRT error message; round-5 finding). Regenerate with:
//   python -c "from jax._src import compiler; import sys; \
//     sys.stdout.buffer.write(compiler.get_compile_options(1, 1)\
//     .SerializeAsString())" > options.bin
// or pass --compile_options <file> to override at runtime.
constexpr unsigned char kCompileOptionsProto[] = {
    0x1a, 0xd5, 0x06, 0x08, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
    0xff, 0x01, 0x1a, 0xb1, 0x06, 0xf8, 0x01, 0x03, 0x98, 0x02, 0x01, 0xe0,
    0x03, 0x01, 0xea, 0x03, 0x04, 0x4e, 0x6f, 0x6e, 0x65, 0xb0, 0x04, 0x01,
    0xb8, 0x04, 0x01, 0xc0, 0x04, 0x01, 0xc8, 0x04, 0x00, 0x88, 0x06, 0x00,
    0x98, 0x06, 0x00, 0xa0, 0x06, 0x00, 0xb0, 0x06, 0x01, 0xc8, 0x06, 0x00,
    0xa0, 0x07, 0x00, 0xc0, 0x07, 0x01, 0xc8, 0x07, 0x01, 0xd0, 0x07, 0x01,
    0xd8, 0x07, 0x04, 0xf0, 0x07, 0x01, 0x88, 0x08, 0x01, 0x98, 0x08, 0x00,
    0xa0, 0x08, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01,
    0xc8, 0x08, 0x00, 0xd0, 0x08, 0x00, 0xe0, 0x08, 0x00, 0xf0, 0x08, 0xff,
    0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01, 0x80, 0x09, 0x00,
    0xa8, 0x09, 0x00, 0xe8, 0x09, 0x87, 0x80, 0x80, 0x0f, 0x98, 0x0a, 0xff,
    0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01, 0xa0, 0x0a, 0x01,
    0xa8, 0x0a, 0x01, 0xb0, 0x0a, 0x00, 0xd0, 0x0a, 0x01, 0xa8, 0x0b, 0x00,
    0xb0, 0x0b, 0x00, 0xc8, 0x0b, 0x01, 0xd0, 0x0b, 0x00, 0xd8, 0x0b, 0x00,
    0xe0, 0x0b, 0x01, 0xe8, 0x0b, 0x01, 0xf0, 0x0b, 0x01, 0xd8, 0x0c, 0x00,
    0xe8, 0x0c, 0x01, 0x80, 0x0d, 0x05, 0x88, 0x0d, 0x01, 0x92, 0x0d, 0x00,
    0xa0, 0x0d, 0x87, 0x80, 0x80, 0x0f, 0xa8, 0x0d, 0x87, 0x80, 0x80, 0x0f,
    0xc0, 0x0d, 0x01, 0xc8, 0x0d, 0x00, 0xd8, 0x0d, 0x00, 0x80, 0x0e, 0x00,
    0x8d, 0x0e, 0xcd, 0xcc, 0x8c, 0x3f, 0x98, 0x0e, 0x00, 0xa0, 0x0e, 0x80,
    0x80, 0x80, 0x04, 0xb8, 0x0e, 0x01, 0xd8, 0x0e, 0x00, 0xe0, 0x0e, 0x00,
    0xe8, 0x0e, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x7f, 0x80,
    0x0f, 0x00, 0x88, 0x0f, 0x01, 0x98, 0x0f, 0x01, 0xb0, 0x0f, 0x00, 0xb8,
    0x0f, 0x01, 0xc0, 0x0f, 0x00, 0xd0, 0x0f, 0x01, 0xd8, 0x0f, 0x0f, 0xe0,
    0x0f, 0x01, 0xe8, 0x0f, 0x01, 0xf0, 0x0f, 0x00, 0xf8, 0x0f, 0x00, 0x80,
    0x10, 0x00, 0x88, 0x10, 0x00, 0x92, 0x10, 0x06, 0x01, 0x02, 0x08, 0x07,
    0x03, 0x09, 0x98, 0x10, 0x01, 0xa0, 0x10, 0x5f, 0xaa, 0x10, 0x00, 0xb0,
    0x10, 0x00, 0xc8, 0x10, 0xa0, 0x8d, 0x06, 0xd8, 0x10, 0x00, 0xe0, 0x10,
    0x00, 0xe8, 0x10, 0x00, 0x80, 0x11, 0x01, 0x88, 0x11, 0x00, 0x90, 0x11,
    0x00, 0xa8, 0x11, 0x00, 0xc0, 0x11, 0x01, 0xd8, 0x11, 0x64, 0xe0, 0x11,
    0x00, 0xe8, 0x11, 0x00, 0xf8, 0x11, 0x00, 0x80, 0x12, 0x00, 0x90, 0x12,
    0x00, 0x98, 0x12, 0x00, 0xa8, 0x12, 0x10, 0xb0, 0x12, 0x03, 0xc0, 0x12,
    0x00, 0xe0, 0x12, 0x01, 0xe8, 0x12, 0x00, 0x80, 0x13, 0x01, 0x88, 0x13,
    0x00, 0x98, 0x13, 0x01, 0xa0, 0x13, 0x80, 0x02, 0xb2, 0x13, 0x00, 0xb8,
    0x13, 0x10, 0xc0, 0x13, 0x00, 0xd8, 0x13, 0x00, 0xe5, 0x13, 0xcd, 0xcc,
    0xcc, 0x3d, 0xe8, 0x13, 0x00, 0xf0, 0x13, 0x05, 0x98, 0x14, 0x20, 0xa0,
    0x14, 0x01, 0xb8, 0x14, 0x0a, 0xc0, 0x14, 0x1e, 0xc8, 0x14, 0x00, 0xd0,
    0x14, 0x00, 0xd8, 0x14, 0x20, 0xea, 0x14, 0x00, 0xf0, 0x14, 0x00, 0xf8,
    0x14, 0x00, 0x80, 0x15, 0x01, 0x88, 0x15, 0x00, 0x98, 0x15, 0xff, 0xff,
    0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01, 0xa0, 0x15, 0x00, 0xa8,
    0x15, 0x01, 0xb0, 0x15, 0x01, 0xb8, 0x15, 0x00, 0xc0, 0x15, 0x00, 0xc8,
    0x15, 0x00, 0xd8, 0x15, 0x00, 0xe0, 0x15, 0x00, 0xe8, 0x15, 0x00, 0xf0,
    0x15, 0x00, 0xf8, 0x15, 0x00, 0x88, 0x16, 0x00, 0x90, 0x16, 0x00, 0xa0,
    0x16, 0x01, 0xaa, 0x16, 0x13, 0x0a, 0x0d, 0x63, 0x68, 0x75, 0x6e, 0x6b,
    0x5f, 0x70, 0x72, 0x65, 0x70, 0x5f, 0x75, 0x73, 0x12, 0x02, 0x2d, 0x31,
    0xaa, 0x16, 0x16, 0x0a, 0x10, 0x63, 0x68, 0x75, 0x6e, 0x6b, 0x5f, 0x73,
    0x69, 0x7a, 0x65, 0x5f, 0x62, 0x79, 0x74, 0x65, 0x73, 0x12, 0x02, 0x2d,
    0x31, 0xaa, 0x16, 0x13, 0x0a, 0x0d, 0x67, 0x70, 0x75, 0x73, 0x5f, 0x70,
    0x65, 0x72, 0x5f, 0x6e, 0x6f, 0x64, 0x65, 0x12, 0x02, 0x2d, 0x31, 0xaa,
    0x16, 0x17, 0x0a, 0x11, 0x6e, 0x63, 0x63, 0x6c, 0x5f, 0x6f, 0x70, 0x5f,
    0x6c, 0x61, 0x75, 0x6e, 0x63, 0x68, 0x5f, 0x75, 0x73, 0x12, 0x02, 0x2d,
    0x31, 0xaa, 0x16, 0x14, 0x0a, 0x0e, 0x6e, 0x69, 0x63, 0x5f, 0x73, 0x70,
    0x65, 0x65, 0x64, 0x5f, 0x67, 0x62, 0x70, 0x73, 0x12, 0x02, 0x2d, 0x31,
    0xaa, 0x16, 0x0c, 0x0a, 0x06, 0x72, 0x74, 0x74, 0x5f, 0x75, 0x73, 0x12,
    0x02, 0x2d, 0x31, 0xb8, 0x16, 0x01, 0xd0, 0x16, 0x01, 0xd8, 0x16, 0x00,
    0xe8, 0x16, 0x00, 0xf0, 0x16, 0x00, 0x80, 0x17, 0x00, 0x90, 0x17, 0x00,
    0xa0, 0x17, 0x00, 0xb0, 0x17, 0x00, 0xb8, 0x17, 0x01, 0xc0, 0x17, 0x01,
    0xca, 0x17, 0x00, 0xd0, 0x17, 0x87, 0x80, 0x80, 0x0f, 0xd8, 0x17, 0x00,
    0xe0, 0x17, 0x00, 0xe8, 0x17, 0x01, 0xf0, 0x17, 0x01, 0xfa, 0x17, 0x00,
    0x80, 0x18, 0x00, 0x90, 0x18, 0x00, 0x98, 0x18, 0x00, 0xa0, 0x18, 0x00,
    0xa8, 0x18, 0x01, 0xb0, 0x18, 0x01, 0xb8, 0x18, 0x14, 0xc0, 0x18, 0x28,
    0xc8, 0x18, 0x00, 0xd8, 0x18, 0x00, 0xe0, 0x18, 0x00, 0x98, 0x19, 0x00,
    0xa0, 0x19, 0x02, 0xb0, 0x19, 0x00, 0xba, 0x19, 0x00, 0xc0, 0x19, 0x00,
    0xc8, 0x19, 0x01, 0xd0, 0x19, 0x00, 0xd8, 0x19, 0x00, 0xe0, 0x19, 0x00,
    0xe8, 0x19, 0x00, 0xf0, 0x19, 0x00, 0x88, 0x1a, 0x28, 0x90, 0x1a, 0x14,
    0x98, 0x1a, 0x00, 0xa0, 0x1a, 0x01, 0xa8, 0x1a, 0x00, 0xb2, 0x1a, 0x01,
    0x04, 0xc8, 0x1a, 0x01, 0xd0, 0x1a, 0x00, 0xe0, 0x1a, 0x00, 0xe8, 0x1a,
    0x00, 0xf0, 0x1a, 0x01, 0xf8, 0x1a, 0x00, 0x80, 0x1b, 0x00, 0xa0, 0x1b,
    0x01, 0xa8, 0x1b, 0x01, 0xb0, 0x1b, 0x88, 0x0e, 0xb8, 0x1b, 0x00, 0xc0,
    0x1b, 0x00, 0xc8, 0x1b, 0x00, 0xd2, 0x1b, 0x07, 0x02, 0x03, 0x04, 0x01,
    0x05, 0x06, 0x07, 0xd8, 0x1b, 0x00, 0x20, 0x01, 0x28, 0x01, 0x30, 0x01,
    0x62, 0x01, 0x00, 0x92, 0x01, 0x01, 0x00, 0x98, 0x01, 0x01, 0xb8, 0x01,
    0x01, 0xc8, 0x01, 0x1d, 0x28, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
    0xff, 0xff, 0x01,
};

}  // namespace

PjrtRunner::PjrtRunner(const std::string& plugin_path,
                       std::vector<Option> options)
    : plugin_path_(plugin_path), options_(std::move(options)) {}

PjrtRunner::~PjrtRunner() {
  if (api_ != nullptr) {
    for (auto* exe : executables_) {
      PJRT_LoadedExecutable_Destroy_Args args{
          PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE, nullptr, exe};
      api_->PJRT_LoadedExecutable_Destroy(&args);
    }
    if (client_ != nullptr) {
      PJRT_Client_Destroy_Args args{PJRT_Client_Destroy_Args_STRUCT_SIZE,
                                    nullptr, client_};
      api_->PJRT_Client_Destroy(&args);
    }
  }
  if (dl_handle_ != nullptr) dlclose(dl_handle_);
}

std::string PjrtRunner::ErrorToString(void* error) {
  if (error == nullptr) return "";
  auto* err = static_cast<PJRT_Error*>(error);
  PJRT_Error_Message_Args margs{PJRT_Error_Message_Args_STRUCT_SIZE, nullptr,
                                err, nullptr, 0};
  api_->PJRT_Error_Message(&margs);
  std::string message(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs{PJRT_Error_Destroy_Args_STRUCT_SIZE, nullptr,
                                err};
  api_->PJRT_Error_Destroy(&dargs);
  return message.empty() ? "unknown PJRT error" : message;
}

std::string PjrtRunner::Initialize() {
  dl_handle_ = dlopen(plugin_path_.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (dl_handle_ == nullptr) {
    return std::string("dlopen failed: ") + dlerror();
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(
      dlsym(dl_handle_, "GetPjrtApi"));
  if (get_api == nullptr) {
    return "plugin does not export GetPjrtApi";
  }
  api_ = get_api();
  if (api_ == nullptr) return "GetPjrtApi returned null";

  if (api_->PJRT_Plugin_Initialize != nullptr) {
    PJRT_Plugin_Initialize_Args args{PJRT_Plugin_Initialize_Args_STRUCT_SIZE,
                                     nullptr};
    if (auto e = ErrorToString(api_->PJRT_Plugin_Initialize(&args));
        !e.empty()) {
      return "PJRT_Plugin_Initialize: " + e;
    }
  }

  std::vector<PJRT_NamedValue> named(options_.size());
  for (size_t i = 0; i < options_.size(); ++i) {
    std::memset(&named[i], 0, sizeof(named[i]));
    named[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    named[i].name = options_[i].name.c_str();
    named[i].name_size = options_[i].name.size();
    if (options_[i].is_int) {
      named[i].type = PJRT_NamedValue_kInt64;
      named[i].int64_value = options_[i].int_value;
      named[i].value_size = 1;
    } else {
      named[i].type = PJRT_NamedValue_kString;
      named[i].string_value = options_[i].str_value.c_str();
      named[i].value_size = options_[i].str_value.size();
    }
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_COMPAT_SIZE(PJRT_Client_Create_Args, client);
  cargs.create_options = named.data();
  cargs.num_options = named.size();
  if (auto e = ErrorToString(api_->PJRT_Client_Create(&cargs)); !e.empty()) {
    return "PJRT_Client_Create: " + e;
  }
  client_ = cargs.client;

  PJRT_Client_PlatformName_Args pargs;
  std::memset(&pargs, 0, sizeof(pargs));
  pargs.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pargs.client = client_;
  if (auto e = ErrorToString(api_->PJRT_Client_PlatformName(&pargs));
      e.empty()) {
    platform_name_.assign(pargs.platform_name, pargs.platform_name_size);
  }

  PJRT_Client_AddressableDevices_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client_;
  if (auto e = ErrorToString(api_->PJRT_Client_AddressableDevices(&dargs));
      !e.empty()) {
    return "PJRT_Client_AddressableDevices: " + e;
  }
  if (dargs.num_addressable_devices == 0) return "no addressable devices";
  device_ = dargs.addressable_devices[0];
  return "";
}

std::string PjrtRunner::Compile(const std::string& mlir_module) {
  int index = -1;
  return CompileModule(mlir_module, &index);
}

std::string PjrtRunner::CompileModule(const std::string& mlir_module,
                                      int* index) {
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir_module.data());
  program.code_size = mlir_module.size();
  program.format = "mlir";
  program.format_size = 4;

  PJRT_Client_Compile_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.client = client_;
  args.program = &program;
  if (!compile_options_override_.empty()) {
    args.compile_options = compile_options_override_.data();
    args.compile_options_size = compile_options_override_.size();
  } else {
    args.compile_options =
        reinterpret_cast<const char*>(kCompileOptionsProto);
    args.compile_options_size = sizeof(kCompileOptionsProto);
  }
  if (auto e = ErrorToString(api_->PJRT_Client_Compile(&args)); !e.empty()) {
    return "PJRT_Client_Compile: " + e;
  }
  executables_.push_back(args.executable);
  if (index != nullptr) *index = static_cast<int>(executables_.size()) - 1;
  return "";
}

std::string PjrtRunner::Execute(const std::vector<Tensor>& inputs,
                                std::vector<Tensor>* outputs) {
  return ExecuteModule(0, inputs, outputs);
}

std::string PjrtRunner::ExecuteModule(int index,
                                      const std::vector<Tensor>& inputs,
                                      std::vector<Tensor>* outputs) {
  std::vector<PJRT_Buffer*> in_buffers, out_buffers;
  auto e = UploadInputs(inputs, &in_buffers);
  if (e.empty()) e = ExecuteBuffers(index, in_buffers, &out_buffers, true);
  if (e.empty()) e = ReadBuffers(out_buffers, outputs);
  DestroyBuffers(&in_buffers);
  DestroyBuffers(&out_buffers);
  return e;
}

std::string PjrtRunner::UploadInputs(const std::vector<Tensor>& inputs,
                                     std::vector<PJRT_Buffer*>* buffers) {
  std::vector<PJRT_Buffer*>& in_buffers = *buffers;
  in_buffers.assign(inputs.size(), nullptr);
  for (size_t i = 0; i < inputs.size(); ++i) {
    PJRT_Client_BufferFromHostBuffer_Args bargs;
    std::memset(&bargs, 0, sizeof(bargs));
    bargs.struct_size = PJRT_COMPAT_SIZE(PJRT_Client_BufferFromHostBuffer_Args, buffer);
    bargs.client = client_;
    bargs.data = inputs[i].data.data();
    bargs.type = PJRT_Buffer_Type_F32;
    bargs.dims = inputs[i].dims.data();
    bargs.num_dims = inputs[i].dims.size();
    bargs.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bargs.device = device_;
    if (auto e = ErrorToString(api_->PJRT_Client_BufferFromHostBuffer(&bargs));
        !e.empty()) {
      return "BufferFromHostBuffer: " + e;
    }
    in_buffers[i] = bargs.buffer;
    PJRT_Event_Await_Args eargs{PJRT_Event_Await_Args_STRUCT_SIZE, nullptr,
                                bargs.done_with_host_buffer};
    ErrorToString(api_->PJRT_Event_Await(&eargs));
    PJRT_Event_Destroy_Args edargs{PJRT_Event_Destroy_Args_STRUCT_SIZE,
                                   nullptr, bargs.done_with_host_buffer};
    api_->PJRT_Event_Destroy(&edargs);
  }
  return "";
}

std::string PjrtRunner::ExecuteBuffers(
    int index, const std::vector<PJRT_Buffer*>& inputs,
    std::vector<PJRT_Buffer*>* outputs, bool await) {
  if (index < 0 || index >= static_cast<int>(executables_.size())) {
    return "Execute before Compile (module index out of range)";
  }
  PJRT_LoadedExecutable* executable_ = executables_[index];

  // number of outputs
  PJRT_Executable_NumOutputs_Args nargs;
  std::memset(&nargs, 0, sizeof(nargs));
  nargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  PJRT_LoadedExecutable_GetExecutable_Args gargs;
  std::memset(&gargs, 0, sizeof(gargs));
  gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  gargs.loaded_executable = executable_;
  if (auto e = ErrorToString(
          api_->PJRT_LoadedExecutable_GetExecutable(&gargs));
      !e.empty()) {
    return "GetExecutable: " + e;
  }
  nargs.executable = gargs.executable;
  if (auto e = ErrorToString(api_->PJRT_Executable_NumOutputs(&nargs));
      !e.empty()) {
    return "NumOutputs: " + e;
  }
  const size_t num_outputs = nargs.num_outputs;

  std::vector<PJRT_Buffer*>& out_buffers = *outputs;
  out_buffers.assign(num_outputs, nullptr);
  PJRT_Buffer* const* arg_list = inputs.data();
  PJRT_Buffer** out_list = out_buffers.data();
  PJRT_Event* complete_event = nullptr;

  PJRT_ExecuteOptions options;
  std::memset(&options, 0, sizeof(options));
  options.struct_size = PJRT_COMPAT_SIZE(PJRT_ExecuteOptions, num_non_donatable_input_indices);

  PJRT_LoadedExecutable_Execute_Args eargs;
  std::memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_COMPAT_SIZE(PJRT_LoadedExecutable_Execute_Args, execute_device);
  eargs.executable = executable_;
  eargs.options = &options;
  eargs.argument_lists = &arg_list;
  eargs.num_devices = 1;
  eargs.num_args = inputs.size();
  eargs.output_lists = &out_list;
  eargs.device_complete_events = &complete_event;
  if (auto e = ErrorToString(api_->PJRT_LoadedExecutable_Execute(&eargs));
      !e.empty()) {
    return "Execute: " + e;
  }
  if (complete_event != nullptr) {
    if (await) {
      PJRT_Event_Await_Args wargs{PJRT_Event_Await_Args_STRUCT_SIZE, nullptr,
                                  complete_event};
      ErrorToString(api_->PJRT_Event_Await(&wargs));
    }
    PJRT_Event_Destroy_Args edargs{PJRT_Event_Destroy_Args_STRUCT_SIZE,
                                   nullptr, complete_event};
    api_->PJRT_Event_Destroy(&edargs);
  }
  return "";
}

std::string PjrtRunner::ReadBuffers(const std::vector<PJRT_Buffer*>& bufs,
                                    std::vector<Tensor>* outputs) {
  const std::vector<PJRT_Buffer*>& out_buffers = bufs;
  const size_t num_outputs = bufs.size();
  outputs->clear();
  outputs->resize(num_outputs);
  for (size_t i = 0; i < num_outputs; ++i) {
    PJRT_Buffer_Dimensions_Args dims_args;
    std::memset(&dims_args, 0, sizeof(dims_args));
    dims_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dims_args.buffer = out_buffers[i];
    if (auto e = ErrorToString(api_->PJRT_Buffer_Dimensions(&dims_args));
        !e.empty()) {
      return "Buffer_Dimensions: " + e;
    }
    (*outputs)[i].dims.assign(dims_args.dims,
                              dims_args.dims + dims_args.num_dims);
    int64_t n = 1;
    for (auto d : (*outputs)[i].dims) n *= d;
    (*outputs)[i].data.resize(static_cast<size_t>(n));

    // Request an explicit dense row-major host layout. With host_layout
    // null the copy uses the SOURCE buffer's layout — and the compiler is
    // free to choose a non-default (e.g. transposed) layout for outputs,
    // which round-5 debugging caught as a silently-permuted disparity map
    // at 384x1248 (the remote-compile service behind the axon tunnel
    // started choosing such layouts; jax's own buffer machinery always
    // passes an explicit host layout, which is why the Python path was
    // unaffected).
    std::vector<int64_t> minor_to_major(dims_args.num_dims);
    for (size_t d = 0; d < dims_args.num_dims; ++d) {
      minor_to_major[d] =
          static_cast<int64_t>(dims_args.num_dims) - 1 - static_cast<int64_t>(d);
    }
    PJRT_Buffer_MemoryLayout layout;
    std::memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    layout.tiled.minor_to_major = minor_to_major.data();
    layout.tiled.minor_to_major_size = minor_to_major.size();

    PJRT_Buffer_ToHostBuffer_Args hargs;
    std::memset(&hargs, 0, sizeof(hargs));
    hargs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    hargs.src = out_buffers[i];
    hargs.host_layout = &layout;
    hargs.dst = (*outputs)[i].data.data();
    hargs.dst_size = (*outputs)[i].data.size() * sizeof(float);
    if (auto e = ErrorToString(api_->PJRT_Buffer_ToHostBuffer(&hargs));
        !e.empty()) {
      return "ToHostBuffer: " + e;
    }
    if (hargs.event != nullptr) {
      PJRT_Event_Await_Args wargs{PJRT_Event_Await_Args_STRUCT_SIZE, nullptr,
                                  hargs.event};
      ErrorToString(api_->PJRT_Event_Await(&wargs));
      PJRT_Event_Destroy_Args edargs{PJRT_Event_Destroy_Args_STRUCT_SIZE,
                                     nullptr, hargs.event};
      api_->PJRT_Event_Destroy(&edargs);
    }
  }
  return "";
}

void PjrtRunner::DestroyBuffers(std::vector<PJRT_Buffer*>* buffers) {
  for (auto* b : *buffers) {
    if (b == nullptr) continue;
    PJRT_Buffer_Destroy_Args dargs{PJRT_Buffer_Destroy_Args_STRUCT_SIZE,
                                   nullptr, b};
    api_->PJRT_Buffer_Destroy(&dargs);
  }
  buffers->clear();
}

std::string PjrtRunner::TimedRun(int index,
                                 const std::vector<Tensor>& inputs,
                                 int warmup, int frames, TimedStats* stats,
                                 std::vector<Tensor>* last_outputs) {
  if (frames <= 0) return "TimedRun needs frames > 0";
  std::vector<PJRT_Buffer*> in_buffers;
  if (auto e = UploadInputs(inputs, &in_buffers); !e.empty()) return e;

  auto run_anchored = [&](std::vector<Tensor>* host_out) -> std::string {
    std::vector<PJRT_Buffer*> out;
    std::vector<Tensor> scratch;
    auto e = ExecuteBuffers(index, in_buffers, &out, true);
    if (e.empty()) e = ReadBuffers(out, host_out ? host_out : &scratch);
    DestroyBuffers(&out);
    return e;
  };

  std::string err;
  for (int i = 0; i < warmup && err.empty(); ++i) err = run_anchored(nullptr);

  // anchored: per-frame execute + full readback wall-clock
  std::vector<double> per_frame;
  per_frame.reserve(frames);
  for (int i = 0; i < frames && err.empty(); ++i) {
    const auto t0 = std::chrono::steady_clock::now();
    err = run_anchored(nullptr);
    const auto t1 = std::chrono::steady_clock::now();
    per_frame.push_back(
        std::chrono::duration<double>(t1 - t0).count() * 1e3);
  }

  // pipelined: submit everything, anchor once on the last readback.
  // Only two frames' output buffers are ever alive at once: frame i-1's
  // are destroyed as soon as frame i is submitted (destroy is deferred by
  // the runtime until the producing execution completes), so HBM use does
  // not scale with --frames.
  double pipelined_ms = 0.0;
  std::vector<PJRT_Buffer*> prev_out, cur_out;
  if (err.empty()) {
    const auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < frames && err.empty(); ++i) {
      err = ExecuteBuffers(index, in_buffers, &cur_out, false);
      DestroyBuffers(&prev_out);
      prev_out.swap(cur_out);
    }
    std::vector<Tensor> scratch;
    std::vector<Tensor>* sink = last_outputs ? last_outputs : &scratch;
    if (err.empty()) err = ReadBuffers(prev_out, sink);
    const auto t1 = std::chrono::steady_clock::now();
    pipelined_ms =
        std::chrono::duration<double>(t1 - t0).count() * 1e3 / frames;
  }
  DestroyBuffers(&prev_out);
  DestroyBuffers(&cur_out);
  DestroyBuffers(&in_buffers);
  if (!err.empty()) return err;

  std::sort(per_frame.begin(), per_frame.end());
  double sum = 0.0;
  for (double v : per_frame) sum += v;
  stats->frames = frames;
  stats->anchored_ms_mean = sum / frames;
  stats->anchored_ms_median = per_frame[frames / 2];
  stats->pipelined_ms = pipelined_ms;
  return "";
}

}  // namespace esmstereo
