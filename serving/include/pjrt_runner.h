// Minimal PJRT C-API host runtime: load a plugin .so, compile a StableHLO
// module, and execute it — the TPU-native counterpart of the reference's
// TensorRT engine loading + enqueueV3 pipeline
// (/root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp:
// loadEngine 177-209, initializeTensorRT 211-263, publishImages 323-383).
//
// Where CUDA serving deserialises a .plan into an ICudaEngine, TPU serving
// hands the exported StableHLO module (tools/export_stablehlo.py) to the
// platform's PJRT plugin (libtpu.so on TPU hosts) via the stable C API.

#pragma once

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

typedef struct PJRT_Api PJRT_Api;
typedef struct PJRT_Buffer PJRT_Buffer;
typedef struct PJRT_Client PJRT_Client;
typedef struct PJRT_Device PJRT_Device;
typedef struct PJRT_LoadedExecutable PJRT_LoadedExecutable;

namespace esmstereo {

class PjrtRunner {
 public:
  // A client create option: int64 if `is_int`, else string.
  struct Option {
    std::string name;
    std::string str_value;
    int64_t int_value = 0;
    bool is_int = false;
  };

  // plugin_path: PJRT plugin shared object (e.g. libtpu.so).
  explicit PjrtRunner(const std::string& plugin_path,
                      std::vector<Option> options = {});
  ~PjrtRunner();

  PjrtRunner(const PjrtRunner&) = delete;
  PjrtRunner& operator=(const PjrtRunner&) = delete;

  // Loads the plugin and creates a client. Returns empty string on
  // success, else an error message.
  std::string Initialize();

  // Compiles an MLIR (StableHLO) module. Empty string on success.
  // Multiple modules may be compiled into the same client (the two-engine
  // A/B harness runs a second network alongside the primary, like the
  // reference's ESS comparison node); each gets an index in compile order.
  std::string Compile(const std::string& mlir_module);
  std::string CompileModule(const std::string& mlir_module, int* index);

  // Overrides the serialized xla.CompileOptionsProto passed to
  // PJRT_Client_Compile. The built-in default is a minimal hand-encoded
  // proto (num_replicas=1, num_partitions=1); some backends/services
  // require the full options jax would send — dump those with
  //   jax._src.compiler.get_compile_options(1, 1).SerializeAsString()
  // and pass the bytes here.
  void set_compile_options(std::string proto_bytes) {
    compile_options_override_ = std::move(proto_bytes);
  }

  // Executes with float32 inputs; each input/output is a (dims, data)
  // pair. Empty string on success.
  struct Tensor {
    std::vector<int64_t> dims;
    std::vector<float> data;
  };
  std::string Execute(const std::vector<Tensor>& inputs,
                      std::vector<Tensor>* outputs);
  std::string ExecuteModule(int index, const std::vector<Tensor>& inputs,
                            std::vector<Tensor>* outputs);

  // --- Lower-level pieces (steady-state serving loop) ---------------------
  // The one-shot ExecuteModule re-uploads the inputs and reads back every
  // output on every call; a serving loop wants to upload the frame once
  // and time repeated executions. These expose the stages separately.

  // Host float32 tensors -> device buffers (blocks until transferred).
  std::string UploadInputs(const std::vector<Tensor>& inputs,
                           std::vector<PJRT_Buffer*>* buffers);
  // One execution on already-resident buffers. If `await`, blocks on the
  // device-complete event; otherwise the execution is left in flight
  // (executions on one device retire in submission order).
  std::string ExecuteBuffers(int index,
                             const std::vector<PJRT_Buffer*>& inputs,
                             std::vector<PJRT_Buffer*>* outputs, bool await);
  // Device buffers -> host tensors (blocks: this is the D2H anchor).
  std::string ReadBuffers(const std::vector<PJRT_Buffer*>& buffers,
                          std::vector<Tensor>* outputs);
  void DestroyBuffers(std::vector<PJRT_Buffer*>* buffers);

  // Steady-state per-frame timing, the counterpart of the reference
  // node's per-frame enqueueV3 wall-clock
  // (kitti_publisher_cuda_node.cpp:361-380). Inputs are uploaded ONCE;
  // then `warmup` anchored frames are discarded and `frames` are timed
  // two ways:
  //   anchored_ms_*: execute + full output readback per frame (honest
  //     per-frame latency including the D2H anchor — on tunneled
  //     platforms a bare execute-event await may not block);
  //   pipelined_ms: all executions submitted back-to-back, one readback
  //     at the end anchoring the whole chain — amortised per-frame
  //     throughput, the C++ analog of bench.py's chained-scan number.
  // `last_outputs`, if non-null, receives the final frame's outputs.
  struct TimedStats {
    double anchored_ms_mean = 0.0;
    double anchored_ms_median = 0.0;
    double pipelined_ms = 0.0;
    int frames = 0;
  };
  std::string TimedRun(int index, const std::vector<Tensor>& inputs,
                       int warmup, int frames, TimedStats* stats,
                       std::vector<Tensor>* last_outputs);

  const std::string& platform_name() const { return platform_name_; }

 private:
  std::string plugin_path_;
  std::string compile_options_override_;
  std::vector<Option> options_;
  void* dl_handle_ = nullptr;
  const PJRT_Api* api_ = nullptr;
  PJRT_Client* client_ = nullptr;
  PJRT_Device* device_ = nullptr;
  std::vector<PJRT_LoadedExecutable*> executables_;
  std::string platform_name_;

  std::string ErrorToString(void* error);
};

}  // namespace esmstereo
