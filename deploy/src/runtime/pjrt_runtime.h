// PJRT runtime wrapper: the TPU-native replacement for the reference's
// ONNX Runtime session (reference deploy/src/model/hydranet_model.h:128-223,
// which owns an Ort::Env/Session with TensorRT/CUDA EPs).
//
// Loads a PJRT C-API plugin (libtpu.so on TPU hosts; $PJRT_LIBRARY_PATH
// override), compiles a StableHLO module exported by
// hydranet_tpu.inference.InferencePipeline.export_artifact, and executes it
// with zero-copy host buffers.

#ifndef HYDRANET_DEPLOY_PJRT_RUNTIME_H_
#define HYDRANET_DEPLOY_PJRT_RUNTIME_H_

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

struct PJRT_Api;
struct PJRT_Client;
struct PJRT_LoadedExecutable;
struct PJRT_Device;
struct PJRT_Buffer;
struct PJRT_Event;

namespace hydranet {

struct HostBuffer {
  std::vector<uint8_t> data;
  std::vector<int64_t> dims;
  int element_type = 0;  // PJRT_Buffer_Type
  size_t element_size = 0;

  template <typename T>
  const T* as() const {
    return reinterpret_cast<const T*>(data.data());
  }
  int64_t num_elements() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n;
  }
};

class PjrtRuntime {
 public:
  ~PjrtRuntime();

  // plugin_path: explicit .so path, or "" to use $PJRT_LIBRARY_PATH and then
  // "libtpu.so".
  //
  // Client create options: some PJRT plugins require named options. They can
  // be supplied via $HN_PJRT_CLIENT_OPTIONS as ";"-separated "key=value"
  // pairs (values parsed as int64 when numeric; "str:" prefix forces string).
  // libtpu needs none.
  static std::unique_ptr<PjrtRuntime> Create(const std::string& plugin_path,
                                             std::string* error);

  bool Compile(const std::string& mlir_bytes,
               const std::string& compile_options,
               std::string* error);

  // Compile with an on-disk executable cache: when `cache_path` holds a
  // previously serialized executable it is deserialized and loaded
  // (seconds) instead of recompiled (minutes through a remote-compile
  // tunnel); after a fresh compile the serialized executable is written
  // back. Both directions are best-effort — a plugin that does not
  // implement PJRT serialization, or a stale/foreign cache file, falls
  // through to the normal compile path and overwrites the cache.
  bool CompileWithCache(const std::string& mlir_bytes,
                        const std::string& compile_options,
                        const std::string& cache_path,
                        std::string* error);

  // Execute with a single dense input (uint8 NHWC frames for HydraNet).
  // Outputs are fetched to host in executable output order.
  bool Execute(const void* input, const std::vector<int64_t>& dims,
               int input_type /* PJRT_Buffer_Type */,
               std::vector<HostBuffer>* outputs, std::string* error);

  // Stage-decomposed latency of one execution: host->device transfer
  // (awaits the input buffer's ready event), device execute, device->host
  // output fetch. Serializes the stages it times — use Execute/the staged
  // path for production serving and this for attribution (the reference
  // prints per-stage chrono timers, hydranet_model.cpp:356-364; this adds
  // the transfer/compute split the wall clock alone cannot see).
  //
  // exec_ms is fenced by a digest fetch of the smallest output, NOT by the
  // device-complete event: on tunneled transports that event completes at
  // enqueue (the r4 bs16 artifact recorded "execute 0.05 ms" for a batch
  // that takes ~17 ms of device time). The fence pays one tunnel round
  // trip, which is measured per call by re-fetching the already-resident
  // buffer and subtracted; the measured round trip is reported in rtt_ms.
  // h2d + exec + rtt + d2h therefore ~= the timed wall clock, with rtt
  // being measurement overhead that production paths never pay.
  struct ExecTiming {
    double h2d_ms = 0, exec_ms = 0, d2h_ms = 0, rtt_ms = 0;
  };
  bool ExecuteTimed(const void* input, const std::vector<int64_t>& dims,
                    int input_type, std::vector<HostBuffer>* outputs,
                    ExecTiming* timing, std::string* error);

  // --- pipelined path (double-buffered H2D) -------------------------------
  // StageInput starts an async host->device transfer into one of two input
  // slots and returns the slot id (or -1 on error). The caller's host memory
  // must stay untouched until that slot is staged again (the runtime awaits
  // the transfer-done event before reusing a slot). ExecuteStaged launches
  // the executable on a staged slot WITHOUT waiting for completion (at most
  // one execution in flight); WaitResults blocks on it and fetches outputs.
  // This lets the host resize/convert/stage frame k+1 while the device
  // executes frame k (the reference's ORT path had the same serialization:
  // fill then Run, hydranet_model.cpp:240-360).
  // Await the previous transfer out of `slot_id`'s host memory (call BEFORE
  // overwriting the host staging buffer bound to that slot).
  bool EnsureHostReusable(int slot_id, std::string* error);
  bool StageInput(int slot_id, const void* input,
                  const std::vector<int64_t>& dims, int input_type,
                  std::string* error);
  bool ExecuteStaged(int slot, std::string* error);
  bool WaitResults(std::vector<HostBuffer>* outputs, std::string* error);
  bool has_pending() const { return pending_.active; }

  int num_outputs() const { return num_outputs_; }
  const std::string& platform_name() const { return platform_name_; }

 private:
  PjrtRuntime() = default;

  // shared post-compile/post-load setup (output count query)
  bool FinishExecutableSetup(std::string* error);

  struct Slot {
    PJRT_Buffer* buffer = nullptr;
    PJRT_Event* host_done = nullptr;  // caller memory reusable after this
  };
  struct Pending {
    bool active = false;
    PJRT_Buffer* input = nullptr;
    PJRT_Event* device_done = nullptr;
    std::vector<PJRT_Buffer*> outputs;
  };
  bool ReleaseSlot(Slot* slot, std::string* error);

  void* dl_handle_ = nullptr;
  const PJRT_Api* api_ = nullptr;
  PJRT_Client* client_ = nullptr;
  PJRT_LoadedExecutable* executable_ = nullptr;
  PJRT_Device* device_ = nullptr;
  int num_outputs_ = 0;
  std::string platform_name_;
  Slot slots_[2];
  int next_slot_ = 0;
  Pending pending_;
};

}  // namespace hydranet

#endif  // HYDRANET_DEPLOY_PJRT_RUNTIME_H_
