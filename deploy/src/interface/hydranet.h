// C ABI (TPU-native equivalent of the reference's
// deploy/src/interface/Hydranet.h:83-111): opaque-handle init/detect/uninit
// with POD result structs, consumable from any language.

#ifndef HYDRANET_DEPLOY_INTERFACE_HYDRANET_H_
#define HYDRANET_DEPLOY_INTERFACE_HYDRANET_H_

#ifdef __cplusplus
extern "C" {
#endif

#if defined(_WIN32)
#define HYDRANET_API __declspec(dllexport)
#else
#define HYDRANET_API __attribute__((visibility("default")))
#endif

#define HN_MAX_LANE_POINTS 256
#define HN_MAX_LANES 16
#define HN_MAX_DETECTIONS 100

typedef struct {
  float x;
  float y;
} HN_Point;

typedef struct {
  float score;
  int num_points;
  HN_Point points[HN_MAX_LANE_POINTS];
} HN_Lane;

typedef struct {
  float x1, y1, x2, y2;
  float score;
  int class_id;  // 0-based, background excluded
} HN_Detection;

typedef struct {
  int num_lanes;
  HN_Lane lanes[HN_MAX_LANES];
  int num_detections;
  HN_Detection detections[HN_MAX_DETECTIONS];
  // Segmentation class-id mask at network resolution; row-major uint8.
  // Points into memory owned by the handle; valid until the next Detect.
  const unsigned char* seg_mask;
  int seg_height;
  int seg_width;
  double preprocess_ms, run_ms, postprocess_ms;
  // run_ms decomposition (batched path, frame 0 only): host->device input
  // transfer / device execute (fenced by a digest fetch of the smallest
  // output — transport completion events fire at enqueue on tunneled
  // PJRT transports) / device->host output fetch. rtt_ms is the measured
  // per-call tunnel round trip the fence itself pays (measurement
  // overhead, subtracted from exec_ms, never paid by production paths).
  double h2d_ms, exec_ms, d2h_ms, rtt_ms;
} HN_Output;

// Returns 0 on success. artifact_dir: directory produced by
// `python -m hydranet_tpu.demo --deploy` / InferencePipeline.export_artifact.
HYDRANET_API int Hydranet_Init(void** handle, const char* artifact_dir);

// bgr: 8-bit 3-channel row-major frame of size (height, width).
// visual_bgr: optional output overlay buffer of the same size, or NULL.
HYDRANET_API int Hydranet_Detect(void* handle, const unsigned char* bgr,
                                 int height, int width, HN_Output* output,
                                 unsigned char* visual_bgr);

// Pipelined serving (double-buffered H2D): stages this frame while the
// device executes the previous one. Returns 1 and fills output/visual_bgr
// with the PREVIOUS frame's results once the pipeline is primed, 0 when no
// result is ready yet (first frame), negative on error. visual_bgr (if
// non-NULL) must be sized for the PREVIOUS submitted frame. Drain the last
// in-flight frame with Hydranet_Flush. Don't interleave with
// Hydranet_Detect.
HYDRANET_API int Hydranet_Detect_Pipelined(void* handle,
                                           const unsigned char* bgr,
                                           int height, int width,
                                           HN_Output* output,
                                           unsigned char* visual_bgr);
HYDRANET_API int Hydranet_Flush(void* handle, HN_Output* output,
                                unsigned char* visual_bgr);

// Batch size the loaded artifact was exported with (1 for the demo
// artifact; N for a throughput/BASELINE-config-4 artifact).
HYDRANET_API int Hydranet_BatchSize(void* handle);

// Batched inference: `n` stacked BGR frames (all height x width, contiguous
// n*height*width*3 bytes) through ONE device execution; `outputs` must hold
// n HN_Output structs. n must equal Hydranet_BatchSize(). outputs[0]
// carries the shared stage timings; its run_ms decomposition
// (h2d / device execute / d2h) is printed by the demo driver. The seg_mask
// pointers stay valid until the next *Detect* call on the handle.
HYDRANET_API int Hydranet_Detect_Batched(void* handle,
                                         const unsigned char* bgr_frames,
                                         int n, int height, int width,
                                         HN_Output* outputs);

HYDRANET_API int Hydranet_Uinit(void* handle);

#ifdef __cplusplus
}
#endif

#endif  // HYDRANET_DEPLOY_INTERFACE_HYDRANET_H_
