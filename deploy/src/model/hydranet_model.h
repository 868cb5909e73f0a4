// HydraNet native inference core (TPU-native equivalent of the reference's
// deploy/src/model/hydranet_model.h:128-223, which wraps an ONNX Runtime
// session with CUDA/TensorRT EPs).
//
// Differences by design: preprocessing (resize + normalize) and ALL
// post-processing (box decode + NMS, seg argmax, lane decode + lane NMS) are
// already inside the compiled StableHLO program, so the native layer only
// fills the uint8 frame buffer, executes via PJRT, converts the fixed-shape
// outputs to result structs, applies the seg-mask lane-consistency filter
// (the reference's C++-only feature, hydranet_model.cpp:568-607), and draws.

#ifndef HYDRANET_DEPLOY_HYDRANET_MODEL_H_
#define HYDRANET_DEPLOY_HYDRANET_MODEL_H_

#include <memory>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "runtime/pjrt_runtime.h"

namespace hydranet {

struct LanePoint {
  float x = 0.f;
  float y = 0.f;
};

struct LaneResult {
  float score = 0.f;
  std::vector<LanePoint> points;  // original-image coordinates, bottom first
};

struct DetectionResult {
  float x1 = 0.f, y1 = 0.f, x2 = 0.f, y2 = 0.f;  // original-image coords
  float score = 0.f;
  int class_id = 0;  // 0-based (background excluded)
};

struct OutputInfo {
  std::vector<LaneResult> lanes;
  std::vector<DetectionResult> detections;
  cv::Mat seg_mask;  // CV_8U class ids at network resolution
  // per-stage latencies (ms), mirroring the reference's chrono prints
  double preprocess_ms = 0, run_ms = 0, postprocess_ms = 0;
  // run_ms decomposition (filled by DetectBatch on frame 0): host->device
  // input transfer, device execute, device->host output fetch
  double h2d_ms = 0, exec_ms = 0, d2h_ms = 0, rtt_ms = 0;
};

class HydranetModel {
 public:
  // artifact_dir: directory written by
  // hydranet_tpu.inference.InferencePipeline.export_artifact
  static std::unique_ptr<HydranetModel> Load(const std::string& artifact_dir,
                                             std::string* error);

  // input: BGR frame (any size; resized to the artifact's input resolution).
  // visual: if non-null, overlay detections/lanes/seg onto a copy of input.
  bool Detect(const cv::Mat& input, OutputInfo* out, cv::Mat* visual,
              std::string* error);

  // Batched inference (BASELINE config 4): exactly batch_size() BGR frames
  // through ONE device execution; outs gets one OutputInfo per frame
  // (frame 0 additionally carries the shared stage timings, with run_ms
  // decomposed into h2d/execute/d2h below). The artifact must have been
  // exported with batch_size > 1.
  bool DetectBatch(const std::vector<cv::Mat>& inputs,
                   std::vector<OutputInfo>* outs, std::string* error);
  // stage decomposition of the last DetectBatch/Detect run (ms)
  double last_h2d_ms() const { return last_h2d_ms_; }
  double last_exec_ms() const { return last_exec_ms_; }
  double last_d2h_ms() const { return last_d2h_ms_; }
  double last_rtt_ms() const { return last_rtt_ms_; }
  int batch_size() const { return in_b_; }

  // Pipelined serving with double-buffered H2D: stages frame k+1 (resize +
  // BGR2RGB + async host->device copy) while the device executes frame k.
  // When the pipeline is primed, fills out/visual with the PREVIOUS frame's
  // results and sets *got_result=true (one-frame latency). Call Flush to
  // drain the final in-flight frame. Don't interleave with Detect().
  bool SubmitFrame(const cv::Mat& input, OutputInfo* out, cv::Mat* visual,
                   bool* got_result, std::string* error);
  bool Flush(OutputInfo* out, cv::Mat* visual, std::string* error);

  int input_height() const { return in_h_; }
  int input_width() const { return in_w_; }

 private:
  HydranetModel() = default;
  void Postprocess(const std::vector<HostBuffer>& bufs, const cv::Size& org,
                   OutputInfo* out, int batch_index = 0);
  void LaneSegConsistencyFilter(OutputInfo* out, const cv::Size& org) const;
  void Draw(const OutputInfo& out, cv::Mat* visual) const;

  std::unique_ptr<PjrtRuntime> runtime_;
  // artifact metadata
  int in_b_ = 1, in_h_ = 0, in_w_ = 0;
  int net_h_ = 0, net_w_ = 0;
  int seg_num_classes_ = 0;
  int max_detections_ = 0, max_lanes_ = 0, points_per_line_ = 0;
  double lane_interval_ = 0;
  std::vector<std::string> output_names_;
  std::vector<std::string> class_list_;
  // output indices by role
  int idx_seg_ = -1, idx_det_boxes_ = -1, idx_det_scores_ = -1,
      idx_det_classes_ = -1, idx_det_valid_ = -1;
  int idx_lane_prob_ = -1, idx_lane_xs_ = -1, idx_lane_mask_ = -1,
      idx_lane_start_ = -1, idx_lane_end_ = -1, idx_lane_valid_ = -1;
  std::vector<uint8_t> input_staging_;
  // pipelined-path state (SubmitFrame/Flush)
  std::vector<uint8_t> staging_[2];
  int stage_idx_ = 0;
  bool primed_ = false;
  bool want_visual_ = false;
  cv::Mat prev_frame_;
  cv::Size prev_size_;
  double prev_pre_ms_ = 0;
  double last_h2d_ms_ = 0, last_exec_ms_ = 0, last_d2h_ms_ = 0,
      last_rtt_ms_ = 0;
};

}  // namespace hydranet

#endif  // HYDRANET_DEPLOY_HYDRANET_MODEL_H_
