#include "model/hydranet_model.h"

#include <chrono>
#include <cstdlib>
#include <fstream>
#include <sstream>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace hydranet {
namespace {

std::string ReadFile(const std::string& path, bool* ok) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    *ok = false;
    return "";
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  *ok = true;
  return ss.str();
}

double NowMs() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// Fixed demo palette (reference demo.py:88-93).
const cv::Vec3b kSegColors[5] = {
    {0, 0, 0}, {128, 0, 128}, {255, 255, 255}, {255, 255, 0}, {0, 255, 0}};

}  // namespace

std::unique_ptr<HydranetModel> HydranetModel::Load(
    const std::string& artifact_dir, std::string* error) {
  bool ok = false;
  std::string mlir = ReadFile(artifact_dir + "/module.mlir", &ok);
  if (!ok) {
    if (error) *error = "cannot read " + artifact_dir + "/module.mlir";
    return nullptr;
  }
  std::string opts = ReadFile(artifact_dir + "/compile_options.pb", &ok);
  if (!ok) {
    if (error) *error = "cannot read compile_options.pb";
    return nullptr;
  }

  auto model = std::unique_ptr<HydranetModel>(new HydranetModel());

  // artifact.json via OpenCV's JSON FileStorage
  cv::FileStorage fs(artifact_dir + "/artifact.json",
                     cv::FileStorage::READ | cv::FileStorage::FORMAT_JSON);
  if (!fs.isOpened()) {
    if (error) *error = "cannot parse artifact.json";
    return nullptr;
  }
  cv::FileNode input = fs["input"];
  std::vector<int> shape;
  input["shape"] >> shape;
  model->in_b_ = shape[0];
  model->in_h_ = shape[1];
  model->in_w_ = shape[2];
  std::vector<int> net_hw;
  fs["net_input_hw"] >> net_hw;
  model->net_h_ = net_hw[0];
  model->net_w_ = net_hw[1];
  model->seg_num_classes_ = (int)fs["seg_num_classes"];
  model->max_detections_ = (int)fs["max_detections"];
  cv::FileNode lane = fs["lane"];
  model->max_lanes_ = (int)lane["max_lanes"];
  model->points_per_line_ = (int)lane["points_per_line"];
  model->lane_interval_ = (double)lane["interval"];
  for (const auto& n : fs["det_class_list"]) {
    model->class_list_.push_back((std::string)n);
  }
  int i = 0;
  for (const auto& n : fs["outputs"]) {
    std::string name = (std::string)n["name"];
    model->output_names_.push_back(name);
    if (name == "seg") model->idx_seg_ = i;
    if (name == "detections/.boxes") model->idx_det_boxes_ = i;
    if (name == "detections/.scores") model->idx_det_scores_ = i;
    if (name == "detections/.classes") model->idx_det_classes_ = i;
    if (name == "detections/.valid") model->idx_det_valid_ = i;
    if (name == "lanes/.prob") model->idx_lane_prob_ = i;
    if (name == "lanes/.xs") model->idx_lane_xs_ = i;
    if (name == "lanes/.mask") model->idx_lane_mask_ = i;
    if (name == "lanes/.start") model->idx_lane_start_ = i;
    if (name == "lanes/.end") model->idx_lane_end_ = i;
    if (name == "lanes/.valid") model->idx_lane_valid_ = i;
    ++i;
  }
  fs.release();

  model->runtime_ = PjrtRuntime::Create("", error);
  if (!model->runtime_) return nullptr;
  double t0 = NowMs();
  // executable cache: default <artifact>/executable.cache; override with
  // $HN_EXECUTABLE_CACHE, disable with HN_EXECUTABLE_CACHE="" (loading a
  // cached executable skips XLA compilation — the dominant cold-start
  // cost). Stale or cross-version caches fall back to compile and are
  // rewritten.
  std::string cache_path = artifact_dir + "/executable.cache";
  if (const char* env = std::getenv("HN_EXECUTABLE_CACHE")) cache_path = env;
  if (!model->runtime_->CompileWithCache(mlir, opts, cache_path, error)) {
    return nullptr;
  }
  fprintf(stderr, "[hydranet] loaded %s pipeline in %.1f ms (%d outputs)\n",
          model->runtime_->platform_name().c_str(), NowMs() - t0,
          model->runtime_->num_outputs());
  model->input_staging_.resize((size_t)model->in_b_ * model->in_h_ *
                               model->in_w_ * 3);
  return model;
}

bool HydranetModel::Detect(const cv::Mat& input, OutputInfo* out,
                           cv::Mat* visual, std::string* error) {
  double t0 = NowMs();
  cv::Mat frame = input;
  if (frame.rows != in_h_ || frame.cols != in_w_) {
    cv::resize(input, frame, cv::Size(in_w_, in_h_));
  }
  cv::Mat rgb;
  cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
  // batch slot 0 carries the frame; remaining slots (if the artifact was
  // exported batched) are zero.
  std::memcpy(input_staging_.data(), rgb.data, (size_t)in_h_ * in_w_ * 3);
  double t1 = NowMs();

  std::vector<HostBuffer> bufs;
  std::vector<int64_t> dims = {in_b_, in_h_, in_w_, 3};
  if (!runtime_->Execute(input_staging_.data(), dims, PJRT_Buffer_Type_U8,
                         &bufs, error)) {
    return false;
  }
  double t2 = NowMs();

  Postprocess(bufs, input.size(), out);
  LaneSegConsistencyFilter(out, input.size());
  double t3 = NowMs();

  out->preprocess_ms = t1 - t0;
  out->run_ms = t2 - t1;
  out->postprocess_ms = t3 - t2;

  if (visual != nullptr) {
    *visual = input.clone();
    Draw(*out, visual);
  }
  return true;
}

bool HydranetModel::DetectBatch(const std::vector<cv::Mat>& inputs,
                                std::vector<OutputInfo>* outs,
                                std::string* error) {
  if ((int)inputs.size() != in_b_) {
    if (error) {
      *error = "DetectBatch needs exactly " + std::to_string(in_b_) +
               " frames (artifact batch size); got " +
               std::to_string(inputs.size());
    }
    return false;
  }
  double t0 = NowMs();
  const size_t frame_px = (size_t)in_h_ * in_w_ * 3;
  for (int b = 0; b < in_b_; ++b) {
    cv::Mat frame = inputs[b];
    if (frame.rows != in_h_ || frame.cols != in_w_) {
      cv::resize(inputs[b], frame, cv::Size(in_w_, in_h_));
    }
    cv::Mat rgb(in_h_, in_w_, CV_8UC3, input_staging_.data() + b * frame_px);
    cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
  }
  double t1 = NowMs();

  std::vector<HostBuffer> bufs;
  std::vector<int64_t> dims = {in_b_, in_h_, in_w_, 3};
  PjrtRuntime::ExecTiming timing;
  if (!runtime_->ExecuteTimed(input_staging_.data(), dims,
                              PJRT_Buffer_Type_U8, &bufs, &timing, error)) {
    return false;
  }
  double t2 = NowMs();
  last_h2d_ms_ = timing.h2d_ms;
  last_exec_ms_ = timing.exec_ms;
  last_d2h_ms_ = timing.d2h_ms;
  last_rtt_ms_ = timing.rtt_ms;

  outs->clear();
  outs->resize(in_b_);
  for (int b = 0; b < in_b_; ++b) {
    OutputInfo& out = (*outs)[b];
    Postprocess(bufs, inputs[b].size(), &out, b);
    LaneSegConsistencyFilter(&out, inputs[b].size());
  }
  double t3 = NowMs();
  (*outs)[0].preprocess_ms = t1 - t0;
  (*outs)[0].run_ms = t2 - t1;
  (*outs)[0].postprocess_ms = t3 - t2;
  (*outs)[0].h2d_ms = timing.h2d_ms;
  (*outs)[0].exec_ms = timing.exec_ms;
  (*outs)[0].d2h_ms = timing.d2h_ms;
  (*outs)[0].rtt_ms = timing.rtt_ms;
  return true;
}

bool HydranetModel::SubmitFrame(const cv::Mat& input, OutputInfo* out,
                                cv::Mat* visual, bool* got_result,
                                std::string* error) {
  *got_result = false;
  const size_t frame_bytes = (size_t)in_b_ * in_h_ * in_w_ * 3;
  const int s = stage_idx_;
  stage_idx_ = (stage_idx_ + 1) % 2;

  // stage frame k+1 — overlaps the device executing frame k
  double t0 = NowMs();
  if (!runtime_->EnsureHostReusable(s, error)) return false;
  if (staging_[s].size() != frame_bytes) staging_[s].resize(frame_bytes);
  cv::Mat frame = input;
  if (frame.rows != in_h_ || frame.cols != in_w_) {
    cv::resize(input, frame, cv::Size(in_w_, in_h_));
  }
  cv::Mat rgb(in_h_, in_w_, CV_8UC3, staging_[s].data());
  cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
  std::vector<int64_t> dims = {in_b_, in_h_, in_w_, 3};
  if (!runtime_->StageInput(s, staging_[s].data(), dims, PJRT_Buffer_Type_U8,
                            error)) {
    return false;
  }
  double t1 = NowMs();

  // collect frame k's results (if primed)
  if (primed_) {
    std::vector<HostBuffer> bufs;
    if (!runtime_->WaitResults(&bufs, error)) return false;
    double t2 = NowMs();
    Postprocess(bufs, prev_size_, out);
    LaneSegConsistencyFilter(out, prev_size_);
    out->preprocess_ms = prev_pre_ms_;
    out->run_ms = t2 - t1;  // residual device time not hidden by staging
    out->postprocess_ms = NowMs() - t2;
    if (visual != nullptr && !prev_frame_.empty()) {
      *visual = prev_frame_.clone();
      Draw(*out, visual);
    }
    *got_result = true;
  }

  // launch frame k+1
  if (!runtime_->ExecuteStaged(s, error)) return false;
  primed_ = true;
  want_visual_ = visual != nullptr;
  prev_frame_ = want_visual_ ? input.clone() : cv::Mat();
  prev_size_ = input.size();
  prev_pre_ms_ = t1 - t0;
  return true;
}

bool HydranetModel::Flush(OutputInfo* out, cv::Mat* visual,
                          std::string* error) {
  if (!primed_) {
    if (error) *error = "no frame in flight";
    return false;
  }
  primed_ = false;
  double t1 = NowMs();
  std::vector<HostBuffer> bufs;
  if (!runtime_->WaitResults(&bufs, error)) return false;
  double t2 = NowMs();
  Postprocess(bufs, prev_size_, out);
  LaneSegConsistencyFilter(out, prev_size_);
  out->preprocess_ms = prev_pre_ms_;
  out->run_ms = t2 - t1;
  out->postprocess_ms = NowMs() - t2;
  if (visual != nullptr && !prev_frame_.empty()) {
    *visual = prev_frame_.clone();
    Draw(*out, visual);
  }
  return true;
}

void HydranetModel::Postprocess(const std::vector<HostBuffer>& bufs,
                                const cv::Size& org, OutputInfo* out,
                                int batch_index) {
  const float sx = (float)org.width / net_w_;
  const float sy = (float)org.height / net_h_;
  const size_t b = (size_t)batch_index;

  // --- segmentation: int32 class map [B, H, W] -> CV_8U
  if (idx_seg_ >= 0) {
    const HostBuffer& seg = bufs[idx_seg_];
    int h = (int)seg.dims[1], w = (int)seg.dims[2];
    out->seg_mask = cv::Mat(h, w, CV_8U);
    const int32_t* p = seg.as<int32_t>() + b * h * w;
    for (int r = 0; r < h; ++r)
      for (int c = 0; c < w; ++c)
        out->seg_mask.at<uint8_t>(r, c) = (uint8_t)p[(size_t)r * w + c];
  }

  // --- detections (already decoded + NMS'd on device)
  if (idx_det_boxes_ >= 0) {
    int n = (int)bufs[idx_det_boxes_].dims[1];
    const float* boxes = bufs[idx_det_boxes_].as<float>() + b * n * 4;
    const float* scores = bufs[idx_det_scores_].as<float>() + b * n;
    const int32_t* classes = bufs[idx_det_classes_].as<int32_t>() + b * n;
    const uint8_t* valid = bufs[idx_det_valid_].as<uint8_t>() + b * n;
    for (int k = 0; k < n; ++k) {
      if (!valid[k]) continue;
      DetectionResult d;
      d.x1 = boxes[k * 4 + 0] * sx;
      d.y1 = boxes[k * 4 + 1] * sy;
      d.x2 = boxes[k * 4 + 2] * sx;
      d.y2 = boxes[k * 4 + 3] * sy;
      d.score = scores[k];
      d.class_id = classes[k];
      out->detections.push_back(d);
    }
  }

  // --- lanes (decoded + NMS'd on device): xs grid -> point lists
  if (idx_lane_prob_ >= 0) {
    int L = (int)bufs[idx_lane_xs_].dims[1];
    int ppl = (int)bufs[idx_lane_xs_].dims[2];
    const float* prob = bufs[idx_lane_prob_].as<float>() + b * L;
    const float* xs = bufs[idx_lane_xs_].as<float>() + b * L * ppl;
    const uint8_t* mask = bufs[idx_lane_mask_].as<uint8_t>() + b * L * ppl;
    const int32_t* start = bufs[idx_lane_start_].as<int32_t>() + b * L;
    const int32_t* end = bufs[idx_lane_end_].as<int32_t>() + b * L;
    const uint8_t* valid = bufs[idx_lane_valid_].as<uint8_t>() + b * L;
    for (int l = 0; l < L; ++l) {
      if (!valid[l] || prob[l] < 0.01f) continue;
      LaneResult lane;
      lane.score = prob[l];
      for (int p = start[l]; p < end[l] && p < ppl; ++p) {
        if (p < 0 || !mask[(size_t)l * ppl + p]) continue;
        LanePoint pt;
        pt.x = xs[(size_t)l * ppl + p] * sx;
        pt.y = (float)((net_h_ - 1 - p * lane_interval_) * sy);
        lane.points.push_back(pt);
      }
      if (lane.points.size() >= 2) out->lanes.push_back(lane);
    }
  }
}

void HydranetModel::LaneSegConsistencyFilter(OutputInfo* out,
                                             const cv::Size& org) const {
  // Keep a lane only if its rasterization overlaps the segmentation's
  // marking class (id 2) by > 1% — the reference's C++-only filter
  // (hydranet_model.cpp:568-607).
  if (out->seg_mask.empty() || out->lanes.empty()) return;
  cv::Mat marking = (out->seg_mask == 2);  // 255 where marking_area
  const float sx = (float)out->seg_mask.cols / org.width;
  const float sy = (float)out->seg_mask.rows / org.height;
  std::vector<LaneResult> kept;
  for (const auto& lane : out->lanes) {
    cv::Mat raster = cv::Mat::zeros(out->seg_mask.size(), CV_8U);
    for (size_t i = 0; i + 1 < lane.points.size(); ++i) {
      cv::line(raster,
               cv::Point((int)(lane.points[i].x * sx),
                         (int)(lane.points[i].y * sy)),
               cv::Point((int)(lane.points[i + 1].x * sx),
                         (int)(lane.points[i + 1].y * sy)),
               255, 5);
    }
    cv::Mat overlap;
    cv::bitwise_and(raster, marking, overlap);
    double lane_px = cv::countNonZero(raster);
    double hit_px = cv::countNonZero(overlap);
    double ratio = lane_px > 0 ? hit_px / lane_px : 0.0;
    if (ratio > 0.01) kept.push_back(lane);
    if (std::getenv("HN_DEPLOY_VERBOSE") != nullptr) {
      fprintf(stderr,
              "lane_filter: score %.3f overlap %.3f (%0.f/%0.f px) -> %s\n",
              lane.score, ratio, hit_px, lane_px,
              ratio > 0.01 ? "KEEP" : "DROP");
    }
  }
  if (std::getenv("HN_DEPLOY_VERBOSE") != nullptr) {
    fprintf(stderr, "lane_filter: %zu -> %zu lanes\n", out->lanes.size(),
            kept.size());
  }
  out->lanes.swap(kept);
}

void HydranetModel::Draw(const OutputInfo& out, cv::Mat* visual) const {
  // seg overlay
  if (!out.seg_mask.empty()) {
    cv::Mat color(out.seg_mask.size(), CV_8UC3, cv::Scalar(0, 0, 0));
    for (int r = 0; r < out.seg_mask.rows; ++r) {
      for (int c = 0; c < out.seg_mask.cols; ++c) {
        int id = out.seg_mask.at<uint8_t>(r, c);
        if (id > 0 && id < 5) color.at<cv::Vec3b>(r, c) = kSegColors[id];
      }
    }
    cv::resize(color, color, visual->size(), 0, 0, cv::INTER_NEAREST);
    cv::addWeighted(*visual, 0.8, color, 0.5, 0.0, *visual);
  }
  // lanes
  for (const auto& lane : out.lanes) {
    for (size_t i = 0; i + 1 < lane.points.size(); ++i) {
      cv::line(*visual,
               cv::Point((int)lane.points[i].x, (int)lane.points[i].y),
               cv::Point((int)lane.points[i + 1].x,
                         (int)lane.points[i + 1].y),
               cv::Scalar(0, 255, 255), 10);
    }
    char txt[64];
    snprintf(txt, sizeof(txt), "Lane: %.2f", lane.score);
    cv::putText(*visual, txt,
                cv::Point(std::max(30, (int)lane.points[0].x),
                          std::max(30, (int)lane.points[0].y - 10)),
                cv::FONT_HERSHEY_SIMPLEX, 1.2, cv::Scalar(0, 255, 255), 3);
  }
  // detections
  for (const auto& d : out.detections) {
    cv::rectangle(*visual, cv::Point((int)d.x1, (int)d.y1),
                  cv::Point((int)d.x2, (int)d.y2), cv::Scalar(0, 255, 0), 2);
    std::string label =
        (d.class_id + 1 < (int)class_list_.size())
            ? class_list_[d.class_id + 1]  // class_list_[0] is background
            : std::to_string(d.class_id);
    char txt[96];
    snprintf(txt, sizeof(txt), "%s %.0f%%", label.c_str(), d.score * 100);
    cv::putText(*visual, txt, cv::Point((int)d.x1, (int)d.y1 - 4),
                cv::FONT_HERSHEY_SIMPLEX, 0.6, cv::Scalar(0, 0, 0), 1);
  }
}

}  // namespace hydranet
