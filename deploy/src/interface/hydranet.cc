#include "interface/hydranet.h"

#include <cstdio>
#include <cstring>

#include "model/hydranet_model.h"

namespace {

struct Handle {
  std::unique_ptr<hydranet::HydranetModel> model;
  cv::Mat last_seg;  // keeps seg_mask memory alive across the C boundary
  std::vector<cv::Mat> last_segs;  // ditto for the batched path
};

void FillOutput(Handle* h, const hydranet::OutputInfo& info,
                HN_Output* output) {
  std::memset(output, 0, sizeof(HN_Output));
  output->num_lanes = 0;
  for (const auto& lane : info.lanes) {
    if (output->num_lanes >= HN_MAX_LANES) break;
    HN_Lane& dst = output->lanes[output->num_lanes++];
    dst.score = lane.score;
    dst.num_points = 0;
    for (const auto& p : lane.points) {
      if (dst.num_points >= HN_MAX_LANE_POINTS) break;
      dst.points[dst.num_points].x = p.x;
      dst.points[dst.num_points].y = p.y;
      dst.num_points++;
    }
  }
  output->num_detections = 0;
  for (const auto& d : info.detections) {
    if (output->num_detections >= HN_MAX_DETECTIONS) break;
    HN_Detection& dst = output->detections[output->num_detections++];
    dst.x1 = d.x1;
    dst.y1 = d.y1;
    dst.x2 = d.x2;
    dst.y2 = d.y2;
    dst.score = d.score;
    dst.class_id = d.class_id;
  }
  h->last_seg = info.seg_mask;
  output->seg_mask = h->last_seg.data;
  output->seg_height = h->last_seg.rows;
  output->seg_width = h->last_seg.cols;
  output->preprocess_ms = info.preprocess_ms;
  output->run_ms = info.run_ms;
  output->postprocess_ms = info.postprocess_ms;
  output->h2d_ms = info.h2d_ms;
  output->exec_ms = info.exec_ms;
  output->d2h_ms = info.d2h_ms;
  output->rtt_ms = info.rtt_ms;
}

}  // namespace

extern "C" {

int Hydranet_Init(void** handle, const char* artifact_dir) {
  std::string error;
  auto model = hydranet::HydranetModel::Load(artifact_dir, &error);
  if (!model) {
    fprintf(stderr, "[hydranet] init failed: %s\n", error.c_str());
    return -1;
  }
  auto* h = new Handle();
  h->model = std::move(model);
  *handle = h;
  return 0;
}

int Hydranet_Detect(void* handle, const unsigned char* bgr, int height,
                    int width, HN_Output* output, unsigned char* visual_bgr) {
  if (handle == nullptr || bgr == nullptr || output == nullptr) return -1;
  auto* h = static_cast<Handle*>(handle);
  cv::Mat frame(height, width, CV_8UC3, const_cast<unsigned char*>(bgr));

  hydranet::OutputInfo info;
  cv::Mat visual;
  std::string error;
  if (!h->model->Detect(frame, &info,
                        visual_bgr != nullptr ? &visual : nullptr, &error)) {
    fprintf(stderr, "[hydranet] detect failed: %s\n", error.c_str());
    return -2;
  }

  FillOutput(h, info, output);
  if (visual_bgr != nullptr && !visual.empty()) {
    std::memcpy(visual_bgr, visual.data, (size_t)height * width * 3);
  }
  return 0;
}

int Hydranet_Detect_Pipelined(void* handle, const unsigned char* bgr,
                              int height, int width, HN_Output* output,
                              unsigned char* visual_bgr) {
  if (handle == nullptr || bgr == nullptr || output == nullptr) return -1;
  auto* h = static_cast<Handle*>(handle);
  cv::Mat frame(height, width, CV_8UC3, const_cast<unsigned char*>(bgr));

  hydranet::OutputInfo info;
  cv::Mat visual;
  bool got = false;
  std::string error;
  if (!h->model->SubmitFrame(frame, &info,
                             visual_bgr != nullptr ? &visual : nullptr, &got,
                             &error)) {
    fprintf(stderr, "[hydranet] pipelined detect failed: %s\n",
            error.c_str());
    return -2;
  }
  if (!got) return 0;
  FillOutput(h, info, output);
  if (visual_bgr != nullptr && !visual.empty()) {
    std::memcpy(visual_bgr, visual.data,
                (size_t)visual.rows * visual.cols * 3);
  }
  return 1;
}

int Hydranet_Flush(void* handle, HN_Output* output,
                   unsigned char* visual_bgr) {
  if (handle == nullptr || output == nullptr) return -1;
  auto* h = static_cast<Handle*>(handle);
  hydranet::OutputInfo info;
  cv::Mat visual;
  std::string error;
  if (!h->model->Flush(&info, visual_bgr != nullptr ? &visual : nullptr,
                       &error)) {
    fprintf(stderr, "[hydranet] flush failed: %s\n", error.c_str());
    return -2;
  }
  FillOutput(h, info, output);
  if (visual_bgr != nullptr && !visual.empty()) {
    std::memcpy(visual_bgr, visual.data,
                (size_t)visual.rows * visual.cols * 3);
  }
  return 1;
}

int Hydranet_BatchSize(void* handle) {
  if (handle == nullptr) return -1;
  return static_cast<Handle*>(handle)->model->batch_size();
}

int Hydranet_Detect_Batched(void* handle, const unsigned char* bgr_frames,
                            int n, int height, int width,
                            HN_Output* outputs) {
  if (handle == nullptr || bgr_frames == nullptr || outputs == nullptr) {
    return -1;
  }
  auto* h = static_cast<Handle*>(handle);
  std::vector<cv::Mat> frames;
  frames.reserve(n);
  const size_t frame_bytes = (size_t)height * width * 3;
  for (int b = 0; b < n; ++b) {
    frames.emplace_back(height, width, CV_8UC3,
                        const_cast<unsigned char*>(bgr_frames) +
                            b * frame_bytes);
  }
  std::vector<hydranet::OutputInfo> infos;
  std::string error;
  if (!h->model->DetectBatch(frames, &infos, &error)) {
    fprintf(stderr, "[hydranet] batched detect failed: %s\n", error.c_str());
    return -2;
  }
  h->last_segs.resize(n);
  for (int b = 0; b < n; ++b) {
    FillOutput(h, infos[b], &outputs[b]);
    // FillOutput parks the seg mat in h->last_seg (single-frame slot);
    // move it to the per-frame slot so every frame's pointer stays valid
    h->last_segs[b] = infos[b].seg_mask;
    outputs[b].seg_mask = h->last_segs[b].data;
  }
  return 0;
}

int Hydranet_Uinit(void* handle) {
  delete static_cast<Handle*>(handle);
  return 0;
}

}  // extern "C"
