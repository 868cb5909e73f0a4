// Native demo driver (TPU-native equivalent of the reference's
// deploy/src/demo/Demo.cpp:9-141): mode 1 = repeat a single image with
// 10 warmup + 20 timed iterations and print the average latency; mode 2 =
// video file; mode 3 = camera; mode 4 = batched throughput (repeat the
// image across the artifact's batch, 10 warmup + 20 timed batched
// executions, per-frame latency + fps + h2d/execute/d2h decomposition —
// BASELINE config 4 through the C ABI).

#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "interface/hydranet.h"

namespace {

double NowMs() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

void PrintStages(const HN_Output& out) {
  printf("  preprocess %.2f ms | run %.2f ms | postprocess %.2f ms | "
         "%d dets, %d lanes\n",
         out.preprocess_ms, out.run_ms, out.postprocess_ms,
         out.num_detections, out.num_lanes);
  if (out.h2d_ms > 0 || out.exec_ms > 0) {
    printf("    run = h2d %.2f + execute %.2f + d2h %.2f ms"
           " (+ %.2f ms fence round trip, measurement-only)\n",
           out.h2d_ms, out.exec_ms, out.d2h_ms, out.rtt_ms);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: %s <artifact_dir> <mode: 1=image 2=video 3=camera "
            "4=batched-throughput> <path-or-cam-index> [out_path]\n",
            argv[0]);
    return 1;
  }
  const std::string artifact_dir = argv[1];
  const int mode = atoi(argv[2]);
  const std::string source = argv[3];
  const std::string out_path = argc > 4 ? argv[4] : "";

  void* handle = nullptr;
  if (Hydranet_Init(&handle, artifact_dir.c_str()) != 0) return 2;

  auto* output = new HN_Output();

  if (mode == 1) {
    cv::Mat img = cv::imread(source);
    if (img.empty()) {
      fprintf(stderr, "cannot read %s\n", source.c_str());
      return 3;
    }
    std::vector<unsigned char> visual((size_t)img.rows * img.cols * 3);
    const int kWarmup = 10, kIters = 20;  // reference Demo.cpp:27-28
    for (int i = 0; i < kWarmup; ++i) {
      Hydranet_Detect(handle, img.data, img.rows, img.cols, output,
                      nullptr);
    }
    double total = 0;
    for (int i = 0; i < kIters; ++i) {
      double t0 = NowMs();
      Hydranet_Detect(handle, img.data, img.rows, img.cols, output,
                      visual.data());
      total += NowMs() - t0;
      PrintStages(*output);
    }
    printf("average latency over %d iters: %.2f ms\n", kIters,
           total / kIters);

    // pipelined path: staging frame k+1 (resize + convert + async H2D)
    // overlaps the device executing frame k
    for (int i = 0; i < kWarmup; ++i) {
      Hydranet_Detect_Pipelined(handle, img.data, img.rows, img.cols, output,
                                nullptr);
    }
    {
      HN_Output drain;
      Hydranet_Flush(handle, &drain, nullptr);
    }
    int results = 0;
    double t0 = NowMs();
    for (int i = 0; i < kIters; ++i) {
      if (Hydranet_Detect_Pipelined(handle, img.data, img.rows, img.cols,
                                    output, nullptr) == 1) {
        ++results;
      }
    }
    if (Hydranet_Flush(handle, output, nullptr) == 1) ++results;
    double ptotal = NowMs() - t0;
    printf("pipelined average over %d frames: %.2f ms\n", results,
           ptotal / results);

    if (!out_path.empty()) {
      cv::Mat vis(img.rows, img.cols, CV_8UC3, visual.data());
      cv::imwrite(out_path, vis);
      printf("wrote %s\n", out_path.c_str());
    }
  } else if (mode == 4) {
    cv::Mat img = cv::imread(source);
    if (img.empty()) {
      fprintf(stderr, "cannot read %s\n", source.c_str());
      return 3;
    }
    const int n = Hydranet_BatchSize(handle);
    printf("batched mode: artifact batch %d, frame %dx%d\n", n, img.cols,
           img.rows);
    const size_t frame_bytes = (size_t)img.rows * img.cols * 3;
    std::vector<unsigned char> frames(frame_bytes * n);
    for (int b = 0; b < n; ++b) {
      std::memcpy(frames.data() + b * frame_bytes, img.data, frame_bytes);
    }
    std::vector<HN_Output> outs(n);
    const int kWarmup = 10, kIters = 20;  // reference Demo.cpp:27-28
    for (int i = 0; i < kWarmup; ++i) {
      if (Hydranet_Detect_Batched(handle, frames.data(), n, img.rows,
                                  img.cols, outs.data()) != 0) {
        return 4;
      }
    }
    double total = 0, pre = 0, run = 0, post = 0;
    for (int i = 0; i < kIters; ++i) {
      double t0 = NowMs();
      Hydranet_Detect_Batched(handle, frames.data(), n, img.rows, img.cols,
                              outs.data());
      total += NowMs() - t0;
      pre += outs[0].preprocess_ms;
      run += outs[0].run_ms;
      post += outs[0].postprocess_ms;
      PrintStages(outs[0]);
    }
    printf("batched avg over %d iters x %d frames: %.2f ms/batch = "
           "%.2f ms/frame (%.1f frames/sec)\n",
           kIters, n, total / kIters, total / kIters / n,
           1000.0 * n / (total / kIters));
    printf("stage avg: preprocess %.2f | run %.2f | postprocess %.2f "
           "ms/batch\n", pre / kIters, run / kIters, post / kIters);
  } else {
    cv::VideoCapture cap;
    if (mode == 3) {
      cap.open(atoi(source.c_str()));
    } else {
      cap.open(source);
    }
    if (!cap.isOpened()) {
      fprintf(stderr, "cannot open %s\n", source.c_str());
      return 3;
    }
    // pipelined streaming: stage frame k+1 while the device executes k
    // (results arrive with one-frame latency; the tail is flushed).
    cv::VideoWriter writer;
    cv::Mat frame;
    std::vector<unsigned char> visual;
    double total = 0;
    int frames = 0, results = 0;
    auto emit = [&](const cv::Mat& size_ref) {
      ++results;
      if (!out_path.empty()) {
        if (!writer.isOpened()) {
          writer.open(out_path, cv::VideoWriter::fourcc('m', 'p', '4', 'v'),
                      10, size_ref.size());
        }
        cv::Mat vis(size_ref.rows, size_ref.cols, CV_8UC3, visual.data());
        writer.write(vis);
      }
    };
    double t_start = NowMs();
    cv::Mat last_good;
    while (cap.read(frame) && !frame.empty()) {
      visual.resize((size_t)frame.rows * frame.cols * 3);
      int rc = Hydranet_Detect_Pipelined(handle, frame.data, frame.rows,
                                         frame.cols, output, visual.data());
      if (rc < 0) break;
      ++frames;
      last_good = frame;
      if (rc == 1) emit(frame);
      if (frames % 20 == 0) {
        printf("frame %d: running average %.2f ms\n", frames,
               (NowMs() - t_start) / frames);
      }
    }
    if (frames > 0 && !last_good.empty() &&
        Hydranet_Flush(handle, output, visual.data()) == 1) {
      emit(last_good);
    }
    total = NowMs() - t_start;
    if (results > 0) {
      printf("processed %d frames, average %.2f ms (pipelined)\n", results,
             total / results);
    }
  }

  delete output;
  Hydranet_Uinit(handle);
  return 0;
}
