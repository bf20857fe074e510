// Headless timing driver for the reference's SPARSE keyframe SLAM stack
// (BASELINE.md configs 3/4): FBASlam = ORB + MILD sparse VO vs last
// keyframe, MILD loop-closure candidates, SimpleBA pose graph — the exact
// per-frame loop of example/FBAFusion/FBAFusion.cpp:38-47. All measured
// code is the reference's own; this file only drives it.

#include <chrono>
#include <cstdio>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "FBASlam.h"

using namespace one_piece;

static void ReadPairs(const std::string &root, int max_frames,
                      std::vector<std::string> &rgbs,
                      std::vector<std::string> &depths) {
  std::ifstream rgb(root + "/rgb.txt"), depth(root + "/depth.txt");
  std::string line;
  while (std::getline(rgb, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string ts, fn;
    ss >> ts >> fn;
    rgbs.push_back(root + "/" + fn);
    if (max_frames > 0 && (int)rgbs.size() >= max_frames) break;
  }
  while (std::getline(depth, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string ts, fn;
    ss >> ts >> fn;
    depths.push_back(root + "/" + fn);
    if ((int)depths.size() >= (int)rgbs.size()) break;
  }
}

int main(int argc, char **argv) {
  std::string root = argc > 1 ? argv[1] : "../data/synth_tum";
  int max_frames = argc > 2 ? atoi(argv[2]) : 30;

  camera::PinholeCamera cam;
  cam.SetCameraType(camera::CameraType::TUM_DATASET);

  std::vector<std::string> rgbs, depths;
  ReadPairs(root, max_frames, rgbs, depths);
  printf("frames: %zu\n", rgbs.size());
  if (rgbs.size() < 2) return 1;

  FBASlam slam(cam);
  double total_s = 0.0;
  int processed = 0;
  for (size_t i = 0; i < rgbs.size(); ++i) {
    cv::Mat rgb = cv::imread(rgbs[i], cv::IMREAD_COLOR);
    cv::Mat depth = cv::imread(depths[i], cv::IMREAD_UNCHANGED);
    geometry::RGBDFrame frame(rgb, depth);
    auto t0 = std::chrono::steady_clock::now();
    slam.UpdateFrame(frame);
    auto t1 = std::chrono::steady_clock::now();
    total_s += std::chrono::duration<double>(t1 - t0).count();
    processed++;
  }
  slam.UpdateAllPoses();
  printf("sparse_fba_fps_cpu: %.3f (keyframes %zu)\n", processed / total_s,
         slam.keyframe_ids.size());

  std::ofstream ofs(root + "/ref_sparse_trajectory.txt");
  for (auto &T : slam.global_poses) {
    for (int k = 0; k < 16; ++k)
      ofs << T(k / 4, k % 4) << (k == 15 ? "\n" : " ");
  }
  printf("wrote %s/ref_sparse_trajectory.txt\n", root.c_str());
  return 0;
}
