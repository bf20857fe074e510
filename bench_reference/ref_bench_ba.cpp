// Headless timing driver for the reference's FULL-BA sparse SLAM stack
// (BASELINE.md config 4): BASlam = ORB + MILD sparse VO vs last keyframe,
// MILD loop-closure candidates, world-point track linking, and one final
// full bundle adjustment with the Schur complement — the exact protocol of
// example/BAFusion/BAFusion.cpp:38-66 (UpdateFrame loop, then Optimize +
// UpdateAllPoses once at the end). All measured code is the reference's
// own; this file only drives it headless.

#include <chrono>
#include <cstdio>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "BASlam.h"

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

  BASlam slam(cam);
  double update_s = 0.0;
  int processed = 0;
  for (size_t i = 0; i < rgbs.size(); ++i) {
    cv::Mat rgb = cv::imread(rgbs[i], cv::IMREAD_COLOR);
    cv::Mat depth = cv::imread(depths[i], cv::IMREAD_UNCHANGED);
    geometry::RGBDFrame frame(rgb, depth);
    auto t0 = std::chrono::steady_clock::now();
    slam.UpdateFrame(frame);
    auto t1 = std::chrono::steady_clock::now();
    update_s += std::chrono::duration<double>(t1 - t0).count();
    processed++;
  }
  auto t0 = std::chrono::steady_clock::now();
  slam.Optimize();
  slam.UpdateAllPoses();
  auto t1 = std::chrono::steady_clock::now();
  double opt_s = std::chrono::duration<double>(t1 - t0).count();

  printf("ba_update_fps_cpu: %.3f\n", processed / update_s);
  printf("ba_optimize_s_cpu: %.4f\n", opt_s);
  printf("ba_total_fps_cpu: %.3f (keyframes %zu, world points %zu)\n",
         processed / (update_s + opt_s), slam.keyframe_ids.size(),
         slam.world_points.size());

  std::ofstream ofs(root + "/ref_ba_trajectory.txt");
  for (auto &T : slam.global_poses) {
    for (int k = 0; k < 16; ++k)
      ofs << T(k / 4, k % 4) << (k == 15 ? "\n" : " ");
  }
  printf("wrote %s/ref_ba_trajectory.txt\n", root.c_str());
  return 0;
}
