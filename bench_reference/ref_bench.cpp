// Headless timing driver for the reference implementation's hot paths:
// dense RGB-D odometry (Odometry::DenseTracking) and TSDF integration +
// marching cubes (CubeHandler). Reads the synthetic TUM-format dataset
// produced by tools/make_synthetic_dataset.py and prints frames/s numbers
// that BASELINE_MEASURED.json records for bench.py's vs_baseline.
//
// This file only CALLS the reference library (mirroring the call stacks of
// example/DenseOdometry.cpp and example/ImageSequenceIntegration.cpp); all
// measured code is the reference's own.

#include <chrono>
#include <cstdio>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include <cmath>

#include "Camera/Camera.h"
#include "Geometry/RGBDFrame.h"
#include "Integration/CubeHandler.h"
#include "Odometry/Odometry.h"

using namespace one_piece;

static std::vector<std::pair<std::string, std::string>> ReadPairs(
    const std::string &root, int max_frames) {
  std::ifstream rgb(root + "/rgb.txt"), depth(root + "/depth.txt");
  std::vector<std::string> rgbs, depths;
  std::string line;
  while (std::getline(rgb, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string ts, fn;
    ss >> ts >> fn;
    rgbs.push_back(root + "/" + fn);
  }
  while (std::getline(depth, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string ts, fn;
    ss >> ts >> fn;
    depths.push_back(root + "/" + fn);
  }
  std::vector<std::pair<std::string, std::string>> out;
  for (size_t i = 0; i < rgbs.size() && i < depths.size(); ++i) {
    if (max_frames > 0 && (int)out.size() >= max_frames) break;
    out.emplace_back(rgbs[i], depths[i]);
  }
  return out;
}

int main(int argc, char **argv) {
  std::string root = argc > 1 ? argv[1] : "../data/synth_tum";
  int max_frames = argc > 2 ? atoi(argv[2]) : 30;

  camera::PinholeCamera cam;
  cam.SetCameraType(camera::CameraType::TUM_DATASET);

  auto pairs = ReadPairs(root, max_frames);
  printf("frames: %zu\n", pairs.size());
  if (pairs.size() < 2) return 1;

  std::vector<geometry::RGBDFrame> frames;
  for (auto &p : pairs) {
    cv::Mat rgb = cv::imread(p.first, cv::IMREAD_COLOR);
    cv::Mat depth = cv::imread(p.second, cv::IMREAD_UNCHANGED);
    frames.emplace_back(geometry::RGBDFrame(rgb, depth, (int)frames.size()));
  }

  odometry::Odometry odom(cam);

  // --- dense odometry frame-to-frame (ref example/DenseOdometry.cpp) ---
  double tracking_s = 0.0;
  int tracked = 0;
  for (size_t i = 1; i < frames.size(); ++i) {
    geometry::TransformationMatrix T =
        geometry::TransformationMatrix::Identity();
    auto t0 = std::chrono::steady_clock::now();
    auto result = odom.DenseTracking(frames[i - 1], frames[i], T, 0 /*hybrid*/);
    auto t1 = std::chrono::steady_clock::now();
    tracking_s += std::chrono::duration<double>(t1 - t0).count();
    tracked++;
    if (i == 1)
      printf("first pair rmse %f tracking_success %d\n", result->rmse,
             (int)result->tracking_success);
  }
  printf("dense_odometry_fps_cpu: %.3f\n", tracked / tracking_s);

  // chain relative poses into a trajectory for ATE evaluation
  {
    std::vector<Eigen::Matrix4f> traj;
    traj.push_back(Eigen::Matrix4f::Identity());
    for (size_t i = 1; i < frames.size(); ++i) {
      geometry::TransformationMatrix T =
          geometry::TransformationMatrix::Identity();
      auto r = odom.DenseTracking(frames[i - 1], frames[i], T, 0);
      Eigen::Matrix4f rel = r->T.cast<float>();
      traj.push_back(traj.back() * rel.inverse());
    }
    std::ofstream ofs(root + "/ref_trajectory.txt");
    for (auto &T : traj) {
      for (int k = 0; k < 16; ++k) ofs << T(k / 4, k % 4) << (k == 15 ? "\n" : " ");
    }
    printf("wrote %s/ref_trajectory.txt\n", root.c_str());
  }

  // read GT poses (TUM format) for a realistic integration workload
  std::vector<Eigen::Matrix4f> gt;
  {
    std::ifstream gtf(root + "/groundtruth.txt");
    std::string line;
    while (std::getline(gtf, line)) {
      if (line.empty() || line[0] == '#') continue;
      std::istringstream ss(line);
      double ts, tx, ty, tz, qx, qy, qz, qw;
      ss >> ts >> tx >> ty >> tz >> qx >> qy >> qz >> qw;
      Eigen::Quaternionf q(qw, qx, qy, qz);
      Eigen::Matrix4f T = Eigen::Matrix4f::Identity();
      T.block<3, 3>(0, 0) = q.toRotationMatrix();
      T(0, 3) = tx; T(1, 3) = ty; T(2, 3) = tz;
      gt.push_back(T);
    }
  }

  // --- TSDF integration at GT poses (ref ImageSequenceIntegration) ---
  integration::CubeHandler cube_handler(cam);
  cube_handler.SetTruncation(0.1);
  double integ_s = 0.0;
  int integrated = 0;
  for (size_t i = 0; i < frames.size(); i += 1) {
    cv::Mat rgb = cv::imread(pairs[i].first, cv::IMREAD_COLOR);
    cv::Mat depth = cv::imread(pairs[i].second, cv::IMREAD_UNCHANGED);
    cv::Mat depth32f, refined;
    tool::ConvertDepthTo32F(depth, depth32f, cam.GetDepthScale());
    tool::BilateralFilter(depth32f, refined);
    geometry::TransformationMatrix pose =
        i < gt.size() ? geometry::TransformationMatrix(gt[i].cast<geometry::scalar>())
                      : geometry::TransformationMatrix::Identity();
    auto t0 = std::chrono::steady_clock::now();
    cube_handler.IntegrateImage(refined, rgb, pose);
    auto t1 = std::chrono::steady_clock::now();
    integ_s += std::chrono::duration<double>(t1 - t0).count();
    integrated++;
  }
  printf("tsdf_integrate_fps_cpu: %.3f (cubes %d)\n", integrated / integ_s,
         (int)0);

  auto t0 = std::chrono::steady_clock::now();
  geometry::TriangleMesh mesh;
  cube_handler.ExtractTriangleMesh(mesh);
  auto t1 = std::chrono::steady_clock::now();
  printf("marching_cubes_s_cpu: %.3f (tris %zu)\n",
         std::chrono::duration<double>(t1 - t0).count(),
         mesh.triangles.size());
  return 0;
}
