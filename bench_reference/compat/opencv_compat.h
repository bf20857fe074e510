// Force-included compatibility header: the reference targets OpenCV 2/3
// legacy names; this environment has OpenCV 4.6.
#pragma once
#include <opencv2/opencv.hpp>
#include <opencv2/imgproc/types_c.h>
#ifndef CV_FM_RANSAC
#define CV_FM_RANSAC cv::FM_RANSAC
#endif

// The reference compiles with DEBUG_MODE 1 (Geometry.h:18), which pops
// blocking cv::imshow/cv::waitKey windows inside the SPARSE tracking path
// (Odometry.cpp:122-156). This environment is headless; route them to
// no-ops so the sparse benchmark can run the reference's own code.
namespace cv {
static inline void bench_imshow_noop(const String &, InputArray) {}
static inline int bench_waitkey_noop(int = 0) { return -1; }
}  // namespace cv
#define imshow bench_imshow_noop
#define waitKey bench_waitkey_noop
