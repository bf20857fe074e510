// Force-included compatibility header: the reference targets OpenCV 2/3
// legacy names; this environment has OpenCV 4.6.
#pragma once
#include <opencv2/opencv.hpp>
#include <opencv2/imgproc/types_c.h>
#ifndef CV_FM_RANSAC
#define CV_FM_RANSAC cv::FM_RANSAC
#endif
