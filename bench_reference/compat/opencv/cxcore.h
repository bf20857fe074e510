#pragma once
#include "../opencv_compat.h"
