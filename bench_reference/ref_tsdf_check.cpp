// Cross-validation of io/ref_tsdf.py against the reference's OWN reader:
// loads a cube file with CubeHandler::ReadFromFile and prints the cube
// count plus content checksums (sums of sdf/weight/color over non-empty
// voxels and of cube-id coordinates), which tests/test_ref_tsdf.py and
// tools/check_ref_tsdf_interop.py compare with the Python writer's
// ground truth. Round-trips the volume back out through WriteToFile so
// the reference WRITER is exercised too (Python then re-reads it).
//
// Usage: ref_tsdf_check <in.cube> <out.cube>
#include <cstdio>
#include <string>
#include "Integration/CubeHandler.h"

using namespace one_piece;

// cube_map is protected in the reference; re-expose it for the checksum
struct OpenHandler : integration::CubeHandler {
  using integration::CubeHandler::cube_map;
};

int main(int argc, char **argv) {
  if (argc < 3) {
    std::printf("usage: ref_tsdf_check <in.cube> <out.cube>\n");
    return 2;
  }
  OpenHandler handler;
  if (!handler.ReadFromFile(argv[1])) {
    std::printf("READ FAILED\n");
    return 1;
  }
  double sum_sdf = 0.0, sum_w = 0.0, sum_c = 0.0;
  long sum_id = 0, n_vox = 0;
  for (auto it = handler.cube_map.begin(); it != handler.cube_map.end(); ++it) {
    sum_id += it->first(0) + it->first(1) + it->first(2);
    const auto &vox = it->second.voxels;
    for (size_t i = 0; i < vox.size(); ++i) {
      if (vox[i].weight != 0 && std::fabs(vox[i].sdf) < 1.0f) {
        sum_sdf += vox[i].sdf;
        sum_w += vox[i].weight;
        sum_c += vox[i].color(0) + vox[i].color(1) + vox[i].color(2);
        ++n_vox;
      }
    }
  }
  std::printf("cubes %zu voxels %ld id_sum %ld sdf_sum %.6f w_sum %.6f c_sum %.6f\n",
              handler.cube_map.size(), n_vox, sum_id, sum_sdf, sum_w, sum_c);
  handler.WriteToFile(argv[2]);
  return 0;
}
