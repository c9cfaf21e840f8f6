// Fast mesh export: VTK polydata and Wavefront OBJ.
//
// Native equivalent of the reference's writers (writeVtkMesh,
// se_denseslam/include/se/commons.h:325; writeObjMesh, :393), used by the
// offline dump_mesh path where Python string formatting of millions of
// triangles is the bottleneck.

#include <cstdio>
#include <cstdint>

extern "C" {

// tris: n * 9 floats (triangle-major, vertex-major, xyz)
int se_write_vtk(const char* path, const float* tris, int64_t n) {
  FILE* f = fopen(path, "w");
  if (!f) return -1;
  fprintf(f, "# vtk DataFile Version 1.0\n");
  fprintf(f, "vtk mesh generated from supereight-tpu\nASCII\n");
  fprintf(f, "DATASET POLYDATA\n");
  fprintf(f, "POINTS %lld FLOAT\n", static_cast<long long>(3 * n));
  for (int64_t i = 0; i < 3 * n; ++i) {
    const float* v = tris + 3 * i;
    fprintf(f, "%g %g %g\n", v[0], v[1], v[2]);
  }
  fprintf(f, "POLYGONS %lld %lld\n", static_cast<long long>(n),
          static_cast<long long>(4 * n));
  for (int64_t i = 0; i < n; ++i) {
    fprintf(f, "3 %lld %lld %lld\n", static_cast<long long>(3 * i),
            static_cast<long long>(3 * i + 1),
            static_cast<long long>(3 * i + 2));
  }
  fclose(f);
  return 0;
}

int se_write_obj(const char* path, const float* tris, int64_t n) {
  FILE* f = fopen(path, "w");
  if (!f) return -1;
  fprintf(f, "# OBJ mesh generated from supereight-tpu\n");
  for (int64_t i = 0; i < 3 * n; ++i) {
    const float* v = tris + 3 * i;
    fprintf(f, "v %g %g %g\n", v[0], v[1], v[2]);
  }
  for (int64_t i = 0; i < n; ++i) {
    fprintf(f, "f %lld %lld %lld\n", static_cast<long long>(3 * i + 1),
            static_cast<long long>(3 * i + 2),
            static_cast<long long>(3 * i + 3));
  }
  fclose(f);
  return 0;
}

}  // extern "C"
