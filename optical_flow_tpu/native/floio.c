/* Fast Middlebury .flo reader/writer.
 *
 * The serving-side data path: benchmark/video pipelines read thousands of
 * .flo ground-truth files and write estimated flows back out.  This C
 * implementation reads a whole file with a single buffered read and
 * validates the header without any Python-level parsing; it is exposed to
 * Python via ctypes (no pybind11 in the image), with the numpy path as a
 * portable fallback (optical_flow_tpu/io/flo.py).
 *
 * Format (reference io/flo_io.py:1-11): float32 magic 202021.25,
 * int32 width, int32 height, then h*w*2 float32 (row-major, u/v
 * interleaved).
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define FLO_MAGIC 202021.25f

/* Returns 0 on success; fills *w/*h; caller provides `data` buffer of
 * capacity cap_floats (set cap_floats=0 to only query dimensions). */
int flo_read(const char *path, int32_t *w, int32_t *h, float *data,
             int64_t cap_floats) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;

  float magic;
  if (fread(&magic, sizeof(float), 1, f) != 1 || magic != FLO_MAGIC) {
    fclose(f);
    return -2;
  }
  if (fread(w, sizeof(int32_t), 1, f) != 1 ||
      fread(h, sizeof(int32_t), 1, f) != 1) {
    fclose(f);
    return -3;
  }
  if (*w <= 0 || *h <= 0 || *w > 1 << 20 || *h > 1 << 20) {
    fclose(f);
    return -4;
  }
  int64_t n = (int64_t)(*w) * (*h) * 2;
  if (cap_floats == 0) { /* dimension query */
    fclose(f);
    return 0;
  }
  if (cap_floats < n) {
    fclose(f);
    return -5;
  }
  int64_t got = (int64_t)fread(data, sizeof(float), (size_t)n, f);
  fclose(f);
  return got == n ? 0 : -6;
}

int flo_write(const char *path, int32_t w, int32_t h, const float *data) {
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  float magic = FLO_MAGIC;
  int64_t n = (int64_t)w * h * 2;
  int ok = fwrite(&magic, sizeof(float), 1, f) == 1 &&
           fwrite(&w, sizeof(int32_t), 1, f) == 1 &&
           fwrite(&h, sizeof(int32_t), 1, f) == 1 &&
           (int64_t)fwrite(data, sizeof(float), (size_t)n, f) == n;
  fclose(f);
  return ok ? 0 : -2;
}
