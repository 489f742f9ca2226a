/* Minimal PNG decoder for the streaming data path.
 *
 * The serving pipeline's host-side decode stage (the reference does this
 * through PIL, reference io/flo_io.py:84-96): benchmark and video loaders
 * decode thousands of frames while the device computes, so decode runs on
 * background threads (io/loader.py) and this implementation decodes a whole
 * file into a caller-provided numpy buffer in one pass — single buffered
 * read, streaming zlib inflate over the IDAT chunks, scanline unfilter,
 * no intermediate Python objects.  Exposed via ctypes (no pybind11 in the
 * image); PIL remains the portable fallback (io/png.py).
 *
 * Supports the PNG subset that image datasets actually use: 8-bit depth,
 * color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
 * non-interlaced.  Anything else returns -3 and the caller falls back.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

static uint32_t be32(const uint8_t *p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return (uint8_t)a;
  if (pb <= pc) return (uint8_t)b;
  return (uint8_t)c;
}

/* Decode `path` into `out` (row-major H x W x channels uint8).
 *
 * Two-call pattern: with cap==0 only the header is parsed and *w/*h/
 * *channels are filled (channels AFTER palette expansion).  Returns 0 on
 * success; -1 I/O, -2 malformed, -3 unsupported format (caller should fall
 * back), -4 buffer too small, -5 inflate error, -6 bad filter type. */
int png_decode_file(const char *path, uint8_t *out, int64_t cap,
                    int32_t *w, int32_t *h, int32_t *channels) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
  long fsize = ftell(f);
  if (fsize < 45 || fseek(f, 0, SEEK_SET) != 0) { fclose(f); return -2; }
  uint8_t *buf = (uint8_t *)malloc((size_t)fsize);
  if (!buf) { fclose(f); return -1; }
  if (fread(buf, 1, (size_t)fsize, f) != (size_t)fsize) {
    free(buf); fclose(f); return -1;
  }
  fclose(f);

  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (memcmp(buf, sig, 8) != 0) { free(buf); return -2; }

  /* IHDR must be the first chunk */
  if (be32(buf + 8) != 13 || memcmp(buf + 12, "IHDR", 4) != 0) {
    free(buf); return -2;
  }
  uint32_t W = be32(buf + 16), H = be32(buf + 20);
  uint8_t depth = buf[24], ctype = buf[25], interlace = buf[28];
  if (W == 0 || H == 0 || W > (1u << 24) || H > (1u << 24)) {
    free(buf); return -2;
  }
  int src_bpp, out_ch;
  switch (ctype) {
    case 0: src_bpp = 1; out_ch = 1; break;  /* gray */
    case 2: src_bpp = 3; out_ch = 3; break;  /* RGB */
    case 3: src_bpp = 1; out_ch = 3; break;  /* palette -> RGB */
    case 4: src_bpp = 2; out_ch = 2; break;  /* gray + alpha */
    case 6: src_bpp = 4; out_ch = 4; break;  /* RGBA */
    default: free(buf); return -3;
  }
  if (depth != 8 || interlace != 0) { free(buf); return -3; }
  *w = (int32_t)W;
  *h = (int32_t)H;
  *channels = out_ch;
  if (cap == 0) { free(buf); return 0; }  /* dimension query */
  int64_t need = (int64_t)W * H * out_ch;
  if (cap < need) { free(buf); return -4; }

  /* raw (filtered) image: one filter byte + W*src_bpp per scanline */
  size_t stride = (size_t)W * src_bpp;
  size_t rawsize = (size_t)H * (stride + 1);
  if (rawsize > (size_t)1 << 31) { free(buf); return -3; } /* zlib uInt limit */
  uint8_t *raw = (uint8_t *)malloc(rawsize);
  if (!raw) { free(buf); return -1; }

  const uint8_t *palette = NULL;
  uint32_t palette_len = 0;

  /* streaming inflate over the IDAT chunks */
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) { free(raw); free(buf); return -5; }
  zs.next_out = raw;
  zs.avail_out = (uInt)rawsize;

  int zdone = 0;
  long pos = 8;
  while (pos + 12 <= fsize) {
    uint32_t len = be32(buf + pos);
    const uint8_t *type = buf + pos + 4;
    const uint8_t *data = buf + pos + 8;
    if ((long)(pos + 12 + (long)len) > fsize) break;
    if (memcmp(type, "PLTE", 4) == 0) {
      palette = data;
      palette_len = len / 3;
    } else if (memcmp(type, "IDAT", 4) == 0 && !zdone) {
      zs.next_in = (Bytef *)data;
      zs.avail_in = (uInt)len;
      int zrc = inflate(&zs, Z_NO_FLUSH);
      if (zrc == Z_STREAM_END) zdone = 1;
      else if (zrc != Z_OK && zrc != Z_BUF_ERROR) {
        inflateEnd(&zs); free(raw); free(buf); return -5;
      }
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + (long)len;
  }
  int filled = zs.total_out == rawsize;
  inflateEnd(&zs);
  if (!filled) { free(raw); free(buf); return -5; }
  if (ctype == 3 && palette == NULL) { free(raw); free(buf); return -2; }

  /* unfilter scanlines in place (prev row already unfiltered) */
  for (uint32_t y = 0; y < H; y++) {
    uint8_t *row = raw + y * (stride + 1);
    uint8_t ft = row[0];
    uint8_t *cur = row + 1;
    const uint8_t *up = y ? raw + (y - 1) * (stride + 1) + 1 : NULL;
    switch (ft) {
      case 0:
        break;
      case 1: /* Sub */
        for (size_t i = src_bpp; i < stride; i++) cur[i] += cur[i - src_bpp];
        break;
      case 2: /* Up */
        if (up)
          for (size_t i = 0; i < stride; i++) cur[i] += up[i];
        break;
      case 3: /* Average */
        for (size_t i = 0; i < stride; i++) {
          int a = i >= (size_t)src_bpp ? cur[i - src_bpp] : 0;
          int b = up ? up[i] : 0;
          cur[i] += (uint8_t)((a + b) >> 1);
        }
        break;
      case 4: /* Paeth */
        for (size_t i = 0; i < stride; i++) {
          int a = i >= (size_t)src_bpp ? cur[i - src_bpp] : 0;
          int b = up ? up[i] : 0;
          int c = (up && i >= (size_t)src_bpp) ? up[i - src_bpp] : 0;
          cur[i] += paeth(a, b, c);
        }
        break;
      default:
        free(raw); free(buf); return -6;
    }
  }

  /* emit rows (palette indices expand to RGB) */
  if (ctype == 3) {
    for (uint32_t y = 0; y < H; y++) {
      const uint8_t *cur = raw + y * (stride + 1) + 1;
      uint8_t *dst = out + (size_t)y * W * 3;
      for (uint32_t x = 0; x < W; x++) {
        uint8_t idx = cur[x];
        if (idx >= palette_len) { free(raw); free(buf); return -2; }
        memcpy(dst + (size_t)x * 3, palette + (size_t)idx * 3, 3);
      }
    }
  } else {
    for (uint32_t y = 0; y < H; y++)
      memcpy(out + (size_t)y * stride, raw + y * (stride + 1) + 1, stride);
  }
  free(raw);
  free(buf);
  return 0;
}
