/* Test-only interop harness against the system libjpeg(-turbo):
 * encodes PGM/PPM to an ARITHMETIC-coded JPEG and decodes any JPEG
 * back to PGM/PPM.  Used by tests/test_multimodal.py to prove the
 * from-scratch QM-coder in deeplake_spark/operators/_jpeg.py
 * interoperates with a real third-party implementation (both
 * directions).  Compiled on demand by the test suite when gcc and
 * jpeglib.h are present; never shipped in the engine's runtime path.
 *
 *   jpegarith enc <in.pgm|in.ppm> <out.jpg> <quality> <progressive 0|1>
 *   jpegarith dec <in.jpg> <out.pgm|out.ppm>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_pnm(const char *path, int *w, int *h, int *ch) {
  FILE *f = fopen(path, "rb");
  if (!f) { perror("open"); exit(2); }
  char magic[3] = {0};
  int maxv;
  if (fscanf(f, "%2s", magic) != 1) exit(2);
  *ch = strcmp(magic, "P6") == 0 ? 3 : 1;
  if (fscanf(f, "%d %d %d", w, h, &maxv) != 3) exit(2);
  fgetc(f); /* single whitespace after header */
  size_t n = (size_t)(*w) * (*h) * (*ch);
  unsigned char *buf = malloc(n);
  if (fread(buf, 1, n, f) != n) exit(2);
  fclose(f);
  return buf;
}

static void enc(const char *in, const char *out, int quality, int prog) {
  int w, h, ch;
  unsigned char *img = read_pnm(in, &w, &h, &ch);
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  FILE *f = fopen(out, "wb");
  if (!f) { perror("open out"); exit(2); }
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ch;
  cinfo.in_color_space = ch == 3 ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = TRUE; /* the point of this harness */
  if (prog)
    jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = img + (size_t)cinfo.next_scanline * w * ch;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  free(img);
}

static void dec(const char *in, const char *out) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  FILE *f = fopen(in, "rb");
  if (!f) { perror("open"); exit(2); }
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  int ch = cinfo.output_components;
  unsigned char *img = malloc((size_t)w * h * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = img + (size_t)cinfo.output_scanline * w * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  FILE *o = fopen(out, "wb");
  fprintf(o, "%s\n%d %d\n255\n", ch == 3 ? "P6" : "P5", w, h);
  fwrite(img, 1, (size_t)w * h * ch, o);
  fclose(o);
  free(img);
}

/* Dump the quantized DCT coefficients of a JPEG as text:
 * one line per block: comp by bx then 64 zigzag-ORDER? no — libjpeg
 * stores blocks in NATURAL order [64] per JCOEF array in raster scan
 * of the component's block grid.  Lines: "comp by bx v0 .. v63"
 * (natural/raster coefficient order as stored). */
static void coef(const char *in) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  FILE *f = fopen(in, "rb");
  if (!f) { perror("open"); exit(2); }
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *arrays = jpeg_read_coefficients(&cinfo);
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    for (JDIMENSION by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, arrays[ci], by, 1, FALSE);
      for (JDIMENSION bx = 0; bx < comp->width_in_blocks; bx++) {
        printf("%d %u %u", ci, by, bx);
        for (int k = 0; k < DCTSIZE2; k++)
          printf(" %d", rows[0][bx][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
}

int main(int argc, char **argv) {
  if (argc >= 2 && strcmp(argv[1], "enc") == 0 && argc == 6)
    enc(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]));
  else if (argc >= 2 && strcmp(argv[1], "dec") == 0 && argc == 4)
    dec(argv[2], argv[3]);
  else if (argc >= 2 && strcmp(argv[1], "coef") == 0 && argc == 3)
    coef(argv[2]);
  else {
    fprintf(stderr, "usage: jpegarith enc in.pnm out.jpg Q prog01 | "
                    "jpegarith dec in.jpg out.pnm\n");
    return 1;
  }
  return 0;
}
