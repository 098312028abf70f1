/* Test-only probe: encode raw PGM/PPM pixels to JPEG via the system
 * libjpeg with a chosen entropy coder (Huffman or arithmetic), optional
 * progressive mode and restart interval.  Used by tests/test_jpeg_arith.py
 * to cross-validate the pure-Python arithmetic (QM-coder) decode path:
 * the same pixels encoded both ways must decode identically through the
 * repo's decoder, because entropy coding is lossless over the quantized
 * coefficients.
 *
 * Usage: probe_jpegarith enc <in.pnm> <out.jpg> <quality> <arith 0|1>
 *                            <progressive 0|1> <restart_interval> [subsamp]
 *        probe_jpegarith dec <in.jpg> <out.pnm>
 * subsamp (optional, default 1): 1 = libjpeg default 4:2:0, 0 = 4:4:4.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static int read_token(FILE *f) {
  int c, v = 0;
  do {
    c = getc(f);
    if (c == '#')
      while (c != '\n' && c != EOF) c = getc(f);
  } while (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '#');
  while (c >= '0' && c <= '9') { v = v * 10 + (c - '0'); c = getc(f); }
  return v;
}

int main(int argc, char **argv) {
  if (argc < 2) return 2;
  if (!strcmp(argv[1], "enc")) {
    if (argc != 8 && argc != 9) return 2;
    FILE *in = fopen(argv[2], "rb");
    if (!in) return 3;
    int magic0 = getc(in), magic1 = getc(in);
    if (magic0 != 'P' || (magic1 != '5' && magic1 != '6')) return 4;
    int ncomp = (magic1 == '6') ? 3 : 1;
    int w = read_token(in), h = read_token(in), maxval = read_token(in);
    if (maxval != 255 || w <= 0 || h <= 0) return 5;
    unsigned char *pix = malloc((size_t)w * h * ncomp);
    if (fread(pix, 1, (size_t)w * h * ncomp, in) != (size_t)w * h * ncomp)
      return 6;
    fclose(in);

    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    FILE *out = fopen(argv[3], "wb");
    if (!out) return 7;
    jpeg_stdio_dest(&cinfo, out);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ncomp;
    cinfo.in_color_space = ncomp == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, atoi(argv[4]), TRUE);
    cinfo.arith_code = atoi(argv[5]) ? TRUE : FALSE;
    if (argc == 9 && !atoi(argv[8])) { /* 4:4:4 */
      int ci;
      for (ci = 0; ci < cinfo.num_components; ci++) {
        cinfo.comp_info[ci].h_samp_factor = 1;
        cinfo.comp_info[ci].v_samp_factor = 1;
      }
    }
    if (atoi(argv[6])) jpeg_simple_progression(&cinfo);
    cinfo.restart_interval = atoi(argv[7]);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = pix + (size_t)cinfo.next_scanline * w * ncomp;
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(out);
    free(pix);
    return 0;
  }
  if (!strcmp(argv[1], "dec")) {
    if (argc != 4) return 2;
    FILE *in = fopen(argv[2], "rb");
    if (!in) return 3;
    struct jpeg_decompress_struct dinfo;
    struct jpeg_error_mgr jerr;
    dinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&dinfo);
    jpeg_stdio_src(&dinfo, in);
    jpeg_read_header(&dinfo, TRUE);
    jpeg_start_decompress(&dinfo);
    int w = dinfo.output_width, h = dinfo.output_height,
        nc = dinfo.output_components;
    FILE *out = fopen(argv[3], "wb");
    fprintf(out, "P%c\n%d %d\n255\n", nc == 3 ? '6' : '5', w, h);
    unsigned char *row = malloc((size_t)w * nc);
    while ((int)dinfo.output_scanline < h) {
      JSAMPROW r = row;
      jpeg_read_scanlines(&dinfo, &r, 1);
      fwrite(row, 1, (size_t)w * nc, out);
    }
    jpeg_finish_decompress(&dinfo);
    jpeg_destroy_decompress(&dinfo);
    fclose(in);
    fclose(out);
    free(row);
    return 0;
  }
  return 2;
}
