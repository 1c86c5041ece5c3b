// fastio — native image IO for the unetdc-tpu host pipeline.
//
// The reference framework decodes/encodes every image through Python
// (PIL/cv2 wrappers); on the 1-vCPU hosts driving a TPU the codec work is
// the pipeline's host-side bottleneck. This small C++ library provides:
//
//   decode_rgb():      PNG/JPEG file -> tightly-packed RGB8 buffer
//   encode_png_gray(): 8-bit grayscale -> PNG with filter NONE + fast zlib
//                      level (mask writes are ~10x PIL's default path)
//   encode_png_rgb():  RGB8 -> PNG, same fast settings
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency,
// per-environment constraint). All functions return 0 on success and a
// negative errno-style code on failure; no exceptions cross the boundary.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>

#include <png.h>
#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------- PNG ----

// Returns 0 on success; fills *w,*h. `out` must hold w*h*3 bytes
// (call probe first with out == nullptr to get dimensions).
int decode_png_rgb(const char* path, int* w, int* h, unsigned char* out) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    unsigned char header[8];
    if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
        fclose(fp);
        return -2;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -3;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    int fw = (int)png_get_image_width(png, info);
    int fh = (int)png_get_image_height(png, info);
    if (!out) {  // probe call
        *w = fw;
        *h = fh;
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return 0;
    }
    // decode call: *w/*h carry the caller's buffer dims (from the probe);
    // refuse to write if the file changed in between (TOCTOU guard)
    if (fw != *w || fh != *h) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -6;
    }

    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    // normalize everything to 8-bit RGB (PIL convert("RGB") semantics)
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    // Adam7-interlaced rows cannot be streamed row-by-row; hand those to
    // the PIL fallback rather than silently de-interlacing incorrectly.
    if (png_get_interlace_type(png, info) != PNG_INTERLACE_NONE) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -5;
    }
    png_read_update_info(png, info);

    size_t rowbytes = png_get_rowbytes(png, info);
    if (rowbytes != (size_t)(*w) * 3) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -4;
    }
    for (int y = 0; y < *h; y++)
        png_read_row(png, out + (size_t)y * rowbytes, nullptr);
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
}

static int encode_png(const char* path, const unsigned char* data,
                      int h, int w, int channels, int level) {
    FILE* fp = fopen(path, "wb");
    if (!fp) return -1;
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        fclose(fp);
        return -3;
    }
    png_init_io(png, fp);
    png_set_compression_level(png, level);
    png_set_filter(png, 0, PNG_FILTER_NONE);  // fastest; masks compress fine
    int color = channels == 1 ? PNG_COLOR_TYPE_GRAY : PNG_COLOR_TYPE_RGB;
    png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    for (int y = 0; y < h; y++)
        png_write_row(png, const_cast<unsigned char*>(
            data + (size_t)y * w * channels));
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return 0;
}

int encode_png_gray(const char* path, const unsigned char* data,
                    int h, int w, int level) {
    return encode_png(path, data, h, w, 1, level);
}

int encode_png_rgb(const char* path, const unsigned char* data,
                   int h, int w, int level) {
    return encode_png(path, data, h, w, 3, level);
}

// --------------------------------------------------------------- JPEG ----

struct jpeg_err_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    jpeg_err_mgr* e = (jpeg_err_mgr*)cinfo->err;
    longjmp(e->jb, 1);
}

int decode_jpeg_rgb(const char* path, int* w, int* h, unsigned char* out) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    jpeg_decompress_struct cinfo;
    jpeg_err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(fp);
        return -3;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    int fw = (int)cinfo.output_width;
    int fh = (int)cinfo.output_height;
    if (!out) {
        *w = fw;
        *h = fh;
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        fclose(fp);
        return 0;
    }
    if (fw != *w || fh != *h) {  // TOCTOU guard (see PNG path)
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        fclose(fp);
        return -6;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row = out + (size_t)cinfo.output_scanline * (*w) * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 0;
}

}  // extern "C"
