// Native image I/O: PPM writer + JPEG decoder.
//
// C++ re-derivation of the reference's host-side image utilities:
// * gpt_write_ppm: ASCII P3 with sqrt gamma and [0,1] clamp, byte-for-byte
//   the format of save_image (/root/reference/src/util/image_util.h:50-72);
// * gpt_jpeg_*: libjpeg decode normalized /255 with bottom-up row order,
//   like the vendored marengo wrapper use in read_image_util.h:47-72.
//
// C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>
#include <string>

extern "C" {

// rgb: (h*w*3) floats, row-major top-down linear radiance.
int gpt_write_ppm(const char* path, int h, int w, const float* rgb) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    std::fprintf(f, "P3\n%d %d\n255\n", w, h);
    std::string buf;
    buf.reserve(static_cast<size_t>(h) * w * 12);
    char tmp[16];
    for (long long i = 0; i < static_cast<long long>(h) * w; ++i) {
        for (int c = 0; c < 3; ++c) {
            float v = rgb[i * 3 + c];
            // NaN -> 0 like the Python writer's nan_to_num
            float s = (v > 0.f) ? std::sqrt(v) : 0.f;
            if (s > 0.999999f) s = 0.999999f;
            int q = static_cast<int>(255.99f * s);
            int n = std::snprintf(tmp, sizeof tmp, c < 2 ? "%d " : "%d\n", q);
            buf.append(tmp, n);
        }
    }
    std::fwrite(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    return 0;
}

namespace {
struct JpegErr {
    jpeg_error_mgr mgr;
    std::jmp_buf jb;
};
void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    std::longjmp(err->jb, 1);
}
}  // namespace

int gpt_jpeg_size(const char* path, int* h, int* w) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *h = static_cast<int>(cinfo.image_height);
    *w = static_cast<int>(cinfo.image_width);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 0;
}

// out: (h*w*3) floats.  flip_rows!=0 stores rows bottom-up (the reference
// decoder's order).
int gpt_jpeg_decode(const char* path, float* out, int flip_rows) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    int w = static_cast<int>(cinfo.output_width);
    int h = static_cast<int>(cinfo.output_height);
    std::vector<unsigned char> row(static_cast<size_t>(w) * 3);
    unsigned char* rowp = row.data();
    while (cinfo.output_scanline < cinfo.output_height) {
        int y = static_cast<int>(cinfo.output_scanline);
        jpeg_read_scanlines(&cinfo, &rowp, 1);
        int dst_y = flip_rows ? (h - 1 - y) : y;
        float* dst = out + static_cast<long long>(dst_y) * w * 3;
        for (int i = 0; i < w * 3; ++i) dst[i] = row[i] / 255.0f;
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 0;
}

}  // extern "C"
