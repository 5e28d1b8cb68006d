// Native image codec interface (see image_codec.cpp).
#pragma once

#include <string>
#include <vector>

namespace svt {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;  // 1 (gray) or 3 (rgb), float32, 0..255 (pfm: raw)
  std::vector<float> pixels;
};

extern thread_local std::string g_last_error;

bool decode_image(const std::string& path, Image* out);
void to_gray(const Image& in, std::vector<float>* out);
void decimate2(std::vector<float>* px, int* w, int* h, int channels);

}  // namespace svt

namespace svt {
// Encode an 8-bit grayscale PNG (filter 0, zlib default level).
// data: H*W bytes row-major. Returns false + g_last_error on failure.
bool encode_png_gray(const std::string& path, const unsigned char* data,
                     int width, int height);
}  // namespace svt
