// Native runtime components for reconstructor_tpu.
//
// The reference's host-side runtime is OpenCV/PCL C++ (image decode +
// resize in utils.cpp:61-117, PLY output via pcl::io::savePLYFile,
// utils.cpp:345-368). This library provides the TPU build's equivalents
// as a small C-ABI shared object consumed through ctypes:
//
//   - decode_jpeg_resize: libjpeg decode with DCT-domain prescaling,
//     then exact bilinear resize to the reference's target geometry
//     (max side capped, other side floored to a multiple of 8 —
//     semantics of Utils::reshapeImg). Also emits the BT.601 grayscale
//     float plane the detectors consume.
//   - decode_jpeg_batch: thread-pool fan-out over a whole image folder
//     (replaces the reference's OpenMP parallel-for over images,
//     SequentialReconstructor.cpp:58, without its shared-map data race).
//   - write_ply_ascii: buffered ASCII PLY writer in the PCL dialect.
//
// Build: native/build.sh (g++ -O3 -shared -ljpeg -lpthread).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

extern "C" {

struct DecodeResult {
  int width;
  int height;
  int ok;
};

}  // extern "C"

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Reference target geometry (utils.cpp:61-98): longer side -> max_size,
// shorter side scaled by aspect and floored to a multiple of 8.
void target_size(int h, int w, int max_size, int* th, int* tw) {
  if (h > w) {
    if (h <= max_size) { *th = h; *tw = w; return; }
    *th = max_size;
    int nw = static_cast<int>(static_cast<double>(w) / h * max_size);
    *tw = nw - nw % 8;
  } else {
    if (w <= max_size) { *th = h; *tw = w; return; }
    *tw = max_size;
    int nh = static_cast<int>(static_cast<double>(h) / w * max_size);
    *th = nh - nh % 8;
  }
}

// Bilinear resize, RGB u8, matching PIL/cv2 half-pixel convention.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = static_cast<int>(std::floor(fy));
    double wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) { y0 = 0; y1 = 0; wy = 0; }
    if (y1 >= sh) { y1 = sh - 1; if (y0 >= sh) y0 = sh - 1; }
    for (int x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = static_cast<int>(std::floor(fx));
      double wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) { x0 = 0; x1 = 0; wx = 0; }
      if (x1 >= sw) { x1 = sw - 1; if (x0 >= sw) x0 = sw - 1; }
      for (int c = 0; c < 3; ++c) {
        double v00 = src[(y0 * sw + x0) * 3 + c];
        double v01 = src[(y0 * sw + x1) * 3 + c];
        double v10 = src[(y1 * sw + x0) * 3 + c];
        double v11 = src[(y1 * sw + x1) * 3 + c];
        double v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                   v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * dw + x) * 3 + c] = static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

bool decode_one(const char* path, int max_size, uint8_t* rgb_out,
                float* gray_out, int out_stride_h, int out_stride_w,
                int* out_h, int* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  int full_h = cinfo.image_height;
  int full_w = cinfo.image_width;
  int th, tw;
  target_size(full_h, full_w, max_size, &th, &tw);

  // DCT-domain prescale: decode at the smallest scale >= target.
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 1; denom--) {
    if (full_h / denom >= th && full_w / denom >= tw) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  int dh = cinfo.output_height;
  int dw = cinfo.output_width;
  std::vector<uint8_t> buf(static_cast<size_t>(dh) * dw * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + static_cast<size_t>(cinfo.output_scanline) * dw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  std::vector<uint8_t> resized(static_cast<size_t>(th) * tw * 3);
  const uint8_t* src = buf.data();
  if (dh != th || dw != tw) {
    resize_bilinear(buf.data(), dh, dw, resized.data(), th, tw);
    src = resized.data();
  }

  for (int y = 0; y < th; ++y) {
    std::memcpy(rgb_out + (static_cast<size_t>(y) * out_stride_w) * 3,
                src + static_cast<size_t>(y) * tw * 3, static_cast<size_t>(tw) * 3);
    for (int x = 0; x < tw; ++x) {
      const uint8_t* px = src + (static_cast<size_t>(y) * tw + x) * 3;
      gray_out[static_cast<size_t>(y) * out_stride_w + x] =
          (0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2]) / 255.0f;
    }
  }
  (void)out_stride_h;
  *out_h = th;
  *out_w = tw;
  return true;
}

}  // namespace

extern "C" {

// Probe a JPEG's reference-resized output dims without full decode.
int probe_jpeg(const char* path, int max_size, int* out_h, int* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  target_size(cinfo.image_height, cinfo.image_width, max_size, out_h, out_w);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 1;
}

// Decode a batch of JPEGs into pre-allocated padded (N, H, W, 3) u8 and
// (N, H, W) f32 buffers using a worker pool. paths: concatenated
// NUL-separated strings. Returns number successfully decoded.
int decode_jpeg_batch(const char* paths, int num_images, int max_size,
                      uint8_t* rgb_out, float* gray_out, int pad_h, int pad_w,
                      int* heights, int* widths, int num_threads) {
  std::vector<std::string> path_vec;
  const char* p = paths;
  for (int i = 0; i < num_images; ++i) {
    path_vec.emplace_back(p);
    p += path_vec.back().size() + 1;
  }
  std::atomic<int> next{0};
  std::atomic<int> ok_count{0};
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= num_images) break;
      uint8_t* rgb = rgb_out + static_cast<size_t>(i) * pad_h * pad_w * 3;
      float* gray = gray_out + static_cast<size_t>(i) * pad_h * pad_w;
      int h = 0, w = 0;
      if (decode_one(path_vec[i].c_str(), max_size, rgb, gray, pad_h, pad_w,
                     &h, &w)) {
        heights[i] = h;
        widths[i] = w;
        ok_count.fetch_add(1);
      } else {
        heights[i] = 0;
        widths[i] = 0;
      }
    }
  };
  int n_threads = num_threads > 0 ? num_threads
                                  : static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

// Buffered ASCII PLY writer (PCL dialect, utils.cpp:345-368 output parity).
int write_ply_ascii(const char* path, const float* xyz, const uint8_t* rgb,
                    int64_t num_points) {
  FILE* f = fopen(path, "w");
  if (!f) return 0;
  fprintf(f,
          "ply\nformat ascii 1.0\ncomment PCL generated\n"
          "element vertex %lld\n"
          "property float x\nproperty float y\nproperty float z\n"
          "property uchar red\nproperty uchar green\nproperty uchar blue\n"
          "element camera 1\n"
          "property float view_px\nproperty float view_py\nproperty float view_pz\n"
          "property float x_axisx\nproperty float x_axisy\nproperty float x_axisz\n"
          "property float y_axisx\nproperty float y_axisy\nproperty float y_axisz\n"
          "property float z_axisx\nproperty float z_axisy\nproperty float z_axisz\n"
          "property float focal\nproperty float scalex\nproperty float scaley\n"
          "property float centerx\nproperty float centery\n"
          "property int viewportx\nproperty int viewporty\n"
          "property float k1\nproperty float k2\nend_header\n",
          static_cast<long long>(num_points));
  std::vector<char> buf(1 << 20);
  setvbuf(f, buf.data(), _IOFBF, buf.size());
  for (int64_t i = 0; i < num_points; ++i) {
    fprintf(f, "%g %g %g %u %u %u\n", xyz[i * 3], xyz[i * 3 + 1],
            xyz[i * 3 + 2], rgb[i * 3], rgb[i * 3 + 1], rgb[i * 3 + 2]);
  }
  fputs("0 0 0 1 0 0 0 1 0 0 0 1 0 0 0 0 0 0 0 0 0\n", f);
  fclose(f);
  return 1;
}

}  // extern "C"
