// Native host-side image codec for the bulk-embedding data pipeline.
//
// The PNG/JPEG dataset layouts store one file per frame
// (save_opt_trajectories_png/jpeg); decoding them is the host-side
// bottleneck when feeding a TPU embedder at >10k frames/sec.  This
// library decodes batches of files into a caller-provided uint8 buffer
// with a thread pool, replacing the single-threaded cv2.imread loop.
//
// Channel order: when `bgr` != 0 the decoded channels are reversed to
// match cv2.imread's BGR convention (the reference writes frames with
// cv2.imwrite, so files round-trip through the swapped order).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links libpng/libjpeg)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

// Returns 0 on success; fills out[h*w*3] RGB.
int decode_png_file(const char* path, uint8_t* out, int want_h, int want_w) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  if ((int)image.height != want_h || (int)image.width != want_w) {
    png_image_free(&image);
    return 2;
  }
  image.format = PNG_FORMAT_RGB;
  if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) {
    png_image_free(&image);
    return 3;
  }
  return 0;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

int decode_jpeg_file(const char* path, uint8_t* out, int want_h, int want_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != want_h || (int)cinfo.output_width != want_w
      || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * want_w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

void swap_rb(uint8_t* out, int h, int w) {
  const size_t n = (size_t)h * w;
  for (size_t i = 0; i < n; ++i) {
    uint8_t tmp = out[i * 3];
    out[i * 3] = out[i * 3 + 2];
    out[i * 3 + 2] = tmp;
  }
}

}  // namespace

extern "C" {

// Decode `n` files into out[n, h, w, 3] uint8.  kind: 0=png, 1=jpeg.
// Returns 0 on success, else 1-based index of the first failing file.
int decode_image_batch(const char** paths, int n, uint8_t* out, int h, int w,
                       int kind, int bgr, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    const size_t frame = (size_t)h * w * 3;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;
      uint8_t* dst = out + (size_t)i * frame;
      int rc = kind == 0 ? decode_png_file(paths[i], dst, h, w)
                         : decode_jpeg_file(paths[i], dst, h, w);
      if (rc != 0) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        break;
      }
      if (bgr) swap_rb(dst, h, w);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load();
}

// Probe how many sequential frames '{stem}_{i}.{ext}' exist (the PNG
// layout has no index file; the Python loop stats files one by one).
int count_frames(const char* dir, const char* stem, const char* ext,
                 int max_steps) {
  char path[4096];
  for (int i = 0; i < max_steps; ++i) {
    snprintf(path, sizeof(path), "%s/%s_%d.%s", dir, stem, i, ext);
    FILE* fp = fopen(path, "rb");
    if (!fp) return i;
    fclose(fp);
  }
  return max_steps;
}

}  // extern "C"
