// Native batched image decoder for the host-side data loader.
//
// The reference loses its throughput to a 15-process python dataloader
// (reference trainval.py:140-141); our host work is reduced to image
// decode, and this library removes the remaining python overhead from
// that: a fixed thread pool decodes a whole batch of PNG/JPEG files
// directly into one preallocated (B, H, W, C) uint8 buffer -- no
// per-image numpy allocations, no GIL ping-pong, no python thread
// scheduling.  Exposed through ctypes (see
// handpose_tpu/data/native_decode.py); falls back to cv2 when absent.
//
// Built automatically by handpose_tpu/data/native_decode.py into an
// ISA-tagged name (libfastdecode.<machine>-<cpuflags-hash>.so, atomic
// rename); manual equivalent:
//   g++ -O3 -march=native -shared -fPIC -o libfastdecode.<tag>.so \
//       fastdecode.cpp -lpng -ljpeg -lpthread

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// ---- PNG via the libpng simplified API ----------------------------------
// Decodes into RGB (C=3) or gray (C=1); scales/validates against the
// expected H x W.  Returns true on success.
bool decode_png(const char* path, uint8_t* out, int H, int W, int C) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = (C == 1) ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  if ((int)image.width != W || (int)image.height != H) {
    png_image_free(&image);
    return false;
  }
  if (!png_image_finish_read(&image, nullptr, out, W * C, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

// ---- JPEG via libjpeg ----------------------------------------------------
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(const char* path, uint8_t* out, int H, int W, int C) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (C == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != W || (int)cinfo.output_height != H ||
      (int)cinfo.output_components != C) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * W * C;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode_any(const char* path, uint8_t* out, int H, int W, int C) {
  // Route by magic bytes, not filename: mixed-case extensions (.Png) and
  // misnamed files (.jpg-named PNGs) are common in scraped datasets.
  unsigned char magic[8] = {0};
  if (FILE* f = std::fopen(path, "rb")) {
    size_t got = std::fread(magic, 1, sizeof magic, f);
    std::fclose(f);
    static const unsigned char png_sig[8] =
        {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    if (got == 8 && std::memcmp(magic, png_sig, 8) == 0) {
      return decode_png(path, out, H, W, C);
    }
  } else {
    return false;
  }
  return decode_jpeg(path, out, H, W, C);
}

}  // namespace

extern "C" {

// Decode n images into out (n * H * W * C bytes, row-major batch).
// Returns 0 on success, (1 + index) of a failing image (the first
// failure DETECTED -- under concurrency not necessarily the lowest
// index), or -1 when no worker thread could be started.
int decode_batch(const char** paths, int n, uint8_t* out, int H, int W,
                 int C, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      uint8_t* dst = out + (size_t)i * H * W * C;
      if (!decode_any(paths[i], dst, H, W, C)) {
        int expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        return;
      }
    }
  };
  std::vector<std::thread> threads;
  int k = n_threads < n ? n_threads : n;
  threads.reserve(k);
  // A std::thread ctor failure (EAGAIN under cgroup pid limits) must not
  // throw across the extern "C"/ctypes boundary (UB) nor std::terminate
  // via joinable destructors: run with however many threads started, or
  // report -1 if none could.
  for (int t = 0; t < k; ++t) {
    try {
      threads.emplace_back(work);
    } catch (...) {
      break;
    }
  }
  if (threads.empty()) return -1;
  for (auto& t : threads) t.join();
  return failed.load();
}

int fastdecode_abi_version() { return 1; }

}  // extern "C"
