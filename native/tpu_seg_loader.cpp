// Native data loader: multithreaded JPEG/PNG decode + batch assembly with an
// internal prefetch ring (SURVEY.md §2.3 "Pillow-SIMD / libjpeg-turbo /
// OpenCV" row — the reference feeds its DataLoader worker processes with
// C/C++ codecs; this is the TPU-framework equivalent, feeding the on-device
// fused augmentation with ready uint8 NHWC batches).
//
// Design:
// - loader_create() spins up a producer pool. Each worker claims the next
//   batch index, decodes its (image, mask) files straight into one slot of a
//   preallocated ring of pinned host buffers, applies the optional 256-entry
//   label LUT (e.g. Cityscapes raw-id -> train-id) during the copy, and
//   publishes the slot.
// - loader_next() blocks until the next batch (in order) is published and
//   memcpy-s it into caller (numpy) memory. Python calls it from a thread
//   via ctypes — the GIL is released for the whole call, so decode overlaps
//   both the train step and the H2D transfer.
// - Images are bilinear-resized (masks: nearest) to the fixed target H×W
//   when a file's native size differs, keeping batch shapes static for XLA.
//
// C ABI only (ctypes-friendly); no Python.h dependency.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <random>
#include <utility>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

// ---------- JPEG ----------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(const std::string& path, Image* out, int channels) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;
  out->data.resize(size_t(out->h) * out->w * out->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() +
                   size_t(cinfo.output_scanline) * out->w * out->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ---------- PNG ----------

bool decode_png(const std::string& path, Image* out, int channels) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) {
    if (channels == 1) {
      // palette index IS the label id (Mapillary-style masks): read raw
      png_set_packing(png);
    } else {
      png_set_palette_to_rgb(png);
    }
  }
  if (channels == 3) {
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
  } else {  // label mask: collapse to one channel
    if (color_type == PNG_COLOR_TYPE_RGB ||
        color_type == PNG_COLOR_TYPE_RGB_ALPHA)
      png_set_rgb_to_gray(png, 1, -1, -1);
    png_set_strip_alpha(png);
    if (bit_depth < 8) png_set_packing(png);
  }
  png_read_update_info(png, info);
  int rowbytes = png_get_rowbytes(png, info);
  int c = rowbytes / int(w);
  out->h = int(h);
  out->w = int(w);
  out->c = c;
  out->data.resize(size_t(h) * rowbytes);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; ++i)
    rows[i] = out->data.data() + size_t(i) * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  std::transform(tail.begin(), tail.end(), tail.begin(), ::tolower);
  return tail == suf;
}

bool decode_file(const std::string& path, Image* out, int channels) {
  if (has_suffix(path, ".png")) return decode_png(path, out, channels);
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
    return decode_jpeg(path, out, channels);
  return false;
}

// ---------- resize ----------

void resize_bilinear_u8(const Image& src, uint8_t* dst, int oh, int ow) {
  const int c = src.c;
  for (int y = 0; y < oh; ++y) {
    float sy = (y + 0.5f) * src.h / oh - 0.5f;
    sy = std::max(0.0f, std::min(sy, float(src.h - 1)));
    int y0 = int(sy), y1 = std::min(y0 + 1, src.h - 1);
    float fy = sy - y0;
    for (int x = 0; x < ow; ++x) {
      float sx = (x + 0.5f) * src.w / ow - 0.5f;
      sx = std::max(0.0f, std::min(sx, float(src.w - 1)));
      int x0 = int(sx), x1 = std::min(x0 + 1, src.w - 1);
      float fx = sx - x0;
      for (int k = 0; k < c; ++k) {
        float a = src.data[(size_t(y0) * src.w + x0) * c + k];
        float b = src.data[(size_t(y0) * src.w + x1) * c + k];
        float d = src.data[(size_t(y1) * src.w + x0) * c + k];
        float e = src.data[(size_t(y1) * src.w + x1) * c + k];
        float v = (a * (1 - fx) + b * fx) * (1 - fy) +
                  (d * (1 - fx) + e * fx) * fy;
        dst[(size_t(y) * ow + x) * c + k] = uint8_t(v + 0.5f);
      }
    }
  }
}

void resize_nearest_u8(const Image& src, uint8_t* dst, int oh, int ow) {
  for (int y = 0; y < oh; ++y) {
    int sy = std::min(int(float(y) * src.h / oh), src.h - 1);
    for (int x = 0; x < ow; ++x) {
      int sx = std::min(int(float(x) * src.w / ow), src.w - 1);
      dst[size_t(y) * ow + x] = src.data[size_t(sy) * src.w + sx];
    }
  }
}

// ---------- loader ----------

struct Loader {
  std::vector<std::string> img_paths, lbl_paths;
  int batch, h, w, prefetch;
  // Multi-host sample slice [slice_lo, slice_hi) of each global batch
  // (parallel.distributed contract): every process walks the SAME
  // (seed, epoch)-shuffled global order but decodes only its slice, so
  // ring slots and outputs hold slice_hi - slice_lo samples while seq
  // numbering / epoch boundaries stay global.
  int slice_lo = 0, slice_hi = 0;  // slice_hi == 0 means full batch
  bool shuffle;
  uint8_t lut[256];
  bool has_lut = false;
  uint64_t seed = 0;

  // ring of ready batches
  struct Slot {
    std::vector<uint8_t> img;  // batch*h*w*3
    std::vector<uint8_t> lbl;  // batch*h*w
    size_t seq = 0;            // batch sequence number held by this slot
  };
  std::vector<Slot> ring;
  std::vector<int> slot_state;  // 0 free, 1 filling, 2 ready
  size_t head = 0;              // next seq the consumer will take
  size_t total_batches = 0;     // next seq a producer will claim
  size_t max_batches = 0;       // 0 = infinite (loop)
  size_t batches_per_epoch = 0;
  std::atomic<bool> stop{false};
  std::string error;

  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::vector<std::thread> workers;

  // Per-epoch shuffled orders, seeded by (seed, epoch) so any stream
  // position is reconstructable from the sequence number alone (resume) and
  // each epoch reshuffles like torch's DataLoader. Workers near an epoch
  // boundary may fill batches from two epochs concurrently, so a small
  // shared_ptr cache keeps both alive.
  std::mutex order_mu;
  std::vector<std::pair<size_t, std::shared_ptr<const std::vector<size_t>>>>
      order_cache;

  std::shared_ptr<const std::vector<size_t>> order_for_epoch(size_t epoch) {
    std::lock_guard<std::mutex> lk(order_mu);
    for (auto& e : order_cache)
      if (e.first == epoch) return e.second;
    auto order = std::make_shared<std::vector<size_t>>(img_paths.size());
    for (size_t i = 0; i < order->size(); ++i) (*order)[i] = i;
    if (shuffle) {
      std::seed_seq ss{seed, (uint64_t)epoch};
      std::mt19937_64 rng(ss);
      std::shuffle(order->begin(), order->end(), rng);
    }
    if (order_cache.size() >= 3) order_cache.erase(order_cache.begin());
    order_cache.emplace_back(epoch, order);
    return order;
  }

  ~Loader() {
    stop.store(true);
    cv_free.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

void fill_slot(Loader* L, Loader::Slot* slot, size_t batch_seq) {
  const size_t epoch = batch_seq / L->batches_per_epoch;
  const size_t b_in_epoch = batch_seq % L->batches_per_epoch;
  auto order = L->order_for_epoch(epoch);
  const int lo = L->slice_lo;
  const int hi = L->slice_hi ? L->slice_hi : L->batch;
  for (int bb = lo; bb < hi; ++bb) {
    const int b = bb - lo;  // local output position
    size_t idx = (*order)[b_in_epoch * L->batch + bb];
    Image img, lbl;
    if (!decode_file(L->img_paths[idx], &img, 3) || img.c != 3) {
      std::lock_guard<std::mutex> lk(L->mu);
      L->error = "failed to decode image: " + L->img_paths[idx];
      L->stop.store(true);
      return;
    }
    uint8_t* img_dst = slot->img.data() + size_t(b) * L->h * L->w * 3;
    if (img.h == L->h && img.w == L->w) {
      memcpy(img_dst, img.data.data(), size_t(L->h) * L->w * 3);
    } else {
      resize_bilinear_u8(img, img_dst, L->h, L->w);
    }
    if (!L->lbl_paths.empty()) {
      if (!decode_file(L->lbl_paths[idx], &lbl, 1) || lbl.c != 1) {
        std::lock_guard<std::mutex> lk(L->mu);
        L->error = "failed to decode mask: " + L->lbl_paths[idx];
        L->stop.store(true);
        return;
      }
      uint8_t* lbl_dst = slot->lbl.data() + size_t(b) * L->h * L->w;
      if (lbl.h == L->h && lbl.w == L->w) {
        memcpy(lbl_dst, lbl.data.data(), size_t(L->h) * L->w);
      } else {
        resize_nearest_u8(lbl, lbl_dst, L->h, L->w);
      }
      if (L->has_lut) {
        size_t count = size_t(L->h) * L->w;
        for (size_t i = 0; i < count; ++i) lbl_dst[i] = L->lut[lbl_dst[i]];
      }
    }
  }
}

void producer(Loader* L) {
  while (!L->stop.load()) {
    size_t seq;
    int slot_idx = -1;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_free.wait(lk, [&] {
        if (L->stop.load()) return true;
        if (L->max_batches && L->total_batches >= L->max_batches) return true;
        for (int i = 0; i < L->prefetch; ++i)
          if (L->slot_state[i] == 0) return true;
        return false;
      });
      if (L->stop.load()) return;
      if (L->max_batches && L->total_batches >= L->max_batches) return;
      seq = L->total_batches++;
      for (int i = 0; i < L->prefetch; ++i) {
        if (L->slot_state[i] == 0) {
          slot_idx = i;
          L->slot_state[i] = 1;
          L->ring[i].seq = seq;
          break;
        }
      }
    }
    fill_slot(L, &L->ring[slot_idx], seq);
    {
      std::lock_guard<std::mutex> lk(L->mu);
      // Slots publish as they finish, possibly out of submission order;
      // loader_next delivers strictly by seq (it waits for seq == head),
      // so the consumer-visible stream is deterministic for any thread
      // count. Claimed seqs are consecutive and at most `prefetch` are
      // outstanding, so the head's slot is always among them — no deadlock.
      L->slot_state[slot_idx] = 2;
    }
    L->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

void* loader_create(const char** img_paths, const char** lbl_paths, int n,
                    int batch, int h, int w, int threads, int prefetch,
                    const uint8_t* lut, uint64_t seed, int shuffle,
                    int epochs, uint64_t start_seq, int slice_lo,
                    int slice_hi) {
  if (n <= 0 || batch <= 0 || prefetch <= 0 || batch > n) return nullptr;
  if (slice_lo < 0 || slice_hi > batch || (slice_hi && slice_lo >= slice_hi))
    return nullptr;
  auto* L = new Loader();
  L->slice_lo = slice_lo;
  L->slice_hi = slice_hi;
  L->img_paths.assign(img_paths, img_paths + n);
  if (lbl_paths) L->lbl_paths.assign(lbl_paths, lbl_paths + n);
  L->batch = batch;
  L->h = h;
  L->w = w;
  L->prefetch = prefetch;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  if (lut) {
    memcpy(L->lut, lut, 256);
    L->has_lut = true;
  }
  L->batches_per_epoch = size_t(n) / batch;  // drop_last, restart each epoch
  L->max_batches =
      epochs > 0 ? L->batches_per_epoch * size_t(epochs) : 0;
  // resume: continue the deterministic stream at batch `start_seq` —
  // (seed, epoch) seeding makes this exactly the uninterrupted stream
  L->head = start_seq;
  L->total_batches = start_seq;
  const size_t local = size_t((slice_hi ? slice_hi : batch) - slice_lo);
  L->ring.resize(prefetch);
  L->slot_state.assign(prefetch, 0);
  for (int i = 0; i < prefetch; ++i) {
    L->ring[i].img.resize(local * h * w * 3);
    L->ring[i].lbl.resize(L->lbl_paths.empty() ? 0 : local * h * w);
  }
  int nthreads = std::max(1, threads);
  for (int i = 0; i < nthreads; ++i)
    L->workers.emplace_back(producer, L);
  return L;
}

// Returns 1 on success, 0 on end-of-data, -1 on error.
int loader_next(void* handle, uint8_t* img_out, uint8_t* lbl_out) {
  auto* L = static_cast<Loader*>(handle);
  int slot_idx = -1;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] {
      if (L->stop.load() && !L->error.empty()) return true;
      // strict in-order delivery: only the slot holding seq == head counts
      for (int i = 0; i < L->prefetch; ++i)
        if (L->slot_state[i] == 2 && L->ring[i].seq == L->head) return true;
      if (L->max_batches && L->head >= L->max_batches) return true;
      return false;
    });
    if (!L->error.empty()) return -1;
    if (L->max_batches && L->head >= L->max_batches) return 0;
    for (int i = 0; i < L->prefetch; ++i) {
      if (L->slot_state[i] == 2 && L->ring[i].seq == L->head) {
        slot_idx = i;
        break;
      }
    }
    L->head++;
  }
  auto& slot = L->ring[slot_idx];
  memcpy(img_out, slot.img.data(), slot.img.size());
  if (lbl_out && !slot.lbl.empty())
    memcpy(lbl_out, slot.lbl.data(), slot.lbl.size());
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->slot_state[slot_idx] = 0;
  }
  L->cv_free.notify_all();
  return 1;
}

const char* loader_error(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  std::lock_guard<std::mutex> lk(L->mu);
  return L->error.c_str();
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Stateless helper: decode one file into caller memory (for tests/tools).
// channels: 3 = RGB image, 1 = mask. Returns 1 ok / 0 fail; writes dims.
int decode_image(const char* path, uint8_t* out, int* out_h, int* out_w,
                 int channels, int max_bytes) {
  Image img;
  if (!decode_file(path, &img, channels)) return 0;
  if (int(img.data.size()) > max_bytes) return 0;
  memcpy(out, img.data.data(), img.data.size());
  *out_h = img.h;
  *out_w = img.w;
  return 1;
}

}  // extern "C"
