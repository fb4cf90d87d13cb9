// Native batch .npy loader for the facl_tpu data pipeline.
//
// The reference delegates its IO tier to torch's C++ DataLoader workers
// (16 forked processes, cn3d_train_apperance_GL.py:171). The TPU-native
// equivalent is this small library: a thread pool that parses and loads
// batches of .npy files in parallel outside the Python GIL, feeding the
// host->device pipeline. Exposed through ctypes (facl_tpu/data/native.py).
//
// Supports the subset of the .npy format the framework writes: v1.0/v2.0
// headers, little-endian '<f4'/'<f8'/'<i4'/'<i8', C-order. Everything is
// converted to float32 on load (the pipeline's wire dtype).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Header {
  std::vector<int64_t> shape;
  char dtype;      // 'f' float, 'i' int
  int itemsize;    // 4 or 8
  size_t data_offset;
  bool ok;
  std::string err;
};

Header parse_header(FILE* f) {
  Header h;
  h.ok = false;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    h.err = "bad magic";
    return h;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { h.err = "short header len"; return h; }
    hlen = b[0] | (b[1] << 8);
    h.data_offset = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { h.err = "short header len"; return h; }
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    h.data_offset = 12 + hlen;
  }
  std::string hdr(hlen, '\0');
  if (fread(&hdr[0], 1, hlen, f) != hlen) { h.err = "short header"; return h; }

  // descr
  auto dpos = hdr.find("'descr'");
  if (dpos == std::string::npos) { h.err = "no descr"; return h; }
  auto q1 = hdr.find('\'', dpos + 7);
  auto q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|')) {
    h.err = "unsupported byte order: " + descr;
    return h;
  }
  h.dtype = descr[1];
  h.itemsize = descr[2] - '0';
  if ((h.dtype != 'f' && h.dtype != 'i') ||
      (h.itemsize != 4 && h.itemsize != 8)) {
    h.err = "unsupported dtype: " + descr;
    return h;
  }
  // fortran_order
  if (hdr.find("'fortran_order': True") != std::string::npos) {
    h.err = "fortran order unsupported";
    return h;
  }
  // shape
  auto spos = hdr.find("'shape':");
  auto p1 = hdr.find('(', spos);
  auto p2 = hdr.find(')', p1);
  std::string shp = hdr.substr(p1 + 1, p2 - p1 - 1);
  int64_t cur = 0;
  bool have = false;
  for (char c : shp) {
    if (c >= '0' && c <= '9') { cur = cur * 10 + (c - '0'); have = true; }
    else if (c == ',') { if (have) h.shape.push_back(cur); cur = 0; have = false; }
  }
  if (have) h.shape.push_back(cur);
  h.ok = true;
  return h;
}

// Load one file, converting to float32 into out (capacity max_elems).
// Returns number of elements written, 0 on failure; shape into shape_out
// (up to 4 dims, -1 padded), ndim_out.
int64_t load_one(const char* path, float* out, int64_t max_elems,
                 int64_t* shape_out, int32_t* ndim_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  Header h = parse_header(f);
  if (!h.ok) { fclose(f); return 0; }
  int64_t elems = 1;
  for (auto s : h.shape) elems *= s;
  if (elems > max_elems) { fclose(f); return 0; }
  fseek(f, (long)h.data_offset, SEEK_SET);

  const size_t nbytes = size_t(elems) * h.itemsize;
  std::vector<unsigned char> buf(nbytes);
  if (fread(buf.data(), 1, nbytes, f) != nbytes) { fclose(f); return 0; }
  fclose(f);

  if (h.dtype == 'f' && h.itemsize == 4) {
    memcpy(out, buf.data(), nbytes);
  } else if (h.dtype == 'f' && h.itemsize == 8) {
    const double* src = reinterpret_cast<const double*>(buf.data());
    for (int64_t i = 0; i < elems; ++i) out[i] = float(src[i]);
  } else if (h.dtype == 'i' && h.itemsize == 4) {
    const int32_t* src = reinterpret_cast<const int32_t*>(buf.data());
    for (int64_t i = 0; i < elems; ++i) out[i] = float(src[i]);
  } else {
    const int64_t* src = reinterpret_cast<const int64_t*>(buf.data());
    for (int64_t i = 0; i < elems; ++i) out[i] = float(src[i]);
  }
  int nd = int(h.shape.size());
  *ndim_out = nd;
  for (int i = 0; i < 4; ++i) shape_out[i] = i < nd ? h.shape[i] : -1;
  return elems;
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

}  // namespace

extern "C" {

// Parallel batch load: n files into one contiguous float32 buffer of
// stride max_elems each. shapes: (n, 4) int64; ndims: (n,) int32;
// counts: (n,) int64 elements loaded (0 = failure).
// Returns number of successfully loaded files.
int64_t nl_load_batch(const char** paths, int32_t n, float* out,
                      int64_t max_elems, int64_t* shapes, int32_t* ndims,
                      int64_t* counts, int32_t num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int64_t> okcount{0};
  {
    ThreadPool pool(num_threads);
    std::atomic<int32_t> done{0};
    std::mutex mu;
    std::condition_variable cv;
    for (int32_t i = 0; i < n; ++i) {
      pool.submit([&, i] {
        counts[i] = load_one(paths[i], out + int64_t(i) * max_elems,
                             max_elems, shapes + int64_t(i) * 4, ndims + i);
        if (counts[i] > 0) okcount++;
        if (++done == n) {
          std::unique_lock<std::mutex> lk(mu);
          cv.notify_one();
        }
      });
    }
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] { return done.load() == n; });
  }
  return okcount.load();
}

// Single-file header probe (for capacity planning).
int64_t nl_probe(const char* path, int64_t* shape, int32_t* ndim) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  Header h = parse_header(f);
  fclose(f);
  if (!h.ok) return 0;
  int64_t elems = 1;
  for (auto s : h.shape) elems *= s;
  int nd = int(h.shape.size());
  *ndim = nd;
  for (int i = 0; i < 4; ++i) shape[i] = i < nd ? h.shape[i] : -1;
  return elems;
}

}  // extern "C"
