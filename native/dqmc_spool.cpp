// Asynchronous binned-measurement spool.
//
// The reference writes each bin synchronously to HDF5 from the simulation
// loop (measurementh5.h:277-362).  Here the device loop must never block on
// host IO: bins are handed to a background writer thread through a bounded
// queue and appended to a compact length-prefixed binary log; a Python
// converter (dqmc_tpu/io/spool.py) turns the log into the reference's HDF5
// layout after (or during) the run.
//
// Record format (little-endian):
//   magic "DQMB" | u32 version
// per record:
//   u32 name_len | name bytes | i64 bin_idx | u8 kind (0 real, 1 complex)
//   | u32 ndim | i64 shape[ndim] | f64 data[prod(shape) * (kind?2:1)]
//
// C API (ctypes): spool_open / spool_write / spool_flush / spool_close.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Record {
    std::string name;
    int64_t bin_idx;
    uint8_t kind;
    std::vector<int64_t> shape;
    std::vector<double> data;
};

struct Spool {
    FILE* f = nullptr;
    std::thread worker;
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
    std::deque<Record> queue;
    size_t max_queue = 64;
    bool closing = false;
    bool error = false;

    void run() {
        for (;;) {
            Record rec;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_pop.wait(lk, [&] { return closing || !queue.empty(); });
                if (queue.empty()) break;  // closing and drained
                rec = std::move(queue.front());
                queue.pop_front();
                cv_push.notify_all();
            }
            write_record(rec);
        }
        std::fflush(f);
    }

    void write_record(const Record& r) {
        uint32_t nl = (uint32_t)r.name.size();
        uint32_t nd = (uint32_t)r.shape.size();
        bool ok = std::fwrite(&nl, 4, 1, f) == 1
            && std::fwrite(r.name.data(), 1, nl, f) == nl
            && std::fwrite(&r.bin_idx, 8, 1, f) == 1
            && std::fwrite(&r.kind, 1, 1, f) == 1
            && std::fwrite(&nd, 4, 1, f) == 1
            && std::fwrite(r.shape.data(), 8, nd, f) == nd
            && std::fwrite(r.data.data(), 8, r.data.size(), f)
                == r.data.size();
        if (!ok) error = true;
    }
};

}  // namespace

extern "C" {

void* spool_open(const char* path) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return nullptr;
    const char magic[4] = {'D', 'Q', 'M', 'B'};
    uint32_t version = 1;
    std::fwrite(magic, 1, 4, f);
    std::fwrite(&version, 4, 1, f);
    Spool* s = new Spool();
    s->f = f;
    s->worker = std::thread([s] { s->run(); });
    return s;
}

// Enqueue one observable's bin (blocks only if the queue is full).
// kind: 0 = real f64, 1 = complex interleaved (data has 2x elements).
int spool_write(void* handle, const char* name, int64_t bin_idx, int kind,
                const int64_t* shape, int ndim, const double* data) {
    Spool* s = (Spool*)handle;
    if (!s || s->error) return -1;
    Record rec;
    rec.name = name;
    rec.bin_idx = bin_idx;
    rec.kind = (uint8_t)kind;
    rec.shape.assign(shape, shape + ndim);
    int64_t n = 1;
    for (int i = 0; i < ndim; ++i) n *= shape[i];
    if (kind == 1) n *= 2;
    rec.data.assign(data, data + n);
    {
        std::unique_lock<std::mutex> lk(s->mu);
        s->cv_push.wait(lk, [&] { return s->queue.size() < s->max_queue; });
        s->queue.push_back(std::move(rec));
        s->cv_pop.notify_one();
    }
    return 0;
}

// Block until everything queued so far is on disk.
int spool_flush(void* handle) {
    Spool* s = (Spool*)handle;
    if (!s) return -1;
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv_push.wait(lk, [&] { return s->queue.empty(); });
    std::fflush(s->f);
    return s->error ? -1 : 0;
}

int spool_close(void* handle) {
    Spool* s = (Spool*)handle;
    if (!s) return -1;
    {
        std::unique_lock<std::mutex> lk(s->mu);
        s->closing = true;
        s->cv_pop.notify_all();
    }
    s->worker.join();
    int rc = s->error ? -1 : 0;
    std::fclose(s->f);
    delete s;
    return rc;
}

}  // extern "C"
