// fluc C ABI — concurrency primitives + bandwidth meter.
//
// The native substrate of the framework's runtime (reference: fluc
// flu-codec-sdk). Exposed as a plain C ABI for ctypes binding; the bwmeter
// is the process-global read-bandwidth estimator the downloader feeds
// (reference fluc_bwmeter_base.c): windowed raw measurements (window closes
// at >=100 ms or >=64 KiB, forced at 500 ms) smoothed with an asymmetric
// EWMA (rise 0.2, fall 1.0) so the estimate is a conservative
// minimum-available-bandwidth signal.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <mutex>

#include "fluc_threads.hpp"

using Clock = std::chrono::steady_clock;

namespace {

double now_seconds() {
  return std::chrono::duration<double>(Clock::now().time_since_epoch())
      .count();
}

struct BwMeter {
  fluc::Mutex lock;
  int sessions FLU_GUARDED_BY(lock) = 0;
  double window_start FLU_GUARDED_BY(lock) = 0;
  uint64_t window_bytes FLU_GUARDED_BY(lock) = 0;
  double raw_bps FLU_GUARDED_BY(lock) = 0;
  double avg_bps FLU_GUARDED_BY(lock) = 0;
  uint64_t total_bytes FLU_GUARDED_BY(lock) = 0;
  bool have_avg FLU_GUARDED_BY(lock) = false;

  static constexpr double kMinWindowSec = 0.1;
  static constexpr double kForceWindowSec = 0.5;
  static constexpr uint64_t kMinWindowBytes = 64 * 1024;
  static constexpr double kRiseAlpha = 0.2;  // slow to trust increases
  static constexpr double kFallAlpha = 1.0;  // instant on decreases

  void session_start() {
    lock.lock();
    if (sessions++ == 0) {
      window_start = now_seconds();
      window_bytes = 0;
    }
    lock.unlock();
  }

  void session_end() {
    lock.lock();
    if (sessions > 0) sessions--;
    lock.unlock();
  }

  void data(uint64_t bytes) {
    lock.lock();
    double now = now_seconds();
    if (window_start == 0) window_start = now;
    window_bytes += bytes;
    total_bytes += bytes;
    double elapsed = now - window_start;
    bool window_done =
        (elapsed >= kMinWindowSec && window_bytes >= kMinWindowBytes) ||
        elapsed >= kForceWindowSec;
    if (window_done && elapsed > 0) {
      raw_bps = (double)window_bytes * 8.0 / elapsed;
      double alpha = (!have_avg) ? 1.0
                     : (raw_bps > avg_bps ? kRiseAlpha : kFallAlpha);
      avg_bps = avg_bps + alpha * (raw_bps - avg_bps);
      have_avg = true;
      window_start = now;
      window_bytes = 0;
    }
    lock.unlock();
  }

  void get(double* raw, double* avg, uint64_t* total) {
    lock.lock();
    if (raw) *raw = raw_bps;
    if (avg) *avg = avg_bps;
    if (total) *total = total_bytes;
    lock.unlock();
  }
};

BwMeter g_bwmeter;  // process-global singleton (fluc_bwmeter.c:25-48)

}  // namespace

extern "C" {

// ---- mutex -----------------------------------------------------------------
void* flu_mutex_new() { return new fluc::Mutex(); }
void flu_mutex_lock(void* m) { static_cast<fluc::Mutex*>(m)->lock(); }
void flu_mutex_unlock(void* m) { static_cast<fluc::Mutex*>(m)->unlock(); }
int flu_mutex_trylock(void* m) {
  return static_cast<fluc::Mutex*>(m)->try_lock() ? 1 : 0;
}
void flu_mutex_free(void* m) { delete static_cast<fluc::Mutex*>(m); }

// ---- monitor ---------------------------------------------------------------
void* flu_monitor_new() { return new fluc::Monitor(); }
void flu_monitor_lock(void* m) { static_cast<fluc::Monitor*>(m)->lock(); }
void flu_monitor_unlock(void* m) { static_cast<fluc::Monitor*>(m)->unlock(); }
void flu_monitor_wait(void* m) { static_cast<fluc::Monitor*>(m)->wait(); }
int flu_monitor_wait_ms(void* m, long ms) {
  return static_cast<fluc::Monitor*>(m)->wait_for_ms(ms) ? 1 : 0;
}
void flu_monitor_signal(void* m) { static_cast<fluc::Monitor*>(m)->signal(); }
void flu_monitor_broadcast(void* m) {
  static_cast<fluc::Monitor*>(m)->broadcast();
}
void flu_monitor_free(void* m) { delete static_cast<fluc::Monitor*>(m); }

// ---- barrier ---------------------------------------------------------------
void* flu_barrier_new(int open) { return new fluc::Barrier(open != 0); }
void flu_barrier_set_open(void* b, int open) {
  static_cast<fluc::Barrier*>(b)->set_open(open != 0);
}
int flu_barrier_is_open(void* b) {
  return static_cast<fluc::Barrier*>(b)->is_open() ? 1 : 0;
}
void flu_barrier_pass(void* b) { static_cast<fluc::Barrier*>(b)->pass(); }
int flu_barrier_trypass_ms(void* b, long ms) {
  return static_cast<fluc::Barrier*>(b)->trypass_for_ms(ms) ? 1 : 0;
}
void flu_barrier_free(void* b) { delete static_cast<fluc::Barrier*>(b); }

// ---- bwmeter (global singleton) -------------------------------------------
void flu_bwmeter_session_start() { g_bwmeter.session_start(); }
void flu_bwmeter_session_end() { g_bwmeter.session_end(); }
void flu_bwmeter_data(uint64_t bytes) { g_bwmeter.data(bytes); }
void flu_bwmeter_get(double* raw_bps, double* avg_bps, uint64_t* total) {
  g_bwmeter.get(raw_bps, avg_bps, total);
}

// ---- bwmeter sock variant --------------------------------------------------
// Per-connection instance meters (reference fluc_bwmeter_sock.c:14-35): the
// same windowed base machinery as the singleton, but instantiable so one
// socket's reads can be measured in isolation from global traffic.
void* flu_bwmeter_sock_new() { return new BwMeter(); }
void flu_bwmeter_sock_free(void* m) { delete static_cast<BwMeter*>(m); }
void flu_bwmeter_sock_start(void* m) {
  static_cast<BwMeter*>(m)->session_start();
}
void flu_bwmeter_sock_end(void* m) {
  static_cast<BwMeter*>(m)->session_end();
}
void flu_bwmeter_sock_data(void* m, uint64_t bytes) {
  static_cast<BwMeter*>(m)->data(bytes);
}
void flu_bwmeter_sock_get(void* m, double* raw_bps, double* avg_bps,
                          uint64_t* total) {
  static_cast<BwMeter*>(m)->get(raw_bps, avg_bps, total);
}

}  // extern "C"
