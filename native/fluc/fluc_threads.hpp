// fluc threads — annotated concurrency primitives (C++).
//
// Rebuild of the reference's fluc SDK (libs/fluc/flu-codec-sdk/fluc/threads):
// mutex / recursive mutex / monitor (mutex+condvar) / barrier (open-closed
// gate with pass / trypass_for / trypass_until), carrying Clang
// thread-safety-analysis capability annotations so -Wthread-safety gives
// compile-time lock-discipline checking (the reference's race-detection
// strategy, fluc_mutex.h:16-38).

#pragma once

#include <chrono>
#include <condition_variable>
#include <mutex>

#if defined(__clang__)
#define FLU_TSA(x) __attribute__((x))
#else
#define FLU_TSA(x)
#endif

#define FLU_CAPABILITY(x) FLU_TSA(capability(x))
#define FLU_GUARDED_BY(x) FLU_TSA(guarded_by(x))
#define FLU_REQUIRES(...) FLU_TSA(requires_capability(__VA_ARGS__))
#define FLU_ACQUIRE(...) FLU_TSA(acquire_capability(__VA_ARGS__))
#define FLU_RELEASE(...) FLU_TSA(release_capability(__VA_ARGS__))
#define FLU_EXCLUDES(...) FLU_TSA(locks_excluded(__VA_ARGS__))
#define FLU_NO_TSA FLU_TSA(no_thread_safety_analysis)

namespace fluc {

class FLU_CAPABILITY("mutex") Mutex {
 public:
  void lock() FLU_ACQUIRE() { m_.lock(); }
  void unlock() FLU_RELEASE() { m_.unlock(); }
  bool try_lock() FLU_TSA(try_acquire_capability(true)) {
    return m_.try_lock();
  }
  std::mutex& native() { return m_; }

 private:
  std::mutex m_;
};

class FLU_CAPABILITY("mutex") RecMutex {
 public:
  void lock() FLU_ACQUIRE() { m_.lock(); }
  void unlock() FLU_RELEASE() { m_.unlock(); }

 private:
  std::recursive_mutex m_;
};

// Monitor: mutex + condition variable pair (reference fluc_monitor.c).
class Monitor {
 public:
  void lock() { m_.lock(); }
  void unlock() { m_.unlock(); }
  void wait() {
    std::unique_lock<std::mutex> lk(m_.native(), std::adopt_lock);
    cv_.wait(lk);
    lk.release();
  }
  bool wait_for_ms(long ms) {
    std::unique_lock<std::mutex> lk(m_.native(), std::adopt_lock);
    auto st = cv_.wait_for(lk, std::chrono::milliseconds(ms));
    lk.release();
    return st == std::cv_status::no_timeout;
  }
  void signal() { cv_.notify_one(); }
  void broadcast() { cv_.notify_all(); }

 private:
  Mutex m_;
  std::condition_variable cv_;
};

// Barrier: an open/closed gate. Threads `pass()` freely while open and
// block while closed (reference fluc_barrier.c:34-88 — used by the
// downloader's pause/resume).
class Barrier {
 public:
  explicit Barrier(bool open) : open_(open) {}

  void set_open(bool open) {
    {
      std::lock_guard<std::mutex> lk(m_);
      open_ = open;
    }
    if (open) cv_.notify_all();
  }

  bool is_open() {
    std::lock_guard<std::mutex> lk(m_);
    return open_;
  }

  void pass() {
    std::unique_lock<std::mutex> lk(m_);
    cv_.wait(lk, [this] { return open_; });
  }

  // Returns true if passed, false on timeout.
  bool trypass_for_ms(long ms) {
    std::unique_lock<std::mutex> lk(m_);
    return cv_.wait_for(lk, std::chrono::milliseconds(ms),
                        [this] { return open_; });
  }

 private:
  std::mutex m_;
  std::condition_variable cv_;
  bool open_;
};

}  // namespace fluc
