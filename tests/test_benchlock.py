"""Measurement-infrastructure contracts (round 5): the TPU-measurement
flock, the cpu_busy flag lifecycle, and the link-health gate thresholds.
These protect the capture hygiene the perf record now depends on."""

import json
import os
import subprocess
import sys
import time

import pytest

from flutpu.benchlock import hold_cpu_busy, hold_tpu_lock


class TestTpuLock:
    def test_acquires_and_releases(self, tmp_path):
        path = str(tmp_path / "lock")
        env_off = {k: os.environ.pop(k, None)
                   for k in ("FLUTPU_CPU", "JAX_PLATFORMS",
                             "FLUTPU_TPU_LOCK_HELD")}
        try:
            with hold_tpu_lock("t", timeout_s=1.0, path=path,
                               quiet=True) as got:
                assert got is True
                assert os.path.exists(path)
            # released: a second holder acquires instantly
            t0 = time.time()
            with hold_tpu_lock("t2", timeout_s=5.0, path=path,
                               quiet=True) as got:
                assert got is True
            assert time.time() - t0 < 1.0
        finally:
            for k, v in env_off.items():
                if v is not None:
                    os.environ[k] = v

    def test_bounded_wait_proceeds_on_contention(self, tmp_path):
        path = str(tmp_path / "lock")
        env_off = {k: os.environ.pop(k, None)
                   for k in ("FLUTPU_CPU", "JAX_PLATFORMS",
                             "FLUTPU_TPU_LOCK_HELD")}
        try:
            # a child process holds the lock (flock is per-process)
            child = subprocess.Popen(
                [sys.executable, "-c",
                 "import fcntl, os, sys, time;"
                 f"fd = os.open({path!r}, os.O_CREAT | os.O_RDWR);"
                 "fcntl.flock(fd, fcntl.LOCK_EX);"
                 "print('held', flush=True); time.sleep(30)"],
                stdout=subprocess.PIPE, text=True)
            try:
                assert child.stdout.readline().strip() == "held"
                t0 = time.time()
                with hold_tpu_lock("t", timeout_s=1.5, path=path,
                                   quiet=True) as got:
                    assert got is False       # expired, proceeds anyway
                dt = time.time() - t0
                assert 1.0 <= dt < 10.0
            finally:
                child.kill()
                child.wait()
        finally:
            for k, v in env_off.items():
                if v is not None:
                    os.environ[k] = v

    def test_env_short_circuits(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FLUTPU_TPU_LOCK_HELD", "1")
        with hold_tpu_lock("t", timeout_s=0.1,
                           path=str(tmp_path / "x")) as got:
            assert got is True
        assert not os.path.exists(tmp_path / "x")  # never touched


class TestCpuBusy:
    def test_creates_and_removes_only_own_flag(self, monkeypatch,
                                               tmp_path):
        import flutpu.benchlock as bl
        flag = str(tmp_path / "busy")
        monkeypatch.setattr(bl, "CPU_BUSY_PATH", flag)
        with bl.hold_cpu_busy():
            assert os.path.exists(flag)
        assert not os.path.exists(flag)
        # pre-existing flag (another holder): joined, NOT removed
        open(flag, "w").write("123\n")
        old_mtime = os.path.getmtime(flag) - 10
        os.utime(flag, (old_mtime, old_mtime))
        with bl.hold_cpu_busy():
            assert os.path.exists(flag)
            # mtime refreshed so age-based staleness sees a live holder
            assert os.path.getmtime(flag) > old_mtime
        assert os.path.exists(flag)
        os.remove(flag)


class TestLinkHealthGate:
    def test_thresholds(self):
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benches"))
        import linkhealth
        ok, _ = linkhealth.is_healthy(
            {"warm_rtt_ms": 30.0, "warm_compute_ms": 30.0,
             "fetch_mbps": 45.0})
        assert ok
        for bad in ({"warm_rtt_ms": 500.0, "warm_compute_ms": 30.0,
                     "fetch_mbps": 45.0},
                    {"warm_rtt_ms": 30.0, "warm_compute_ms": 900.0,
                     "fetch_mbps": 45.0},
                    {"warm_rtt_ms": 30.0, "warm_compute_ms": 30.0,
                     "fetch_mbps": 5.0}):
            ok, _ = linkhealth.is_healthy(bad)
            assert not ok, bad
