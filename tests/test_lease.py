"""Worker lease (T9): busy/steal/release semantics mirroring the
reference's listener keep-alive (listeners.py:56-153,126-153)."""

import json
import time

import pytest

from qvarn_mr_spark.streaming.lease import BusyWorkerError, WorkerLease


def test_acquire_and_busy(tmp_path):
    a = WorkerLease(str(tmp_path), signature="host-a/1")
    b = WorkerLease(str(tmp_path), signature="host-b/2")
    a.acquire()
    with pytest.raises(BusyWorkerError, match="host-a/1"):
        b.acquire()
    # re-acquire by the same owner is fine (restart with same pid/host)
    a.acquire()


def test_steal_after_timeout(tmp_path):
    a = WorkerLease(str(tmp_path), timeout=0.05, signature="host-a/1")
    b = WorkerLease(str(tmp_path), timeout=0.05, signature="host-b/2")
    a.acquire()
    time.sleep(0.1)
    b.acquire()                      # stale lease is taken over
    # the original holder's next keep_alive sees the live thief and raises
    with pytest.raises(BusyWorkerError, match="host-b/2"):
        a.keep_alive()


def test_release_frees_immediately(tmp_path):
    a = WorkerLease(str(tmp_path), signature="host-a/1")
    b = WorkerLease(str(tmp_path), signature="host-b/2")
    with a:
        with pytest.raises(BusyWorkerError):
            b.acquire()
    b.acquire()                      # no timeout wait after clean release


def test_keep_alive_refreshes_timestamp(tmp_path):
    a = WorkerLease(str(tmp_path), interval=0.0, signature="host-a/1")
    a.acquire()
    with open(a.path) as f:
        t1 = json.load(f)["timestamp"]
    time.sleep(0.02)
    a.keep_alive()
    with open(a.path) as f:
        t2 = json.load(f)["timestamp"]
    assert t2 > t1


def test_release_by_non_owner_is_noop(tmp_path):
    a = WorkerLease(str(tmp_path), signature="host-a/1")
    b = WorkerLease(str(tmp_path), signature="host-b/2")
    a.acquire()
    b.release()                      # not the owner: must not clear
    with pytest.raises(BusyWorkerError):
        b.acquire()
