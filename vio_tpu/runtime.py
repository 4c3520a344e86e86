"""Measurement runtime: native (C++) pairing queue with Python fallback.

The native module (native/vio_native.cpp, built by native/build.py) is the
framework's System-runtime equivalent (reference: vins-mono/src/System.cpp
queues/pairing/threads).  This wrapper loads it when built and otherwise
provides a drop-in pure-Python implementation with identical semantics,
so the framework works before the extension is compiled.
"""
from __future__ import annotations

import collections


def load_native():
    try:
        import vio_native
        return vio_native
    except ImportError:
        return None


class PyMeasurementPairer:
    """Pure-Python fallback with the same behavior as
    vio_native.MeasurementPairer (single-threaded use)."""

    def __init__(self):
        self._imu = collections.deque()
        self._frames = collections.deque()
        self._last = None
        self._stats = dict(imu_pushed=0, frames_pushed=0, imu_disorder=0,
                           frame_disorder=0)

    def push_imu(self, t, ax, ay, az, gx, gy, gz):
        if self._imu and t <= self._imu[-1][0]:
            self._stats["imu_disorder"] += 1
            return False
        self._imu.append((t, ax, ay, az, gx, gy, gz))
        self._stats["imu_pushed"] += 1
        return True

    def push_frame(self, t, handle):
        if self._frames and t < self._frames[-1][0]:
            self._stats["frame_disorder"] += 1
            return False
        self._frames.append((t, handle))
        self._stats["frames_pushed"] += 1
        return True

    def next(self, wait=False):
        if not self._frames or not self._imu or \
                self._imu[-1][0] < self._frames[0][0]:
            return None
        ft, handle = self._frames.popleft()
        rows = []
        prev = self._last
        while self._imu and self._imu[0][0] <= ft:
            prev = self._imu.popleft()
            rows.append(prev)
        if self._imu and prev is not None and prev[0] < ft:
            nxt = self._imu[0]
            w = (ft - prev[0]) / (nxt[0] - prev[0])
            row = tuple([ft] + [(1 - w) * prev[i] + w * nxt[i]
                                for i in range(1, 7)])
            rows.append(row)
            self._last = row
        elif rows:
            self._last = rows[-1]
        return ft, handle, rows

    def stats(self):
        s = dict(self._stats)
        s["imu_queued"] = len(self._imu)
        s["frames_queued"] = len(self._frames)
        return s

    def close(self):
        pass


def make_pairer():
    """Native pairing queue if built, Python fallback otherwise."""
    native = load_native()
    if native is not None:
        return native.MeasurementPairer()
    return PyMeasurementPairer()
