"""Live RGB-D capture interface with a sensor-rate replay backend.

The reference optionally captures from an Asus Xtion via OpenNI2
(ref: src/Tool/OpenNIReader.{h,cpp}, guarded by -DWITH_OPENNI2; consumed
by example/AcquireLiveData.cpp). No capture hardware exists in this
environment, but the LIVE-pipeline semantics the reader provides — frames
arrive on the sensor's clock, a blocking `get_next_rgbd` that returns the
newest frame or None when the stream ends — are what downstream systems
program against. `ReplayRGBDReader` implements exactly that contract by
replaying a TUM-format directory at a chosen rate, so live-loop drivers
(e.g. tools/acquire_live_data.py) are testable end to end; a real OpenNI2
backend can implement the same 3-method interface.
"""

from __future__ import annotations

import time


class LiveRGBDReader:
    """Interface matching OpenNIReader::Init/GetNextRGBD (ref: OpenNIReader.h:16+)."""

    def init(self) -> bool:  # pragma: no cover - requires hardware
        raise NotImplementedError(
            "Live capture requires an OpenNI2-compatible sensor; this "
            "environment is offline-only. Use ReplayRGBDReader, "
            "TumSequence/ScanNetSequence, or the synthetic renderer."
        )

    def get_next_rgbd(self):  # pragma: no cover - requires hardware
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - requires hardware
        pass


class ReplayRGBDReader(LiveRGBDReader):
    """Sensor-rate replay of a TUM-format directory as a live stream.

    `get_next_rgbd()` blocks until the next frame is 'due' on the replay
    clock (rate_hz), then returns (timestamp, rgb (H, W, 3) uint8,
    depth (H, W) f32 meters); returns None when the sequence ends —
    the same consumption pattern as the reference's live loop
    (ref: example/AcquireLiveData.cpp).
    """

    def __init__(self, root: str, rate_hz: float = 30.0, max_frames: int | None = None):
        self.root = root
        self.rate_hz = rate_hz
        self.max_frames = max_frames
        self._seq = None
        self._i = 0
        self._t0 = 0.0

    def init(self) -> bool:
        from .tum import TumSequence

        self._seq = TumSequence(self.root, max_frames=self.max_frames)
        self._i = 0
        self._t0 = time.monotonic()
        return len(self._seq) > 0

    def get_next_rgbd(self):
        if self._seq is None or self._i >= len(self._seq):
            return None
        due = self._t0 + self._i / self.rate_hz
        delay = due - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        ts, rgb, depth = self._seq[self._i]
        self._i += 1
        return ts, rgb, depth

    def close(self) -> None:
        self._seq = None
