"""Live RGB-D capture interface (stub).

The reference optionally captures from an Asus Xtion via OpenNI2
(ref: src/Tool/OpenNIReader.{h,cpp}, guarded by -DWITH_OPENNI2). Live
capture hardware is out of scope in this environment (SURVEY §2.1 marks it
offline-only); the interface is kept so a sensor backend can slot in.
"""

from __future__ import annotations


class LiveRGBDReader:
    """Interface matching OpenNIReader::Init/GetNextRGBD (ref: OpenNIReader.h:16+)."""

    def init(self) -> bool:  # pragma: no cover - requires hardware
        raise NotImplementedError(
            "Live capture requires an OpenNI2-compatible sensor; this "
            "environment is offline-only. Use TumSequence/ScanNetSequence "
            "or the synthetic renderer instead."
        )

    def get_next_rgbd(self):  # pragma: no cover - requires hardware
        raise NotImplementedError
