"""Native C++ RGB-D loader vs imageio ground truth (round-trip on temp PNGs).

Covers onepiece_tpu/native/rgbd_loader.cpp (libpng decode + prefetch ring)
and the TumSequence native decode path (io/tum.py), the rebuild of the
reference's cv::imread frame loop (ref: src/Tool/IO.cpp:59-108).
"""

import os

import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")


@pytest.fixture(scope="module")
def png_pairs(tmp_path_factory):
    d = tmp_path_factory.mktemp("tumseq")
    os.makedirs(d / "depth")
    os.makedirs(d / "rgb")
    rng = np.random.default_rng(0)
    pairs, truth = [], []
    for i in range(6):
        depth = rng.integers(0, 20000, (48, 64)).astype(np.uint16)
        rgb = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        dp = str(d / "depth" / f"{i}.png")
        cp = str(d / "rgb" / f"{i}.png")
        imageio.imwrite(dp, depth)
        imageio.imwrite(cp, rgb)
        pairs.append((dp, cp))
        truth.append((depth, rgb))
    return pairs, truth


def test_prefetching_loader_rgb(png_pairs):
    from onepiece_tpu.io.native_loader import PrefetchingRGBDLoader

    pairs, truth = png_pairs
    ld = PrefetchingRGBDLoader(pairs, depth_scale=5000.0, gray=False,
                               n_threads=2, ring=3)
    assert ld._native is not None, "native loader failed to build"
    n = 0
    for (dm, c), (td, tc) in zip(ld, truth):
        assert np.allclose(dm, td.astype(np.float32) / 5000.0)
        assert np.allclose(c, tc.astype(np.float32) / 255.0)
        n += 1
    assert n == len(pairs)


def test_prefetching_loader_gray(png_pairs):
    from onepiece_tpu.io.native_loader import PrefetchingRGBDLoader

    pairs, truth = png_pairs
    ld = PrefetchingRGBDLoader(pairs, gray=True, n_threads=3, ring=2)
    for (dm, g), (td, tc) in zip(ld, truth):
        t64 = tc.astype(np.int64)
        lum = (299 * t64[..., 0] + 587 * t64[..., 1] + 114 * t64[..., 2]) // 1000
        assert np.abs(g * 255 - lum).max() <= 1.0


def test_tum_sequence_native_decode(png_pairs, tmp_path):
    # minimal TUM layout around the same PNGs
    pairs, truth = png_pairs
    root = tmp_path / "seq"
    os.makedirs(root)
    with open(root / "associate.txt", "w") as f:
        for i, (dp, cp) in enumerate(pairs):
            f.write(f"{i/30.0} {cp} {i/30.0} {dp}\n")
    from onepiece_tpu.io.tum import TumSequence

    seq = TumSequence(str(root))
    assert len(seq) == len(pairs)
    ts, rgb, depth = seq[2]
    td, tc = truth[2]
    assert np.array_equal(rgb, tc)
    assert np.allclose(depth, td.astype(np.float32) / 5000.0)
    # prefetching stream over the same sequence
    got = list(seq.stream(gray=False))
    assert len(got) == len(pairs)
    assert np.allclose(got[4][0], truth[4][0].astype(np.float32) / 5000.0)
