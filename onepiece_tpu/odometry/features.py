"""ORB-style feature detection & description in pure JAX.

The reference outsources its sparse front end to OpenCV's ORB
(ref: src/Odometry/Odometry.cpp:368-379 detectAndCompute); this framework
implements the FAST + orientation + steered-BRIEF pipeline natively so the
whole front end runs on device. Descriptors are only ever matched against
descriptors produced by this same module, so instead of transcribing
OpenCV's learned bit_pattern_31_, the 256 BRIEF point pairs are drawn once
from a seeded Gaussian (the original BRIEF recipe) — self-consistent and
copyright-clean.

Design notes (TPU-first):
  - FAST's 16-pixel Bresenham circle test uses 16 static `jnp.roll`s of the
    whole image — no gathers; the >=9-contiguous-arc test is a rolling-window
    sum over a 16-bit ring.
  - Orientation is the intensity-centroid angle; the patch moments m10/m01
    are two depthwise convolutions evaluated densely, then read at keypoints.
  - Keypoint selection is one global top-k over the NMS'd score map —
    fixed K output with a validity mask (static shapes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import image as image_ops

FAST_RADIUS = 3
# Bresenham circle of radius 3: 16 offsets in clockwise order
FAST_OFFSETS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-3 + 2, -3 + 0),
    ],
    np.int32,
)
# fix last entry: proper circle is (-1,-3)
FAST_OFFSETS[15] = (-1, -3)

PATCH_RADIUS = 15  # orientation patch (31x31), like ORB
BRIEF_BITS = 256


class Keypoints(NamedTuple):
    uv: jax.Array  # (K, 2) float32 pixel coords [u, v]
    score: jax.Array  # (K,)
    angle: jax.Array  # (K,) radians
    desc: jax.Array  # (K, 8) uint32 packed 256-bit descriptors
    valid: jax.Array  # (K,) bool


def _brief_pattern(seed: int = 7) -> np.ndarray:
    """(256, 2, 2) int32 point-pair offsets (dy, dx), Gaussian sigma = patch/5,
    clipped to the 31x31 patch (original BRIEF G-II sampling)."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(scale=sigma, size=(BRIEF_BITS, 2, 2))
    return np.clip(np.round(pts), -(PATCH_RADIUS - 2), PATCH_RADIUS - 2).astype(np.int32)


BRIEF_PATTERN = _brief_pattern()


def _fast_response(gray: jax.Array, threshold: float) -> jax.Array:
    """FAST-9/16 corner response map (0 where not a corner).

    The ring lives CHANNELS-FIRST (16, H, W): with the 16 ring taps on the
    minor axis the array tiles as 16-of-128 lanes (87% of the VPU idle and
    8x the HBM footprint); with W on the lanes every op below is a full-
    width pass and the 16/24-step reductions run along the cheap major
    axis.
    """
    center = gray
    ring = jnp.stack(
        [jnp.roll(gray, (-int(dy), -int(dx)), axis=(0, 1)) for dx, dy in FAST_OFFSETS],
        axis=0,
    )  # ring[i, y, x] = gray[y + dy_i, x + dx_i]
    diff = ring - center[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def arc9(mask):
        # rolling window: count of consecutive Trues >= 9 on the 16-ring
        ext = jnp.concatenate([mask, mask[:8]], axis=0).astype(jnp.int32)
        c = jnp.cumsum(ext, axis=0)
        win = c[8:] - jnp.concatenate(
            [jnp.zeros_like(c[:1]), c[:-9]], axis=0
        )
        return jnp.max(win, axis=0) >= 9

    is_corner = arc9(brighter) | arc9(darker)
    score = jnp.maximum(
        jnp.sum(jnp.where(brighter, diff - threshold, 0.0), axis=0),
        jnp.sum(jnp.where(darker, -diff - threshold, 0.0), axis=0),
    )
    return jnp.where(is_corner, score, 0.0)


def _nms(score: jax.Array, radius: int = 1) -> jax.Array:
    """(2r+1)^2 non-max suppression, separable: max-filter rows then
    columns ((2r+1)^2-1 rolls -> 4r rolls; the square window's max
    factorises exactly)."""
    mx = score
    for d in range(1, radius + 1):
        mx = jnp.maximum(mx, jnp.maximum(
            jnp.roll(score, d, axis=1), jnp.roll(score, -d, axis=1)))
    m = mx
    for d in range(1, radius + 1):
        m = jnp.maximum(m, jnp.maximum(
            jnp.roll(mx, d, axis=0), jnp.roll(mx, -d, axis=0)))
    return jnp.where(score >= m, score, 0.0)


NUM_ANGLE_BINS = 30  # steered-BRIEF orientation discretisation (12 deg)
_P = 2 * PATCH_RADIUS + 1  # 31

# moment masks for the intensity-centroid orientation, applied to the
# gathered patch (not as dense image convs — two 961-tap convolutions per
# frame cost more than the whole detector)
_ys, _xs = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
_disk = (_xs**2 + _ys**2) <= PATCH_RADIUS * PATCH_RADIUS
_KX = (_xs * _disk).astype(np.float32)
_KY = (_ys * _disk).astype(np.float32)


def _build_brief_selector() -> np.ndarray:
    """(P*P, NUM_ANGLE_BINS * 512) one-hot: column (b*512 + s) reads the
    patch pixel of BRIEF tap s rotated by angle bin b. Lets the steered
    sampling run as ONE patch x selector matmul on the MXU instead of
    512 data-dependent gathers per keypoint."""
    sel = np.zeros((NUM_ANGLE_BINS, BRIEF_BITS * 2, _P * _P), np.float32)
    for b in range(NUM_ANGLE_BINS):
        ang = 2.0 * np.pi * b / NUM_ANGLE_BINS
        ca, sa = np.cos(ang), np.sin(ang)
        for s in range(BRIEF_BITS):
            for pt in range(2):
                dy, dx = BRIEF_PATTERN[s, pt]
                rx = int(np.clip(np.round(ca * dx - sa * dy), -PATCH_RADIUS + 1, PATCH_RADIUS - 1))
                ry = int(np.clip(np.round(sa * dx + ca * dy), -PATCH_RADIUS + 1, PATCH_RADIUS - 1))
                sel[b, s * 2 + pt, (ry + PATCH_RADIUS) * _P + (rx + PATCH_RADIUS)] = 1.0
    return sel.reshape(NUM_ANGLE_BINS * BRIEF_BITS * 2, _P * _P).T.copy()


_BRIEF_SELECTOR = _build_brief_selector()  # (961, 30*512)

# The orientation moments m10/m01 are two more linear functionals of the
# same patch — append them as two extra columns so ONE matmul produces
# every per-keypoint reduction (taps + moments). The matmul runs in
# bfloat16: patch intensities are 8-bit-quantised images and the selector
# is one-hot, so tap values are exact in bf16; the moment columns sum ~700
# terms and keep ~2 decimal digits, far inside the arctan2 bin width
# (12 deg) the angle is quantised to anyway.
_BRIEF_SELECTOR_M = np.concatenate(
    [_BRIEF_SELECTOR, _KX.reshape(-1, 1), _KY.reshape(-1, 1)], axis=1
)  # (961, 30*512 + 2)


def _gather_patches(img: jax.Array, sx: jax.Array, sy: jax.Array) -> jax.Array:
    """(K,) int keypoint coords -> (K, 31, 31) patches. 31 row-gathers.

    Gather cost on TPU is per-INDEX (see odometry/dense.py's pre-warp):
    packing each pixel's 31-wide x-window into row channels turns the
    patch extraction into 31 gathers of K indices (31K total) instead of
    K*961 scalar gathers.
    """
    h, w = img.shape
    r = PATCH_RADIUS
    padded = jnp.pad(img, ((0, 0), (r, r)))
    rows = jnp.stack(
        [padded[:, i : i + w] for i in range(_P)], axis=-1
    ).reshape(h * w, _P)  # rows[v*w+u] = img[v, u-r : u+r+1]
    out = []
    for dy in range(-r, r + 1):
        idx = (sy + dy) * w + sx
        out.append(rows[idx])  # (K, 31)
    return jnp.stack(out, axis=1)  # (K, 31, 31)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius"))
def detect_and_describe(
    gray: jax.Array,  # (H, W) float in [0, 1]
    max_keypoints: int = 1000,
    threshold: float = 0.08,
    nms_radius: int = 2,
) -> Keypoints:
    """FAST-9 + intensity-centroid orientation + steered BRIEF-256."""
    h, w = gray.shape
    resp = _fast_response(gray, threshold)
    # kill the border where ring/patch sampling would wrap
    border = PATCH_RADIUS + 1
    vmask = jnp.zeros((h, w), bool).at[border : h - border, border : w - border].set(True)
    resp = jnp.where(vmask, resp, 0.0)
    resp = _nms(resp, nms_radius)

    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, max_keypoints)
    vy = (idx // w).astype(jnp.float32)
    vx = (idx % w).astype(jnp.float32)
    uv = jnp.stack([vx, vy], axis=-1)
    valid = score > 0.0

    # ONE patch gather feeds both the orientation moments and the BRIEF
    # taps; the blurred image serves both (BRIEF smoothing as in ORB, and
    # orientation from the same patch — only cross-frame consistency of
    # the angle matters, which blurring preserves).
    blurred = image_ops.gaussian_blur(gray)
    sx = idx % w
    sy = idx // w
    patches = _gather_patches(blurred, sx, sy)  # (K, 31, 31)

    # steered BRIEF + orientation moments: ONE bf16 MXU matmul produces all
    # 30 angle bins' taps AND m10/m01 (the two trailing selector columns),
    # then a one-hot bin select — zero data-dependent gathers
    allred = jax.lax.dot_general(
        patches.reshape(-1, _P * _P).astype(jnp.bfloat16),
        jnp.asarray(_BRIEF_SELECTOR_M, jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m10 = allred[:, -2]
    m01 = allred[:, -1]
    angle = jnp.arctan2(m01, m10)
    abin = jnp.round(angle / (2.0 * np.pi / NUM_ANGLE_BINS)).astype(jnp.int32) % NUM_ANGLE_BINS
    taps_all = allred[:, :-2].reshape(-1, NUM_ANGLE_BINS, BRIEF_BITS * 2)
    onehot = (abin[:, None] == jnp.arange(NUM_ANGLE_BINS)[None]).astype(jnp.float32)
    samples = jnp.einsum("kbs,kb->ks", taps_all, onehot).reshape(-1, BRIEF_BITS, 2)
    bits = samples[..., 0] < samples[..., 1]  # (K, 256)

    weights = jnp.asarray((1 << np.arange(32)).astype(np.int64) % (1 << 32), jnp.uint32)
    packed = jnp.sum(
        bits.reshape(-1, 8, 32).astype(jnp.uint32) * weights[None, None, :], axis=-1,
        dtype=jnp.uint32,
    )
    return Keypoints(uv, score, angle, packed, valid)
