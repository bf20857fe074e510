#!/usr/bin/env python
"""Turntable render: a rotating-view PNG sequence (+ optional GIF) of a
reconstructed mesh.

Closes the offline-demo gap of the Pangolin viewer (ref:
src/Visualization/Visualizer.cpp:8-88 interactive orbit + phong draw) for
the headless environment: the camera orbits the mesh centroid on a circle
and each view is rasterised with viz/render.py's z-buffered software
renderer. Also reachable as `tools/dense_fusion.py --turntable` /
`tools/fused_fusion.py --turntable`.

Usage: python tools/render_turntable.py mesh.ply --frames 24 --out-dir tt/
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """Camera-to-world with +z looking from eye toward target."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(upv, fwd)
    right /= np.linalg.norm(right)
    upo = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, upo, fwd, eye
    return T


def render_turntable(
    vertices: np.ndarray,
    faces: np.ndarray,
    out_dir: str,
    colors: np.ndarray | None = None,
    frames: int = 24,
    width: int = 640,
    height: int = 480,
    elevation: float = 0.35,
    gif: str | None = None,
    arc_deg: float = 360.0,
    start_deg: float = 0.0,
) -> list[str]:
    """Write `frames` orbit views of the mesh; returns the PNG paths.

    arc_deg < 360 sweeps a partial arc centred on start_deg and appends
    the reversed frames so the GIF ping-pongs smoothly (useful when the
    mesh is open on one side — e.g. a room scanned from within)."""
    from onepiece_tpu.geometry.camera import PinholeCamera
    from onepiece_tpu.viz.render import render_mesh, save_gray_png

    os.makedirs(out_dir, exist_ok=True)
    center = vertices.mean(axis=0)
    radius = 2.2 * float(np.abs(vertices - center).max())
    cam = PinholeCamera(
        fx=0.9 * width, fy=0.9 * width, cx=(width - 1) / 2.0,
        cy=(height - 1) / 2.0, width=width, height=height, depth_scale=1000.0,
    )
    paths = []
    images = []
    partial = arc_deg < 359.0
    for i in range(frames):
        if partial:
            s01 = i / max(frames - 1, 1)
            a = np.deg2rad(start_deg + (s01 - 0.5) * arc_deg)
        else:
            a = np.deg2rad(start_deg) + 2.0 * np.pi * i / frames
        eye = center + radius * np.array(
            [np.sin(a), -elevation, -np.cos(a)]
        )
        T_wc = look_at(eye, center)
        img = render_mesh(vertices, faces, cam, T_wc, colors=colors)
        path = os.path.join(out_dir, f"turntable_{i:03d}.png")
        _write_png_rgb(path, img)
        paths.append(path)
        images.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        print(f"  view {i + 1}/{frames} -> {path}", flush=True)
    if gif:
        seq = images + images[-2:0:-1] if partial else images
        _write_gif(gif, seq)
        print(f"gif -> {gif}")
    return paths


def _write_png_rgb(path: str, img: np.ndarray) -> None:
    """Minimal RGB PNG writer (no imageio dependency)."""
    import struct
    import zlib

    data = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    h, w, _ = data.shape
    raw = b"".join(b"\x00" + data[r].tobytes() for r in range(h))

    def chunk(tag, payload):
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def _write_gif(path: str, frames: list[np.ndarray], delay_cs: int = 8) -> None:
    """Minimal animated GIF writer (web-safe 6x6x6 palette, no deps)."""
    h, w, _ = frames[0].shape
    # 6-level-per-channel palette (216 colors)
    levels = np.array([0, 51, 102, 153, 204, 255], np.uint8)
    palette = bytearray()
    for r in levels:
        for g in levels:
            for b in levels:
                palette += bytes((r, g, b))
    palette += bytes(3 * (256 - 216))

    def quantise(img):
        q = np.clip((img.astype(np.int32) + 25) // 51, 0, 5)
        return (q[..., 0] * 36 + q[..., 1] * 6 + q[..., 2]).astype(np.uint8)

    def lzw_encode(indices: np.ndarray, min_code: int = 8) -> bytes:
        # simple LZW for GIF (clear-code resets keep the dict small)
        clear = 1 << min_code
        end = clear + 1
        out = bytearray()
        bitbuf = 0
        bits = 0

        def emit(code, size):
            nonlocal bitbuf, bits
            bitbuf |= code << bits
            bits += size
            while bits >= 8:
                out.append(bitbuf & 0xFF)
                bitbuf >>= 8
                bits -= 8

        table = {bytes((i,)): i for i in range(clear)}
        next_code = end + 1
        size = min_code + 1
        emit(clear, size)
        prev = b""
        for sym in indices.tobytes():
            cur = prev + bytes((sym,))
            if cur in table:
                prev = cur
            else:
                emit(table[prev], size)
                table[cur] = next_code
                next_code += 1
                if next_code == (1 << size) and size < 12:
                    size += 1
                elif next_code >= 4096:
                    emit(clear, size)
                    table = {bytes((i,)): i for i in range(clear)}
                    next_code = end + 1
                    size = min_code + 1
                prev = bytes((sym,))
        if prev:
            emit(table[prev], size)
        emit(end, size)
        if bits:
            out.append(bitbuf & 0xFF)
        return bytes(out)

    import struct

    with open(path, "wb") as f:
        f.write(b"GIF89a")
        f.write(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
        f.write(bytes(palette))
        f.write(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")  # loop forever
        for img in frames:
            f.write(b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00")
            f.write(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
            f.write(bytes((8,)))
            data = lzw_encode(quantise(img).reshape(-1))
            for i in range(0, len(data), 255):
                block = data[i : i + 255]
                f.write(bytes((len(block),)) + block)
            f.write(b"\x00")
        f.write(b"\x3b")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh", type=str, help="PLY mesh to orbit")
    ap.add_argument("--out-dir", type=str, default="turntable")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--gif", type=str, default="",
                    help="also write an animated GIF here")
    ap.add_argument("--arc", type=float, default=360.0,
                    help="sweep arc in degrees (partial arcs ping-pong)")
    ap.add_argument("--start", type=float, default=0.0,
                    help="arc centre / orbit start angle in degrees")
    ap.add_argument("--gain", type=float, default=1.0,
                    help="brightness gain applied to vertex colors")
    ap.add_argument("--shaded-only", action="store_true",
                    help="ignore vertex colors (geometry inspection)")
    args = ap.parse_args()

    from onepiece_tpu.io.ply import read_ply

    mesh = read_ply(args.mesh)
    verts = np.asarray(mesh["vertices"])
    faces = np.asarray(mesh["faces"])
    colors = mesh.get("colors")
    if args.shaded_only:
        colors = None
    elif colors is not None and args.gain != 1.0:
        colors = np.clip(np.asarray(colors) * args.gain, 0.0, 1.0)
    print(f"mesh: {len(verts)} verts, {len(faces)} faces")
    render_turntable(
        verts, faces, args.out_dir,
        colors=None if colors is None else np.asarray(colors),
        frames=args.frames, width=args.width, height=args.height,
        gif=args.gif or None, arc_deg=args.arc, start_deg=args.start,
    )


if __name__ == "__main__":
    main()
