"""Pallas TSDF integration: scatter-free pool update with prefetched slots.

Round-1's integration path (`blocks._integrate_slots`) gathered the touched
blocks out of the pool with XLA gather, integrated, and scattered back —
and the gather/scatter pair cost more on the chip (~11 ms at a 4096-slot
bucket) than the integration itself (~9 ms). XLA's scatter on TPU
serialises; the DMA engine does not. This kernel removes both:

  - The frame's touched pool slots arrive as a scalar-prefetch operand
    (`pltpu.PrefetchScalarGridSpec`), so each grid step's BlockSpec
    `index_map` points directly at its block's pool row. Pallas pipelines
    the resulting HBM<->VMEM DMAs; there is no gather/scatter HLO at all.
  - `input_output_aliases` updates the pool in place (the pool stays donated
    across frames in the SLAM loop, so HBM holds ONE copy).

Image lookups use the same one-hot-matmul trick as
`ops.tsdf.integrate_blocks_matmul` (ref behaviour: nearest-pixel projective
update, src/Integration/Integrator.cpp:36-94), with one improvement: the
depth window is split into bf16 hi + bf16 lo planes, so the MXU runs pure
bf16 (fast path) while depth survives to ~1e-4 m — the round-1 einsum at
`Precision.DEFAULT` silently truncated depth to bf16 (~8 mm at 2 m, most of
a voxel) on real TPU hardware.

Pool layout here is channels-first `(B+1, 5, 512)` float32 with channels
[sdf, weight, r, g, b] — lane-dim 512 keeps VMEM tiles dense (a
`(512, 5)` layout would pad 5 lanes to 128). Row B is a trash row: padding
entries in `slots` point at it, so no masking of the grid is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tsdf import CUBE_SIZE, EMPTY_SDF

N_VOX = CUBE_SIZE**3  # 512
WIN_R = 128  # window rows (8-aligned dynamic slice); covers blocks at z >~ 0.5 m
# window cols: Mosaic requires lane-dim dynamic-slice starts PROVABLY
# multiples of 128 ("cannot statically prove that index in dimension 2 is a
# multiple of 128"), so the narrowest usable window for a <=105 px block
# span (0.1 m block at the 0.5 m MIN_DEPTH, TUM intrinsics) is 256 wide at a
# 128-aligned start. A 16-aligned 128-wide window would halve the selection
# matmul FLOPs but does not compile.
WIN_C = 256


def pack_image(depth: jax.Array, rgb: jax.Array) -> jax.Array:
    """(H, W) depth + (H, W, 3) rgb -> (5, H, W) bf16 [d_hi, d_lo, r, g, b].

    depth = d_hi + d_lo exactly to one bf16 ulp of the residual (~2^-16
    relative), reconstructed in f32 inside the kernel.

    NOTE: the HWC->CHW transpose costs ~13 ms on TPU (lane-crossing
    relayout). Loaders that can produce channels-first rgb should; gray
    pipelines should use `pack_image_gray` (no transpose at all).
    """
    d_hi = depth.astype(jnp.bfloat16)
    d_lo = (depth - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack(
        [d_hi, d_lo] + [rgb[..., i].astype(jnp.bfloat16) for i in range(3)], axis=0
    )


def pack_image_gray(depth: jax.Array, gray: jax.Array) -> jax.Array:
    """(H, W) depth + (H, W) gray -> (3, H, W) bf16 [d_hi, d_lo, g].

    Transpose-free packing for intensity-only pipelines; the kernel
    replicates the gray channel into r=g=b at write time. 40% fewer
    selection matmuls than the 5-channel path.
    """
    d_hi = depth.astype(jnp.bfloat16)
    d_lo = (depth - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([d_hi, d_lo, gray.astype(jnp.bfloat16)], axis=0)


def _kernel(
    # scalar prefetch
    slots_ref,  # (K,) int32 in SMEM (drives the index maps)
    keys_ref,  # (K,) int32 in SMEM — packed block keys (SMEM pads 2-D, so 1-D)
    # inputs
    vox_ref,  # (1, 5, 512) f32 — this block's pool row
    img_ref,  # (5|3, H, W) bf16 packed frame, or (2, H, W) f32 [depth, gray]
    tcw_ref,  # (4, 4) f32 — world-to-camera
    # outputs
    out_ref,  # (1, 5, 512) f32
    *,
    fx: float, fy: float, cx: float, cy: float,
    h: int, w: int,
    voxel_size: float, truncation: float, max_weight: float,
    win_r: int = WIN_R, win_c: int = WIN_C,
):
    # --- voxel centers in world space, (1, 512) lane layout ---------------
    # Everything per-voxel lives on LANES (shape (1, 512)) end-to-end: it
    # matches the pool-row layout (5, 512) so no relayout/transpose ever
    # happens in the kernel (Mosaic relayouts of (512, 5)<->(5, 512) cost
    # more than the matmuls).
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, N_VOX), 1)
    n = CUBE_SIZE
    ii = lin // (n * n)
    jj = (lin // n) % n
    kk = lin % n
    i = pl.program_id(0)
    key = keys_ref[i]
    # padding grid steps (key == INVALID, slot == trash row) skip ALL
    # compute: in steady state roughly half the kmax slots are padding, and
    # each non-skipped step costs ~100 bf16 MFLOPs of selection matmuls.
    # The out block (trash row) receives whatever VMEM holds — harmless.
    _INVALID = 1 << 30  # python int: a jnp constant would be captured

    @pl.when(key != _INVALID)
    def _do_integrate():
        _integrate_body(
            slots_ref, keys_ref, vox_ref, img_ref, tcw_ref, out_ref,
            lin=lin, ii=ii, jj=jj, kk=kk, key=key,
            fx=fx, fy=fy, cx=cx, cy=cy, h=h, w=w,
            voxel_size=voxel_size, truncation=truncation,
            max_weight=max_weight, win_r=win_r, win_c=win_c,
        )

    @pl.when(key == _INVALID)
    def _passthrough():
        out_ref[...] = vox_ref[...]


def _integrate_body(
    slots_ref, keys_ref, vox_ref, img_ref, tcw_ref, out_ref,
    *, lin, ii, jj, kk, key,
    fx, fy, cx, cy, h, w, voxel_size, truncation, max_weight, win_r, win_c,
):
    n = CUBE_SIZE
    bx = ((key >> 20) & 1023) - 512
    by = ((key >> 10) & 1023) - 512
    bz = (key & 1023) - 512
    px = (bx * n + ii).astype(jnp.float32) + 0.5
    py = (by * n + jj).astype(jnp.float32) + 0.5
    pz = (bz * n + kk).astype(jnp.float32) + 0.5
    vs = jnp.float32(voxel_size)
    xw, yw, zw = px * vs, py * vs, pz * vs

    T = tcw_ref[...]
    xc = T[0, 0] * xw + T[0, 1] * yw + T[0, 2] * zw + T[0, 3]
    yc = T[1, 0] * xw + T[1, 1] * yw + T[1, 2] * zw + T[1, 3]
    zc = T[2, 0] * xw + T[2, 1] * yw + T[2, 2] * zw + T[2, 3]

    zsafe = jnp.where(zc > 1e-6, zc, 1.0)
    ui = jnp.round(xc / zsafe * fx + cx).astype(jnp.int32)  # (1, 512)
    vi = jnp.round(yc / zsafe * fy + cy).astype(jnp.int32)
    inb = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (zc > 1e-6)

    # --- window origin (scalars; Mosaic needs aligned dynamic slices) -----
    vi_m = jnp.where(inb, vi, h)
    ui_m = jnp.where(inb, ui, w)
    r0 = jnp.clip(jnp.min(vi_m), 0, max(h - win_r, 0)) & ~7  # 8-aligned rows
    r0 = pl.multiple_of(r0, 8)
    c0 = jnp.clip(jnp.min(ui_m) & ~127, 0, max(w - win_c, 0))  # 128-aligned
    c0 = pl.multiple_of(c0, 128)

    rrel = vi - r0  # (1, 512)
    crel = ui - c0
    # --- one-hot col select shared by both row-window paths ----------------
    # colselT[c, v] = (crel[v] == c): (win_c, 512), voxels stay on lanes
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (win_c, 1), 0)
    colselT = (jnp.clip(crel, 0, win_c - 1) == col_ids).astype(jnp.bfloat16)

    def _do_window(wr: int):
        """Select + TSDF update with a wr-row image window at (r0, c0)."""
        in_win = inb & (rrel >= 0) & (rrel < wr) & (crel >= 0) & (crel < win_c)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (wr, 1), 0)
        rowmask = (rrel == row_ids).astype(jnp.float32)

        def _select(win_bf16):
            # precision must be DEFAULT: the package-global "highest"
            # requests an fp32 contract that Mosaic rejects for bf16
            # operands — and bf16 is exact here anyway (one-hot rhs
            # selecting bf16 planes).
            tmp = jax.lax.dot_general(
                win_bf16, colselT,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (wr, 512): [r, v] = win[r, crel[v]]
            return jnp.sum(tmp * rowmask, axis=0, keepdims=True)  # (1, 512)

        if img_ref.dtype == jnp.float32:
            # raw [depth, gray] planes: split depth into bf16 hi+lo INSIDE
            # the kernel (per-window, tiny) so the caller never pays a
            # whole-image pack/relayout pass (~11 ms at 640x480 on v5e).
            win_d = img_ref[0, pl.ds(r0, wr), pl.ds(c0, win_c)]
            d_hi = win_d.astype(jnp.bfloat16)
            d_lo = (win_d - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            win_g = img_ref[1, pl.ds(r0, wr), pl.ds(c0, win_c)].astype(jnp.bfloat16)
            vals = [_select(d_hi), _select(d_lo), _select(win_g)]
            n_img_ch = 3
        else:
            n_img_ch = img_ref.shape[0]  # 5 = [d_hi,d_lo,r,g,b]; 3 = [d_hi,d_lo,g]
            vals = [
                _select(img_ref[ch, pl.ds(r0, wr), pl.ds(c0, win_c)])
                for ch in range(n_img_ch)
            ]

        d_px = vals[0] + vals[1]  # hi + lo
        sdf_m = d_px - zc  # (1, 512)
        # --- reference update rule (Integrator.cpp:36-94) ------------------
        upd = in_win & (d_px > 0) & (sdf_m > -truncation)
        tsdf_new = jnp.clip(sdf_m / truncation, -1.0, 1.0)

        sdf_old = vox_ref[0, 0:1, :]  # (1, 512)
        w_old = vox_ref[0, 1:2, :]
        w_new = jnp.where(upd, jnp.minimum(w_old + 1.0, max_weight), w_old)
        denom = 1.0 / jnp.clip(w_old + 1.0, 1.0, None)
        sdf_safe = jnp.where(w_old > 0, sdf_old, 0.0)
        sdf_out = jnp.where(upd, (sdf_safe * w_old + tsdf_new) * denom, sdf_old)
        out_ref[0, 0:1, :] = sdf_out
        out_ref[0, 1:2, :] = w_new
        for ch in range(3):
            c_px = vals[2 + ch] if n_img_ch == 5 else vals[2]  # gray: r=g=b
            c_old = vox_ref[0, 2 + ch : 3 + ch, :]
            c_safe = jnp.where(w_old > 0, c_old, 0.0)
            out_ref[0, 2 + ch : 3 + ch, :] = jnp.where(
                upd, (c_safe * w_old + c_px) * denom, c_old
            )

    if win_r > 64:
        # FAST PATH: most blocks (z >~ 1.5 m) project into < 64 rows; their
        # selection matmul + row reduce run at half the FLOPs. The row span
        # is exact — voxels outside the image are excluded before the max.
        rmax = jnp.max(jnp.where(inb, vi, -1))
        fits_small = (rmax - r0) < 64

        @pl.when(fits_small)
        def _small():
            _do_window(64)

        @pl.when(~fits_small)
        def _large():
            _do_window(win_r)
    else:
        _do_window(win_r)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "cx", "cy", "voxel_size", "truncation", "max_weight",
        "interpret", "win_r", "win_c",
    ),
)
def integrate_slots_pallas(
    vox: jax.Array,  # (B+1, 5, 512) f32; row B is trash
    keys: jax.Array,  # (K,) int32 — packed block keys per touched slot
    slots: jax.Array,  # (K,) int32; padding/dropped entries = B
    img5: jax.Array,  # (5|3, H, W) bf16 from pack_image*, or (2, H, W) f32
    T_cw: jax.Array,  # (4, 4) f32
    fx: float, fy: float, cx: float, cy: float,
    voxel_size: float,
    truncation: float,
    max_weight: float = 100.0,
    interpret: bool = False,
    win_r: int = WIN_R,
    win_c: int = WIN_C,
) -> jax.Array:
    """In-place TSDF update of `vox` at `slots` for one packed frame.

    The (2, H, W) float32 form is `jnp.stack([depth, gray])` — no bf16
    pre-pack; the kernel splits depth hi/lo per-window (preferred: the
    whole-image pack pass costs ~11 ms of relayout on v5e).
    """
    _, h, w = img5.shape
    k = slots.shape[0]
    kern = functools.partial(
        _kernel,
        fx=fx, fy=fy, cx=cx, cy=cy, h=h, w=w,
        voxel_size=voxel_size, truncation=truncation, max_weight=max_weight,
        win_r=min(win_r, h), win_c=min(win_c, w),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(
                (1, 5, N_VOX), lambda i, slots, keys: (slots[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                img5.shape, lambda i, slots, keys: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 4), lambda i, slots, keys: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, N_VOX), lambda i, slots, keys: (slots[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(vox.shape, vox.dtype),
        input_output_aliases={2: 0},  # vox (first operand after the prefetches)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=12 * 1024 * 1024,
        ),
    )(slots, keys, vox, img5, T_cw)


# -- pool layout helpers ------------------------------------------------------


def make_pool(capacity: int) -> jax.Array:
    """Fresh (capacity+1, 5, 512) pool; sdf=EMPTY, weight=0, last row trash."""
    vox = jnp.zeros((capacity + 1, 5, N_VOX), jnp.float32)
    return vox.at[:, 0, :].set(EMPTY_SDF)


def pool_to_blocks(vox: jax.Array):
    """(B+1, 5, 512) -> (sdf, weight, color) in the (B, 8, 8, 8[,3]) layout."""
    n = CUBE_SIZE
    b = vox.shape[0] - 1
    body = vox[:b]
    sdf = body[:, 0].reshape(b, n, n, n)
    weight = body[:, 1].reshape(b, n, n, n)
    color = jnp.moveaxis(body[:, 2:5], 1, -1).reshape(b, n, n, n, 3)
    return sdf, weight, color
