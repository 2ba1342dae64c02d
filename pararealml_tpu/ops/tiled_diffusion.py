"""Block-tiled fused Pallas TPU kernels for large-grid diffusion steps.

The monolithic kernel in :mod:`pararealml_tpu.ops.fused_diffusion` keeps
the whole grid resident in VMEM, which caps it at roughly 500x500 f32
cells. This module covers the regime beyond that cap — the one where the
generic XLA path was measured at ~2.5% of v5e HBM bandwidth — with an
overlapped row-tiling scheme:

- The state lives in HBM, padded to ``(8 + height + 8, width_padded)``
  (rounded to the f32 sublane tile) so every tile's DMA has a static,
  aligned offset and shape — Mosaic requires both to be provably
  tile-aligned even for HBM refs, which is why the tile loop is
  unrolled in Python rather than traced.
- Each tile loads ``block + 16`` rows (8-row halos on both sides — the
  four chained RK4 stencil stages only need 4, but 8 keeps every DMA
  on the sublane tile boundary), computes the full RK4 step entirely
  in VMEM with recomputation in the halo, and writes back ``block``
  rows. The last tile is *clamped* so its block ends exactly at the
  (8-rounded) trajectory height, recomputing part of its neighbor —
  this keeps every DMA a full, identically-shaped buffer copy.
- Steps run in a single ``fori_loop`` inside one kernel invocation with
  double-buffered input DMAs and ping-pong HBM state buffers, so per
  step the HBM traffic is ~1.1x state read + ~2.1x state write (next
  state plus the trajectory entry) — within ~1.6x of the speed of
  light for a trajectory-materializing stencil solver, independent of
  grid size.

Boundary conditions are represented as face vectors (Dirichlet
row/column values and Neumann ghost data), with all boundary fixes
applied at statically-known tile rows, exactly matching the generic
path's semantics (pararealml_tpu/operators/fdm/numerical_differentiator
halo synthesis; reference: /root/reference/pararealml/operators/fdm/
numerical_differentiator.py:1188-1242).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.differential_equation import (
    ConvectionDiffusionEquation,
)

# each tile holds ~14 live (tile_h, w_pad) f32 arrays during the RK4
# stages; 210k elements/tile keeps the total under ~12 MB of VMEM
_MAX_TILE_ELEMS = 210_000
# the per-tile compute is unrolled per tile, so the tile count (and with
# it the grid extent) is capped to keep compile times sane
_MAX_WIDTH_PAD = 2304
_MAX_HEIGHT = 2176


class _TilePlan(NamedTuple):
    block: int
    n_tiles: int
    tile_h: int
    h_buf: int
    h_traj: int
    w_pad: int
    starts: Tuple[int, ...]
    halo: int = 8


def make_tile_plan(
    height: int, width: int, sublane: int = 8
) -> Optional[_TilePlan]:
    """Plans the row tiling for a grid, or returns None when the grid is
    outside the tiled kernel's supported range.

    ``sublane`` is the storage dtype's sublane tile (8 for f32, 16 for
    bf16): every DMA offset and buffer height is rounded to it so Mosaic
    can prove the slices tile-aligned. The halo is ``sublane`` rows on
    each side (the chained RK4 stencil stages need only 4).
    """
    w_pad = -(-width // 128) * 128
    if w_pad > _MAX_WIDTH_PAD or height > _MAX_HEIGHT:
        return None
    halo = sublane
    block = min(
        (_MAX_TILE_ELEMS // w_pad - 2 * halo)
        // sublane * sublane,
        256,
    )
    if block < sublane:
        return None
    if height <= block:
        # force at least two tiles so the pipeline logic is uniform
        block = max(
            sublane,
            -(-((height + 1) // 2) // sublane) * sublane,
        )
    n_tiles = -(-height // block)
    if n_tiles < 2 or block >= height:
        return None
    h_traj = -(-height // sublane) * sublane
    # the last tile is clamped to end exactly at h_traj; its start is a
    # multiple of the sublane tile because both h_traj and block are
    starts = tuple(
        i * block for i in range(n_tiles - 1)
    ) + (h_traj - block,)
    return _TilePlan(
        block=block,
        n_tiles=n_tiles,
        tile_h=block + 2 * halo,
        h_buf=h_traj + 2 * halo,
        h_traj=h_traj,
        w_pad=w_pad,
        starts=starts,
        halo=halo,
    )


def dirichlet_is_face_only(cp: ConstrainedProblem) -> bool:
    """Whether all static y constraints lie on the grid faces (always
    the case for constraints created from boundary conditions; a
    necessary condition for the face-vector representation)."""
    constraint = cp.static_y_vertex_constraints
    if constraint is None:
        return True
    mask = np.asarray(constraint.mask).reshape(
        tuple(cp.mesh.vertices_shape) + (-1,)
    )
    return not mask[1:-1, 1:-1].any()


def _face_tensors(cp: ConstrainedProblem, plan: _TilePlan):
    """Extracts per-face Dirichlet and Neumann-ghost vectors, padded to
    the kernel's buffer geometry."""
    from pararealml_tpu.ops.fused_diffusion import _face_vectors

    height, width = cp.mesh.vertices_shape
    dtype = np.float32

    if cp.static_y_vertex_constraints is not None:
        dir_mask = np.asarray(
            cp.static_y_vertex_constraints.mask
        ).reshape(height, width)
        dir_vals = np.asarray(
            cp.static_y_vertex_constraints.values
        ).reshape(height, width)
        dir_vals = np.where(dir_mask, dir_vals, 0.0)
    else:
        dir_mask = np.zeros((height, width), bool)
        dir_vals = np.zeros((height, width))

    d_y = cp.static_boundary_vertex_constraints.d_y
    (g_row_lo_m, g_row_lo_v), (g_row_hi_m, g_row_hi_v) = _face_vectors(
        d_y[0], width
    )
    (g_col_lo_m, g_col_lo_v), (g_col_hi_m, g_col_hi_v) = _face_vectors(
        d_y[1], height
    )

    def pad_row(vec):
        out = np.zeros(plan.w_pad, vec.dtype)
        out[:width] = vec
        return out

    def pad_col(vec):
        # column vectors are indexed by buffer row: global row g lives
        # at buffer row g + halo
        out = np.zeros(plan.h_buf, vec.dtype)
        out[plan.halo:plan.halo + height] = vec
        return out

    def stack_rows(lo, hi):
        return jnp.asarray(np.stack([pad_row(lo), pad_row(hi)]))

    def stack_cols(lo, hi):
        # pre-sliced per tile (dynamic lane-dim offsets cannot be
        # proven aligned by Mosaic, so the slicing happens host-side):
        # entry i holds the (2, tile_h) window of tile i
        padded = np.stack([pad_col(lo), pad_col(hi)])
        return jnp.asarray(
            np.stack(
                [
                    padded[:, s:s + plan.tile_h]
                    for s in plan.starts
                ]
            )
        )

    return dict(
        dir_row_mask=stack_rows(dir_mask[0], dir_mask[-1]),
        dir_row_vals=stack_rows(
            dir_vals[0].astype(dtype), dir_vals[-1].astype(dtype)
        ),
        dir_col_mask=stack_cols(dir_mask[:, 0], dir_mask[:, -1]),
        dir_col_vals=stack_cols(
            dir_vals[:, 0].astype(dtype), dir_vals[:, -1].astype(dtype)
        ),
        ghost_row_mask=stack_rows(g_row_lo_m, g_row_hi_m),
        ghost_row_vals=stack_rows(
            g_row_lo_v.astype(dtype), g_row_hi_v.astype(dtype)
        ),
        ghost_col_mask=stack_cols(g_col_lo_m, g_col_hi_m),
        ghost_col_vals=stack_cols(
            g_col_lo_v.astype(dtype), g_col_hi_v.astype(dtype)
        ),
    )


def _override_rows(array, fixes):
    """Rebuilds ``array`` with the given static rows transformed,
    keeping everything else as static slices (cheap on the VPU compared
    to full-grid selects)."""
    rows = sorted({r for r, _ in fixes})
    segments = []
    prev = 0
    for r in rows:
        if r > prev:
            segments.append(array[prev:r])
        row = array[r:r + 1]
        for rr, fn in fixes:
            if rr == r:
                row = fn(row)
        segments.append(row)
        prev = r + 1
    if prev < array.shape[0]:
        segments.append(array[prev:])
    return jnp.concatenate(segments, axis=0)


def build_tiled_diffusion_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    diffusion_coefficient: Optional[float] = None,
    interpret: bool = False,
    storage_dtype=None,
):
    """Builds ``trajectory(y) -> ys`` computing ``n_steps`` fused RK4
    diffusion(-convection) steps on a grid too large for VMEM, via
    overlapped row tiles. Semantically identical to
    :func:`pararealml_tpu.ops.fused_diffusion.
    build_fused_diffusion_rk4_trajectory`.

    ``storage_dtype`` selects the precision of the HBM-resident state
    and trajectory buffers (``jnp.float32`` by default;
    ``jnp.bfloat16`` halves the kernel's HBM and DMA traffic while all
    stencil arithmetic stays in f32 — the RK4 stages up-convert each
    tile on load and round the result once per step on store).
    """
    from jax.experimental.pallas import tpu as pltpu

    diff_eq = cp.differential_equation
    if diffusion_coefficient is None:
        diffusion_coefficient = diff_eq._d
    mesh = cp.mesh
    height, width = mesh.vertices_shape
    storage_dtype = jnp.dtype(storage_dtype or jnp.float32)
    if storage_dtype not in (
        jnp.dtype(jnp.float32),
        jnp.dtype(jnp.bfloat16),
    ):
        raise ValueError(
            "storage_dtype must be float32 or bfloat16, got "
            f"{storage_dtype}"
        )
    sublane = 8 if storage_dtype == jnp.dtype(jnp.float32) else 16
    plan = make_tile_plan(height, width, sublane)
    if plan is None:
        raise ValueError("grid outside the tiled kernel's range")
    if not dirichlet_is_face_only(cp):
        raise ValueError(
            "the tiled kernel represents Dirichlet constraints as face "
            "vectors; interior static y constraints are not supported"
        )
    block, n_tiles, tile_h, h_buf, h_traj, w_pad, starts, halo = plan
    d_x0, d_x1 = mesh.d_x
    faces = _face_tensors(cp, plan)
    dtype = jnp.float32

    # static emptiness flags let tiles skip whole constraint stages
    # (e.g. pure-Neumann columns need no Dirichlet column rebuild)
    def _face_any(key):
        mask = np.asarray(faces[key])
        if mask.ndim == 3:  # per-tile column stacks
            return bool(mask[:, 0].any()), bool(mask[:, 1].any())
        return bool(mask[0].any()), bool(mask[1].any())

    dir_row_present = _face_any("dir_row_mask")
    ghost_row_present = _face_any("ghost_row_mask")
    dir_cols_present = any(_face_any("dir_col_mask"))
    ghost_cols_present = any(_face_any("ghost_col_mask"))

    d = float(diffusion_coefficient)
    if isinstance(diff_eq, ConvectionDiffusionEquation):
        velocity = tuple(float(v) for v in diff_eq._velocity)
    else:
        velocity = (0.0, 0.0)
    has_convection = any(v != 0.0 for v in velocity)
    inv_dx0_sqr = 1.0 / float(d_x0) ** 2
    inv_dx1_sqr = 1.0 / float(d_x1) ** 2
    inv_two_dx0 = 1.0 / (2.0 * float(d_x0))
    inv_two_dx1 = 1.0 / (2.0 * float(d_x1))
    two_dx0 = 2.0 * float(d_x0)
    two_dx1 = 2.0 * float(d_x1)

    def kernel(
        y0_ref,
        dir_row_mask_ref,
        dir_row_vals_ref,
        dir_col_mask_ref,
        dir_col_vals_ref,
        ghost_row_mask_ref,
        ghost_row_vals_ref,
        ghost_col_mask_ref,
        ghost_col_vals_ref,
        traj_ref,
        state_ref,
        in_buf,
        out_state,
        in_sems,
        state_sems,
        traj_sems,
    ):
        dir_row_mask = dir_row_mask_ref[:]
        dir_row_vals = dir_row_vals_ref[:]
        ghost_row_mask = ghost_row_mask_ref[:]
        ghost_row_vals = ghost_row_vals_ref[:]

        # seed the ping-pong state with the initial condition
        init = pltpu.make_async_copy(
            y0_ref, state_ref.at[0], in_sems.at[0]
        )
        init.start()
        init.wait()

        zero_row = jnp.zeros((1, w_pad), dtype)
        zero_col = jnp.zeros((tile_h, 1), dtype)
        col_pad = (
            jnp.zeros((tile_h, w_pad - width), dtype)
            if w_pad > width
            else None
        )
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0)

        def in_dma(src_slot, i, buf_slot):
            return pltpu.make_async_copy(
                state_ref.at[src_slot, pl.ds(starts[i], tile_h)],
                in_buf.at[buf_slot],
                in_sems.at[buf_slot],
            )

        def state_dma(dst_slot, i, buf_slot):
            return pltpu.make_async_copy(
                out_state.at[buf_slot],
                state_ref.at[dst_slot, pl.ds(halo + starts[i], block)],
                state_sems.at[buf_slot],
            )

        def traj_dma(k, i, buf_slot):
            return pltpu.make_async_copy(
                out_state.at[buf_slot],
                traj_ref.at[k, pl.ds(starts[i], block)],
                traj_sems.at[buf_slot],
            )

        def compute_tile(tile, i):
            """One full RK4 step over tile ``i`` (a Python index, so
            every boundary fix lands on a statically-known row); rows
            [halo, halo+block) of the result are globally correct."""
            start = starts[i]
            first_global = start - halo  # global row of tile row 0

            # statically-known tile rows of the global boundary rows,
            # when they fall inside this tile's window
            top_row = -first_global  # global row 0
            has_top = 0 <= top_row < tile_h
            bottom_row = (height - 1) - first_global
            has_bottom = bottom_row < tile_h
            # rows outside [0, height) must be zeroed so they never
            # feed back through the stencil
            needs_sanitize = first_global < 0 or (
                first_global + tile_h > height
            )
            valid_rows = (row_iota + first_global >= 0) & (
                row_iota + first_global < height
            )

            # per-tile windows of the column-indexed vectors,
            # pre-sliced host-side
            dcm = dir_col_mask_ref[i]
            dcv = dir_col_vals_ref[i]
            gcm = ghost_col_mask_ref[i]
            gcv = ghost_col_vals_ref[i]

            def boundary_row_fixes(make_fn, present):
                fixes = []
                if has_top and present[0]:
                    fixes.append((top_row, make_fn(0)))
                if has_bottom and present[1]:
                    fixes.append((bottom_row, make_fn(1)))
                return fixes

            def apply_dirichlet(state):
                def dir_row_fix(face):
                    def fix(row):
                        return jnp.where(
                            dir_row_mask[face],
                            dir_row_vals[face],
                            row,
                        )

                    return fix

                fixes = boundary_row_fixes(dir_row_fix, dir_row_present)
                if fixes:
                    state = _override_rows(state, fixes)
                if not dir_cols_present:
                    return state
                left = jnp.where(
                    dcm[0], dcv[0], state[:, 0]
                )[:, jnp.newaxis]
                right = jnp.where(
                    dcm[1], dcv[1], state[:, width - 1]
                )[:, jnp.newaxis]
                parts = [left, state[:, 1:width - 1], right]
                if col_pad is not None:
                    parts.append(state[:, width:])
                return jnp.concatenate(parts, axis=1)

            def rhs(state):
                above = jnp.concatenate(
                    [zero_row, state[:-1, :]], axis=0
                )
                below = jnp.concatenate(
                    [state[1:, :], zero_row], axis=0
                )
                left = jnp.concatenate(
                    [zero_col, state[:, :-1]], axis=1
                )
                right = jnp.concatenate(
                    [state[:, 1:], zero_col], axis=1
                )
                lap = (above - 2.0 * state + below) * inv_dx0_sqr + (
                    left - 2.0 * state + right
                ) * inv_dx1_sqr

                # Neumann ghost contributions at the boundary rows
                # (additive; the inward neighbor's tile row is static)
                lap_fixes = []
                if has_top and ghost_row_present[0]:
                    def top_fix(row_lap):
                        ghost = jnp.where(
                            ghost_row_mask[0],
                            state[top_row + 1, :]
                            - two_dx0 * ghost_row_vals[0],
                            0.0,
                        )
                        return row_lap + ghost * inv_dx0_sqr

                    lap_fixes.append((top_row, top_fix))
                if has_bottom and ghost_row_present[1]:
                    def bottom_fix(row_lap):
                        ghost = jnp.where(
                            ghost_row_mask[1],
                            state[bottom_row - 1, :]
                            + two_dx0 * ghost_row_vals[1],
                            0.0,
                        )
                        return row_lap + ghost * inv_dx0_sqr

                    lap_fixes.append((bottom_row, bottom_fix))
                if lap_fixes:
                    lap = _override_rows(lap, lap_fixes)

                if ghost_cols_present:
                    ghost_left = jnp.where(
                        gcm[0], state[:, 1] - two_dx1 * gcv[0], 0.0
                    )
                    ghost_right = jnp.where(
                        gcm[1],
                        state[:, width - 2] + two_dx1 * gcv[1],
                        0.0,
                    )
                    col_parts = [
                        lap[:, 0:1] + ghost_left[:, jnp.newaxis]
                        * inv_dx1_sqr,
                        lap[:, 1:width - 1],
                        lap[:, width - 1:width]
                        + ghost_right[:, jnp.newaxis] * inv_dx1_sqr,
                    ]
                    if col_pad is not None:
                        col_parts.append(col_pad)
                    lap = jnp.concatenate(col_parts, axis=1)
                elif col_pad is not None:
                    # padding columns must be re-zeroed so they never
                    # feed back through the column stencil
                    lap = jnp.concatenate(
                        [lap[:, :width], col_pad], axis=1
                    )
                rhs_value = d * lap

                if has_convection:
                    gradient_0 = (below - above) * inv_two_dx0

                    def grad_row_fix(face):
                        def fix(row):
                            return jnp.where(
                                ghost_row_mask[face],
                                ghost_row_vals[face],
                                row,
                            )

                        return fix

                    fixes = boundary_row_fixes(
                        grad_row_fix, ghost_row_present
                    )
                    if fixes:
                        gradient_0 = _override_rows(gradient_0, fixes)

                    gradient_1 = (right - left) * inv_two_dx1
                    if ghost_cols_present:
                        grad_left = jnp.where(
                            gcm[0], gcv[0], gradient_1[:, 0]
                        )[:, jnp.newaxis]
                        grad_right = jnp.where(
                            gcm[1], gcv[1], gradient_1[:, width - 1]
                        )[:, jnp.newaxis]
                        grad_parts = [
                            grad_left,
                            gradient_1[:, 1:width - 1],
                            grad_right,
                        ]
                        if col_pad is not None:
                            grad_parts.append(col_pad)
                        gradient_1 = jnp.concatenate(
                            grad_parts, axis=1
                        )
                    elif col_pad is not None:
                        gradient_1 = jnp.concatenate(
                            [gradient_1[:, :width], col_pad], axis=1
                        )

                    rhs_value = (
                        rhs_value
                        - velocity[0] * gradient_0
                        - velocity[1] * gradient_1
                    )

                if needs_sanitize:
                    rhs_value = jnp.where(valid_rows, rhs_value, 0.0)
                return rhs_value

            state = tile.astype(dtype)
            if needs_sanitize:
                state = jnp.where(valid_rows, state, 0.0)
            k1 = d_t * rhs(state)
            k2 = d_t * rhs(apply_dirichlet(state + 0.5 * k1))
            k3 = d_t * rhs(apply_dirichlet(state + 0.5 * k2))
            k4 = d_t * rhs(apply_dirichlet(state + k3))
            result = apply_dirichlet(
                state + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
            )
            return result[halo:halo + block].astype(storage_dtype)

        def step(k, _):
            src_slot = jax.lax.rem(k, 2)
            dst_slot = jax.lax.rem(k + 1, 2)

            in_dma(src_slot, 0, 0).start()
            # the tile loop is unrolled: every DMA offset is static
            for i in range(n_tiles):
                buf_slot = i % 2
                if i + 1 < n_tiles:
                    in_dma(src_slot, i + 1, (i + 1) % 2).start()
                in_dma(src_slot, i, buf_slot).wait()
                result = compute_tile(in_buf[buf_slot], i)

                # the DMAs that used this slot two tiles ago must have
                # drained before the buffers are overwritten
                if i >= 2:
                    state_dma(dst_slot, i - 2, buf_slot).wait()
                    traj_dma(k, i - 2, buf_slot).wait()

                out_state[buf_slot] = result
                state_dma(dst_slot, i, buf_slot).start()
                traj_dma(k, i, buf_slot).start()

            # drain the last two tiles' writes before the next step
            # reads the buffer they wrote
            for i in (n_tiles - 2, n_tiles - 1):
                slot = i % 2
                state_dma(dst_slot, i, slot).wait()
                traj_dma(k, i, slot).wait()
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    call = pl.pallas_call(
        kernel,
        out_shape=(
            # the trajectory keeps the padded width: Mosaic requires
            # every dimension of a sliced HBM buffer to be
            # tile-aligned, so the clean view is sliced off lazily
            jax.ShapeDtypeStruct(
                (n_steps, h_traj, w_pad), storage_dtype
            ),
            jax.ShapeDtypeStruct((2, h_buf, w_pad), storage_dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h, w_pad), storage_dtype),
            pltpu.VMEM((2, block, w_pad), storage_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    face_args = (
        faces["dir_row_mask"],
        faces["dir_row_vals"],
        faces["dir_col_mask"],
        faces["dir_col_vals"],
        faces["ghost_row_mask"],
        faces["ghost_row_vals"],
        faces["ghost_col_mask"],
        faces["ghost_col_vals"],
    )

    def trajectory(y: jax.Array) -> jax.Array:
        y_2d = jnp.asarray(y, dtype).reshape(height, width)
        y_padded = jnp.pad(
            y_2d, ((halo, h_buf - halo - height), (0, w_pad - width))
        ).astype(storage_dtype)
        traj, _ = call(y_padded, *face_args)
        # reshape the contiguous kernel output FIRST (a free bitcast),
        # then slice: reshape-of-strided-slice forces XLA to materialize
        # the whole clean trajectory even when the consumer reads a
        # single frame, while slice-last stays lazy and fuses into the
        # consumer (measured: the 641^2 x 2000 last-frame time-to-value
        # drops by the full 12 ms epilogue copy)
        traj = traj.reshape(n_steps, h_traj, w_pad, 1)
        return traj[:, :height, :width].astype(y.dtype)

    return trajectory
