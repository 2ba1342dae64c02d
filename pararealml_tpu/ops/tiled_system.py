"""Block-tiled fused Pallas TPU kernels for large-grid 2D systems.

Extends the overlapped row-tiling scheme of
:mod:`pararealml_tpu.ops.tiled_diffusion` to the multi-component
systems covered by :mod:`pararealml_tpu.ops.fused_system` (wave,
Burgers, shallow water, Cahn-Hilliard), whose whole-grid-in-VMEM
kernels cap out at roughly ``3M / (7n + 4)`` padded cells. All
``n`` component planes of a row tile are DMA'd together, the
per-equation step (reused verbatim from ``fused_system``'s step
factories) runs entirely in VMEM with recomputation in the 8-row
halos, and the ``block`` result rows of every component stream back to
ping-pong HBM state buffers and the trajectory.

Navier-Stokes is excluded: its per-step Jacobi anti-Laplacian
stream-function solve iterates to convergence over the *whole* grid,
which cannot be recomputed from a bounded halo. Shallow water is
excluded from *dispatch* (the kernel itself supports and is tested on
it): XLA schedules the generic 3-component graph well enough that the
tiled kernel measured 0.81x the generic path at 641^2 on v5e.

Boundary conditions are per-component face vectors (Dirichlet
row/column values and Neumann ghost data), applied at statically-known
tile rows; semantics match the generic path exactly (reference halo
synthesis: /root/reference/pararealml/operators/fdm/
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
    NavierStokesEquation,
)
from pararealml_tpu.ops.tiled_diffusion import (
    _MAX_HEIGHT,
    _MAX_WIDTH_PAD,
    _override_rows,
    dirichlet_is_face_only,
)

# per-component VMEM budget per tile: the single-component tiled
# diffusion kernel validated ~210k elements against ~14 live stage
# arrays; systems hold that working set per component
_MAX_TILE_ELEMS_PER_COMPONENT = 210_000


class _SystemTilePlan(NamedTuple):
    block: int
    n_tiles: int
    tile_h: int
    h_buf: int
    h_traj: int
    w_pad: int
    starts: Tuple[int, ...]
    halo: int = 8


def make_system_tile_plan(
    height: int, width: int, n_components: int, sublane: int = 8
) -> Optional[_SystemTilePlan]:
    """Plans the row tiling for an ``n_components``-plane grid, or None
    when outside the tiled kernel's supported range. ``sublane`` is the
    storage dtype's sublane tile (8 for f32, 16 for bf16), governing
    the alignment of every DMA offset and the halo depth."""
    w_pad = -(-width // 128) * 128
    if w_pad > _MAX_WIDTH_PAD or height > _MAX_HEIGHT:
        return None
    halo = sublane
    max_elems = _MAX_TILE_ELEMS_PER_COMPONENT // max(n_components, 1)
    block = min(
        (max_elems // w_pad - 2 * halo) // sublane * sublane, 256
    )
    if block < sublane:
        return None
    if height <= block:
        block = max(
            sublane,
            -(-((height + 1) // 2) // sublane) * sublane,
        )
    n_tiles = -(-height // block)
    if n_tiles < 2 or block >= height:
        return None
    h_traj = -(-height // sublane) * sublane
    starts = tuple(
        i * block for i in range(n_tiles - 1)
    ) + (h_traj - block,)
    return _SystemTilePlan(
        block=block,
        n_tiles=n_tiles,
        tile_h=block + 2 * halo,
        h_buf=h_traj + 2 * halo,
        h_traj=h_traj,
        w_pad=w_pad,
        starts=starts,
        halo=halo,
    )


def tiled_system_applicable(cp: ConstrainedProblem) -> bool:
    """Whether the tiled system kernel covers this (already
    type/BC/integrator-gated) problem's grid."""
    from pararealml_tpu.differential_equation import (
        ShallowWaterEquation,
    )

    diff_eq = cp.differential_equation
    if isinstance(diff_eq, NavierStokesEquation):
        return False
    # XLA schedules the generic 3-component shallow-water graph well:
    # the tiled kernel measured 0.81x the generic path at 641^2 on v5e
    # (equivalence verified to 2e-9), so beyond-VMEM shallow water
    # stays on the generic path
    if isinstance(diff_eq, ShallowWaterEquation):
        return False
    return (
        make_system_tile_plan(
            *cp.mesh.vertices_shape, diff_eq.y_dimension
        )
        is not None
        and dirichlet_is_face_only(cp)
    )


def _component_face_tensors(
    cp: ConstrainedProblem, plan: _SystemTilePlan, n: int
):
    """Per-component face vectors padded to the kernel geometry:
    row-indexed arrays are (2 faces, n, w_pad); column-indexed arrays
    are pre-sliced per tile, (n_tiles, 2 faces, n, tile_h). The raw
    constraint extraction is shared with the whole-grid kernel
    (:func:`fused_system._component_constraint_tensors`)."""
    from pararealml_tpu.ops.fused_system import (
        _component_constraint_tensors,
    )

    height, width = cp.mesh.vertices_shape
    dtype = np.float32
    raw = _component_constraint_tensors(cp, n)
    dir_mask = raw["dir_mask"]  # (n, h, w)
    dir_vals = raw["dir_vals"]

    def pad_rows(array):
        return np.pad(
            array, ((0, 0), (0, 0), (0, plan.w_pad - width))
        )

    def tile_cols(array):
        # global row g lives at buffer row g + halo; entry i holds the
        # (2, n, tile_h) window of tile i (sliced host-side: dynamic
        # lane-dim offsets cannot be proven aligned by Mosaic)
        padded = np.pad(
            array,
            (
                (0, 0),
                (0, 0),
                (plan.halo, plan.h_buf - plan.halo - height),
            ),
        )
        return np.stack(
            [padded[:, :, s:s + plan.tile_h] for s in plan.starts]
        )

    return dict(
        dir_row_mask=jnp.asarray(
            pad_rows(np.stack([dir_mask[:, 0, :], dir_mask[:, -1, :]]))
        ),
        dir_row_vals=jnp.asarray(
            pad_rows(
                np.stack([dir_vals[:, 0, :], dir_vals[:, -1, :]])
            ).astype(dtype)
        ),
        dir_col_mask=jnp.asarray(
            tile_cols(
                np.stack([dir_mask[:, :, 0], dir_mask[:, :, -1]])
            )
        ),
        dir_col_vals=jnp.asarray(
            tile_cols(
                np.stack([dir_vals[:, :, 0], dir_vals[:, :, -1]])
            ).astype(dtype)
        ),
        ghost_row_mask=jnp.asarray(pad_rows(raw["ghost_row_mask"])),
        ghost_row_vals=jnp.asarray(pad_rows(raw["ghost_row_vals"])),
        ghost_col_mask=jnp.asarray(tile_cols(raw["ghost_col_mask"])),
        ghost_col_vals=jnp.asarray(tile_cols(raw["ghost_col_vals"])),
    )


class _TiledStencilHelpers:
    """The :class:`fused_system._StencilHelpers` interface over one row
    tile: boundary fixes land on statically-known tile rows, and every
    stencil output is sanitized to zero outside the logical domain so
    out-of-range tile rows never feed back."""

    def __init__(self, geometry, faces, tile_index, present):
        g = geometry
        self._g = g
        self._faces = faces
        plan = g["plan"]
        height, width = g["height"], g["width"]
        start = plan.starts[tile_index]
        first_global = start - plan.halo
        self.first_global = first_global
        top_row = -first_global
        self.top_row = top_row
        self.has_top = 0 <= top_row < plan.tile_h
        bottom_row = (height - 1) - first_global
        self.bottom_row = bottom_row
        self.has_bottom = bottom_row < plan.tile_h
        self.needs_sanitize = first_global < 0 or (
            first_global + plan.tile_h > height
        )
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (plan.tile_h, 1), 0
        )
        self.valid_rows = (row_iota + first_global >= 0) & (
            row_iota + first_global < height
        )
        # per-tile windows of the column-indexed face vectors
        self._gcm = faces["ghost_col_mask"][tile_index]
        self._gcv = faces["ghost_col_vals"][tile_index]
        # static emptiness flags skip whole constraint stages (e.g.
        # pure-Dirichlet problems pay no Neumann ghost machinery)
        self._ghost_rows_present = present["ghost_rows"]
        self._ghost_cols_present = present["ghost_cols"][tile_index]

    def sanitize(self, state):
        if self.needs_sanitize:
            return jnp.where(self.valid_rows, state, 0.0)
        return state

    def _shifts(self, state):
        g = self._g
        above = jnp.concatenate(
            [g["zero_row"], state[:-1, :]], axis=0
        )
        below = jnp.concatenate(
            [state[1:, :], g["zero_row"]], axis=0
        )
        left = jnp.concatenate([g["zero_col"], state[:, :-1]], axis=1)
        right = jnp.concatenate([state[:, 1:], g["zero_col"]], axis=1)
        return above, below, left, right

    def _boundary_row_fixes(self, make_fn, present=(True, True)):
        fixes = []
        if self.has_top and present[0]:
            fixes.append((self.top_row, make_fn(0)))
        if self.has_bottom and present[1]:
            fixes.append((self.bottom_row, make_fn(1)))
        return fixes

    def laplacian(self, comp, state):
        g = self._g
        width = g["width"]
        grm = self._faces["ghost_row_mask"]
        grv = self._faces["ghost_row_vals"]
        above, below, left, right = self._shifts(state)
        lap = (above - 2.0 * state + below) * g["inv_dx0_sqr"] + (
            left - 2.0 * state + right
        ) * g["inv_dx1_sqr"]

        inward = {0: self.top_row + 1, 1: self.bottom_row - 1}
        sign = {0: -1.0, 1: 1.0}

        def ghost_fix(face):
            def fix(row_lap):
                ghost = jnp.where(
                    grm[face, comp],
                    state[inward[face], :]
                    + sign[face] * g["two_dx0"] * grv[face, comp],
                    0.0,
                )
                return row_lap + ghost * g["inv_dx0_sqr"]

            return fix

        fixes = self._boundary_row_fixes(
            ghost_fix, self._ghost_rows_present
        )
        if fixes:
            lap = _override_rows(lap, fixes)

        if not self._ghost_cols_present:
            # no Neumann columns on this tile: only the pad columns
            # need zeroing (stencil garbage there would feed back
            # through the next stage's column shifts)
            if g["col_pad"] is not None:
                lap = jnp.concatenate(
                    [lap[:, :width], g["col_pad"]], axis=1
                )
            return self.sanitize(lap)

        ghost_left = jnp.where(
            self._gcm[0, comp],
            state[:, 1] - g["two_dx1"] * self._gcv[0, comp],
            0.0,
        )
        ghost_right = jnp.where(
            self._gcm[1, comp],
            state[:, width - 2]
            + g["two_dx1"] * self._gcv[1, comp],
            0.0,
        )
        col_parts = [
            lap[:, 0:1]
            + ghost_left[:, jnp.newaxis] * g["inv_dx1_sqr"],
            lap[:, 1: width - 1],
            lap[:, width - 1: width]
            + ghost_right[:, jnp.newaxis] * g["inv_dx1_sqr"],
        ]
        if g["col_pad"] is not None:
            col_parts.append(g["col_pad"])
        return self.sanitize(jnp.concatenate(col_parts, axis=1))

    def gradient_0(self, comp, state):
        g = self._g
        grm = self._faces["ghost_row_mask"]
        grv = self._faces["ghost_row_vals"]
        above, below, _, _ = self._shifts(state)
        gradient = (below - above) * g["inv_two_dx0"]

        def constrained_fix(face):
            def fix(row):
                return jnp.where(grm[face, comp], grv[face, comp], row)

            return fix

        fixes = self._boundary_row_fixes(
            constrained_fix, self._ghost_rows_present
        )
        if fixes:
            gradient = _override_rows(gradient, fixes)
        return self.sanitize(gradient)

    def gradient_1(self, comp, state):
        g = self._g
        width = g["width"]
        _, _, left, right = self._shifts(state)
        gradient = (right - left) * g["inv_two_dx1"]
        if not self._ghost_cols_present:
            if g["col_pad"] is not None:
                gradient = jnp.concatenate(
                    [gradient[:, :width], g["col_pad"]], axis=1
                )
            return self.sanitize(gradient)
        col_parts = [
            jnp.where(
                self._gcm[0, comp], self._gcv[0, comp], gradient[:, 0]
            )[:, jnp.newaxis],
            gradient[:, 1: width - 1],
            jnp.where(
                self._gcm[1, comp],
                self._gcv[1, comp],
                gradient[:, width - 1],
            )[:, jnp.newaxis],
        ]
        if g["col_pad"] is not None:
            col_parts.append(g["col_pad"])
        return self.sanitize(jnp.concatenate(col_parts, axis=1))


def build_tiled_system_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    interpret: bool = False,
    storage_dtype=None,
):
    """Builds ``trajectory(y) -> ys`` computing ``n_steps`` fused RK4
    system steps on a grid too large for VMEM, via overlapped row
    tiles. Semantically identical to :func:`pararealml_tpu.ops.
    fused_system.build_fused_system_rk4_trajectory`.

    ``storage_dtype`` selects the HBM state/trajectory precision
    (``jnp.bfloat16`` halves the kernel's HBM and DMA traffic; all
    stencil arithmetic stays f32 — tiles up-convert on load and round
    once per step on store)."""
    from jax.experimental.pallas import tpu as pltpu

    from pararealml_tpu.ops.fused_system import _make_step_factory

    diff_eq = cp.differential_equation
    if isinstance(diff_eq, NavierStokesEquation):
        raise ValueError(
            "the Navier-Stokes stream-function solve iterates over the "
            "whole grid and cannot be row-tiled"
        )
    n = diff_eq.y_dimension
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
    plan = make_system_tile_plan(height, width, n, sublane)
    if plan is None:
        raise ValueError("grid outside the tiled kernel's range")
    if not dirichlet_is_face_only(cp):
        raise ValueError(
            "the tiled kernel represents Dirichlet constraints as face "
            "vectors; interior static y constraints are not supported"
        )
    block, n_tiles, tile_h, h_buf, h_traj, w_pad, starts, halo = plan
    d_x0, d_x1 = mesh.d_x
    faces = _component_face_tensors(cp, plan, n)
    dtype = jnp.float32
    step_factory = _make_step_factory(diff_eq, d_t, mesh)

    # static emptiness flags, computed host-side so constraint stages
    # with no constraints compile to nothing
    _grm = np.asarray(faces["ghost_row_mask"])
    _gcm = np.asarray(faces["ghost_col_mask"])
    _drm = np.asarray(faces["dir_row_mask"])
    _dcm = np.asarray(faces["dir_col_mask"])
    present = dict(
        ghost_rows=(bool(_grm[0].any()), bool(_grm[1].any())),
        ghost_cols=[bool(_gcm[i].any()) for i in range(n_tiles)],
        dir_rows=(bool(_drm[0].any()), bool(_drm[1].any())),
        dir_cols=[bool(_dcm[i].any()) for i in range(n_tiles)],
    )

    geometry_static = dict(
        plan=plan,
        height=height,
        width=width,
        inv_dx0_sqr=1.0 / float(d_x0) ** 2,
        inv_dx1_sqr=1.0 / float(d_x1) ** 2,
        inv_two_dx0=1.0 / (2.0 * float(d_x0)),
        inv_two_dx1=1.0 / (2.0 * float(d_x1)),
        two_dx0=2.0 * float(d_x0),
        two_dx1=2.0 * float(d_x1),
    )

    def kernel(
        y0_ref,  # (n, h_buf, w_pad) initial state
        dir_row_mask_ref,
        dir_row_vals_ref,
        dir_col_mask_ref,
        dir_col_vals_ref,
        ghost_row_mask_ref,
        ghost_row_vals_ref,
        ghost_col_mask_ref,
        ghost_col_vals_ref,
        traj_ref,  # (n_steps, n, h_traj, w_pad) HBM
        state_ref,  # (2, n, h_buf, w_pad) HBM ping-pong
        in_buf,  # (2, n, tile_h, w_pad) VMEM
        out_state,  # (2, n, block, w_pad) VMEM
        in_sems,  # (2, n)
        state_sems,  # (2, n)
        traj_sems,  # (2, n)
    ):
        kernel_faces = dict(
            ghost_row_mask=ghost_row_mask_ref[:],
            ghost_row_vals=ghost_row_vals_ref[:],
            ghost_col_mask=ghost_col_mask_ref[:],
            ghost_col_vals=ghost_col_vals_ref[:],
            dir_col_mask=dir_col_mask_ref[:],
            dir_col_vals=dir_col_vals_ref[:],
        )
        dir_row_mask = dir_row_mask_ref[:]
        dir_row_vals = dir_row_vals_ref[:]

        # seed the ping-pong state with the initial condition
        for comp in range(n):
            init = pltpu.make_async_copy(
                y0_ref.at[comp],
                state_ref.at[0, comp],
                in_sems.at[0, comp],
            )
            init.start()
            init.wait()

        geometry = dict(
            geometry_static,
            zero_row=jnp.zeros((1, w_pad), dtype),
            zero_col=jnp.zeros((tile_h, 1), dtype),
            col_pad=(
                jnp.zeros((tile_h, w_pad - width), dtype)
                if w_pad > width
                else None
            ),
        )

        def in_dma(src_slot, i, buf_slot, comp):
            return pltpu.make_async_copy(
                state_ref.at[src_slot, comp, pl.ds(starts[i], tile_h)],
                in_buf.at[buf_slot, comp],
                in_sems.at[buf_slot, comp],
            )

        def state_dma(dst_slot, i, buf_slot, comp):
            return pltpu.make_async_copy(
                out_state.at[buf_slot, comp],
                state_ref.at[
                    dst_slot, comp, pl.ds(halo + starts[i], block)
                ],
                state_sems.at[buf_slot, comp],
            )

        def traj_dma(k, i, buf_slot, comp):
            return pltpu.make_async_copy(
                out_state.at[buf_slot, comp],
                traj_ref.at[k, comp, pl.ds(starts[i], block)],
                traj_sems.at[buf_slot, comp],
            )

        # per-tile steps, traced once per tile so every boundary fix
        # lands on a statically-known row
        tile_steps = []
        for i in range(n_tiles):
            helpers = _TiledStencilHelpers(
                geometry, kernel_faces, i, present
            )
            dcm = kernel_faces["dir_col_mask"][i]
            dcv = kernel_faces["dir_col_vals"][i]
            dir_cols_present = present["dir_cols"][i]

            def make_dirichlet(helpers, dcm, dcv, dir_cols_present):
                def dirichlet_component(comp, plane):
                    def dir_row_fix(face):
                        def fix(row):
                            return jnp.where(
                                dir_row_mask[face, comp],
                                dir_row_vals[face, comp],
                                row,
                            )

                        return fix

                    fixes = helpers._boundary_row_fixes(
                        dir_row_fix, present["dir_rows"]
                    )
                    if fixes:
                        plane = _override_rows(plane, fixes)
                    if not dir_cols_present:
                        # no Dirichlet columns on this tile: the plane
                        # (pad columns included) passes through as is
                        return plane
                    left = jnp.where(
                        dcm[0, comp], dcv[0, comp], plane[:, 0]
                    )[:, jnp.newaxis]
                    right = jnp.where(
                        dcm[1, comp],
                        dcv[1, comp],
                        plane[:, width - 1],
                    )[:, jnp.newaxis]
                    parts = [left, plane[:, 1:width - 1], right]
                    if w_pad > width:
                        parts.append(plane[:, width:])
                    return jnp.concatenate(parts, axis=1)

                def apply_dirichlet(y):
                    return tuple(
                        dirichlet_component(comp, plane)
                        for comp, plane in enumerate(y)
                    )

                return dirichlet_component, apply_dirichlet

            dirichlet_component, apply_dirichlet = make_dirichlet(
                helpers, dcm, dcv, dir_cols_present
            )
            step = step_factory(
                helpers, apply_dirichlet, dirichlet_component
            )

            def compute_tile(y, helpers=helpers, step=step):
                return tuple(
                    helpers.sanitize(plane)[
                        halo:halo + block
                    ].astype(storage_dtype)
                    for plane in step(
                        tuple(
                            helpers.sanitize(p.astype(dtype))
                            for p in y
                        )
                    )
                )

            tile_steps.append(compute_tile)

        def step_loop(k, _):
            src_slot = jax.lax.rem(k, 2)
            dst_slot = jax.lax.rem(k + 1, 2)

            for comp in range(n):
                in_dma(src_slot, 0, 0, comp).start()
            for i in range(n_tiles):
                buf_slot = i % 2
                if i + 1 < n_tiles:
                    for comp in range(n):
                        in_dma(
                            src_slot, i + 1, (i + 1) % 2, comp
                        ).start()
                for comp in range(n):
                    in_dma(src_slot, i, buf_slot, comp).wait()
                result = tile_steps[i](
                    tuple(in_buf[buf_slot, comp] for comp in range(n))
                )

                if i >= 2:
                    for comp in range(n):
                        state_dma(dst_slot, i - 2, buf_slot, comp).wait()
                        traj_dma(k, i - 2, buf_slot, comp).wait()

                for comp in range(n):
                    out_state[buf_slot, comp] = result[comp]
                    state_dma(dst_slot, i, buf_slot, comp).start()
                    traj_dma(k, i, buf_slot, comp).start()

            for i in (n_tiles - 2, n_tiles - 1):
                slot = i % 2
                for comp in range(n):
                    state_dma(dst_slot, i, slot, comp).wait()
                    traj_dma(k, i, slot, comp).wait()
            return 0

        jax.lax.fori_loop(0, n_steps, step_loop, 0)

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(
                (n_steps, n, h_traj, w_pad), storage_dtype
            ),
            jax.ShapeDtypeStruct((2, n, h_buf, w_pad), storage_dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n, tile_h, w_pad), storage_dtype),
            pltpu.VMEM((2, n, block, w_pad), storage_dtype),
            pltpu.SemaphoreType.DMA((2, n)),
            pltpu.SemaphoreType.DMA((2, n)),
            pltpu.SemaphoreType.DMA((2, n)),
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
        planes = jnp.moveaxis(
            jnp.asarray(y, dtype).reshape(height, width, n), -1, 0
        )
        y_padded = jnp.pad(
            planes,
            (
                (0, 0),
                (halo, h_buf - halo - height),
                (0, w_pad - width),
            ),
        ).astype(storage_dtype)
        traj, _ = call(y_padded, *face_args)
        # transpose the contiguous kernel output first, slice last: the
        # slice then fuses into the consumer instead of materializing
        # the whole clean trajectory (see tiled_diffusion.trajectory)
        traj = jnp.moveaxis(traj, 1, -1)
        return traj[:, :height, :width].astype(y.dtype)

    return trajectory
