"""Width-packed batched Pallas kernels: the time axis fills the lanes.

Parareal on one chip batches its per-iteration fine sub-solves over the
slice axis (reference: one MPI rank per slice,
/root/reference/pararealml/operators/parareal/parareal_operator.py:163).
For the small grids typical of coarse-grained time decompositions a
single slice's plane is a fraction of one 8x128 VPU tile (a 21x21
Burgers component is 441 cells against 1024 lanes), so every existing
batched path wastes the vector unit:

- ``vmap`` of the generic step runs hundreds of unfused stencil ops per
  RK4 step (measured 38 ms per 400-step batch-100 iteration at 21x21 —
  half the sequential fused solve for ONE iteration);
- the Pallas batch *grid* (``fused_system.build_fused_system_rk4_end``
  with ``batch=B``) runs B underutilized programs back to back
  (measured 74 ms — no better than sequential).

This module instead packs the B slice states side by side along the
LANE axis of one plane set: component planes of shape
``(n, ph, round_up(B * (w + 1), 128))``, a zero column between
neighboring slices, and ONE kernel program advancing all slices
simultaneously — every VPU op now touches ``B x`` the data of a
single-slice op, and the whole batch stays resident in VMEM across all
RK4 steps with zero HBM round-trips between steps.

Correctness of packing: the stencils are radius-1 per stage. A slice's
edge column reads its gap neighbor, which holds zero forever (gap cells
are never written: helper outputs are masked by the in-grid column
mask), reproducing exactly the zero-halo semantics of the generic
differentiator (halo synthesis:
/root/reference/pararealml/operators/fdm/numerical_differentiator.py:
1188-1242) that the single-slice fused kernels already match. Boundary
fixes generalize from the single-grid column *slices* of
``fused_system._StencilHelpers`` to elementwise selects against
MULTI-HOT edge-column vectors (one hot column per packed slice edge) —
the same arithmetic, applied at B column positions at once. Row-face
handling is unchanged: slices are packed along width, so all of them
share the physical top/bottom boundary rows, and the row face vectors
are simply tiled along the packed width.

The equation set matches ``fused_system``'s pure-RK4 template (wave,
Burgers, shallow water, Cahn-Hilliard) on Cartesian meshes, plus the
diffusion family; Navier-Stokes is excluded because its in-kernel
Jacobi convergence check is a whole-plane norm, which on a packed plane
would couple the slices' stopping criteria and break bit-parity with B
single solves.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.differential_equation import (
    BurgersEquation,
    CahnHilliardEquation,
    ConvectionDiffusionEquation,
    DiffusionEquation,
    ShallowWaterEquation,
    WaveEquation,
)
from pararealml_tpu.mesh import CoordinateSystem

_PACKED_EQUATION_TYPES = (
    WaveEquation,
    BurgersEquation,
    ShallowWaterEquation,
    CahnHilliardEquation,
    DiffusionEquation,
    ConvectionDiffusionEquation,
)

# all component planes, the RK4 stage temporaries, and (for the
# trajectory kernel) the double-buffered DMA scratch must fit VMEM;
# same live-plane model as fused_system._fits_vmem
_VMEM_BUDGET_CELLS = 3_000_000


def _packed_width(width: int, batch: int) -> int:
    stride = width + 1  # one zero gap column between neighbors
    return -(-(batch * stride) // 128) * 128


def packed_system_applicable(
    cp: ConstrainedProblem, integrator, batch: int
) -> bool:
    """Whether the packed batched kernel reproduces B generic-path
    sub-solves exactly for this problem."""
    from pararealml_tpu.operators.fdm.numerical_integrator import RK4

    diff_eq = cp.differential_equation
    if not (
        not jax.config.read("jax_enable_x64")
        and isinstance(integrator, RK4)
        and type(diff_eq) in _PACKED_EQUATION_TYPES
        and diff_eq.x_dimension == 2
        and cp.mesh is not None
        and cp.mesh.coordinate_system_type == CoordinateSystem.CARTESIAN
        and cp.are_all_boundary_conditions_static
        and batch >= 2
    ):
        return False
    height, width = cp.mesh.vertices_shape
    n = diff_eq.y_dimension
    ph = -(-height // 8) * 8
    if ph == height:  # matches _PackedConfig's roll-safety padding row
        ph += 8
    cells = ph * _packed_width(width, batch)
    return cells * (7 * n + 4) <= _VMEM_BUDGET_CELLS


class _PackedStencilHelpers:
    """``fused_system._StencilHelpers``'s interface over a packed plane.

    Row handling is identical to the single-grid helpers (shared
    boundary rows, composed from static row slices — cheap in Mosaic);
    column handling replaces the two per-face column slices with
    elementwise selects against multi-hot edge vectors, valid at every
    packed slice's edges at once. ``in_grid`` masking (gaps, lane pad,
    row pad) replaces ``_zero_pads``.
    """

    def __init__(
        self,
        geometry,
        ghost_row_mask,
        ghost_row_vals,
        ghost_col_mask,
        ghost_col_vals,
        use_rolls: bool = False,
    ):
        self._g = geometry
        self._grm = ghost_row_mask  # (2, n, Wp) tiled along width
        self._grv = ghost_row_vals
        # column-face masks as f32: their per-row vectors broadcast
        # against (ph, Wp) planes via a minor-dim insert, which Mosaic
        # only lowers for 32-bit element types (i1 reshape is rejected)
        self._gcm = ghost_col_mask.astype(
            jnp.float32
        )  # (2, n, ph) shared by all slices
        self._gcv = ghost_col_vals
        self._use_rolls = use_rolls
        self._shift_cache = {}

    def _shifts(self, state):
        # memoized per traced plane: the RHS calls laplacian plus both
        # gradients on the same state, and each needs the same four
        # shifted copies (the held reference keeps the tracer alive so
        # ids cannot be recycled within a trace)
        cached = self._shift_cache.get(id(state))
        if cached is not None and cached[0] is state:
            return cached[1]
        g = self._g
        if self._use_rolls:
            # pltpu.roll beats zero-concatenated shift copies on TPU
            # (see tiled_diffusion). Wrap-around is structurally
            # harmless in the packed layout: the plane's padding rows
            # are below ``height`` + every slice trails a zero gap
            # column (and the plan guarantees ph > height), so each
            # wrapped row/lane is either zero or lands in cells the
            # helpers' ``_mask`` re-zeroes
            from jax.experimental.pallas import tpu as pltpu

            ph, wp = state.shape
            above = pltpu.roll(state, 1, 0)
            below = pltpu.roll(state, ph - 1, 0)
            left = pltpu.roll(state, 1, 1)
            right = pltpu.roll(state, wp - 1, 1)
        else:
            above = jnp.concatenate(
                [g["zero_row"], state[:-1, :]], axis=0
            )
            below = jnp.concatenate(
                [state[1:, :], g["zero_row"]], axis=0
            )
            left = jnp.concatenate(
                [g["zero_col"], state[:, :-1]], axis=1
            )
            right = jnp.concatenate(
                [state[:, 1:], g["zero_col"]], axis=1
            )
        shifts = (above, below, left, right)
        self._shift_cache[id(state)] = (state, shifts)
        return shifts

    def _mask(self, x):
        """Zeroes gaps, lane padding, and pad rows so garbage can never
        leak back into real vertices through the shift stencils."""
        return x * self._g["in_grid"]

    def over_r(self, plane):
        raise NotImplementedError(
            "packed kernels are Cartesian-only"
        )

    def laplacian(self, comp, state):
        g = self._g
        above, below, left, right = self._shifts(state)
        d2_0 = (above - 2.0 * state + below) * g["inv_dx0_sqr"]
        # Neumann ghost rows: the shared top/bottom boundary rows of
        # every packed slice (identical row composition to the
        # single-grid helpers, constants pre-tiled along the width)
        height = g["height"]
        ghost_top = jnp.where(
            self._grm[0, comp],
            state[1, :] - g["two_dx0"] * self._grv[0, comp],
            0.0,
        )
        ghost_bottom = jnp.where(
            self._grm[1, comp],
            state[height - 2, :]
            + g["two_dx0"] * self._grv[1, comp],
            0.0,
        )
        parts = [
            d2_0[0:1, :]
            + ghost_top[jnp.newaxis] * g["inv_dx0_sqr"],
            d2_0[1: height - 1, :],
            d2_0[height - 1: height, :]
            + ghost_bottom[jnp.newaxis] * g["inv_dx0_sqr"],
        ]
        if d2_0.shape[0] > height:
            parts.append(d2_0[height:, :])
        d2_0 = jnp.concatenate(parts, axis=0)
        d2_1 = (left - 2.0 * state + right) * g["inv_dx1_sqr"]
        # Neumann ghost columns at EVERY packed slice's left/right
        # edges simultaneously: the single-grid column slices become
        # multi-hot-masked full-plane terms. ``right``/``left`` at an
        # edge column are exactly the inside-neighbor values the
        # single-grid code reads as state[:, 1] / state[:, width - 2].
        ghost_left = self._gcm[0, comp][:, jnp.newaxis] * (
            right - g["two_dx1"] * self._gcv[0, comp][:, jnp.newaxis]
        )
        ghost_right = self._gcm[1, comp][:, jnp.newaxis] * (
            left + g["two_dx1"] * self._gcv[1, comp][:, jnp.newaxis]
        )
        d2_1 = (
            d2_1
            + ghost_left * g["edge_left"] * g["inv_dx1_sqr"]
            + ghost_right * g["edge_right"] * g["inv_dx1_sqr"]
        )
        return self._mask(d2_0 + d2_1)

    def gradient_0(self, comp, state):
        g = self._g
        height = g["height"]
        above, below, _, _ = self._shifts(state)
        gradient = (below - above) * g["inv_two_dx0"]
        parts = [
            jnp.where(
                self._grm[0, comp],
                self._grv[0, comp],
                gradient[0:1, :],
            ),
            gradient[1: height - 1, :],
            jnp.where(
                self._grm[1, comp],
                self._grv[1, comp],
                gradient[height - 1: height, :],
            ),
        ]
        if gradient.shape[0] > height:
            parts.append(gradient[height:, :])
        return self._mask(jnp.concatenate(parts, axis=0))

    def gradient_1(self, comp, state):
        g = self._g
        _, _, left, right = self._shifts(state)
        gradient = (right - left) * g["inv_two_dx1"]
        # constrained normal derivative replaces the computed value at
        # masked edge columns (of every packed slice)
        replace_left = (
            g["edge_left"] * self._gcm[0, comp][:, jnp.newaxis]
        )
        replace_right = (
            g["edge_right"] * self._gcm[1, comp][:, jnp.newaxis]
        )
        gradient = (
            gradient * (1.0 - replace_left - replace_right)
            + replace_left * self._gcv[0, comp][:, jnp.newaxis]
            + replace_right * self._gcv[1, comp][:, jnp.newaxis]
        )
        return self._mask(gradient)


class _PackedConfig:
    """Static geometry and packed constant tensors for a batch of
    identical sub-problems side by side along the lane axis."""

    def __init__(self, cp: ConstrainedProblem, d_t: float, batch: int):
        from pararealml_tpu.ops.fused_system import (
            _component_constraint_tensors,
            _make_step_factory,
        )

        diff_eq = cp.differential_equation
        self.n = n = diff_eq.y_dimension
        mesh = cp.mesh
        self.batch = batch
        self.height, self.width = height, width = mesh.vertices_shape
        self.stride = stride = width + 1
        # at least one all-zero padding row so roll-based shifts can
        # never wrap a real row into row 0's ``above``
        ph = -(-height // 8) * 8
        if ph == height:
            ph += 8
        self.padded_height = ph
        self.packed_width = wp = _packed_width(width, batch)
        d_x0, d_x1 = mesh.d_x
        self.dtype = dtype = jnp.float32
        self.step_factory = _make_step_factory(diff_eq, d_t, mesh)

        constants = _component_constraint_tensors(cp, n)

        def pack_width(array):
            """(..., width) -> (..., Wp) with each slice's copy at its
            packed offset and zeros in gaps and lane padding."""
            array = np.asarray(array)
            padded = np.zeros(array.shape[:-1] + (stride,), array.dtype)
            padded[..., :width] = array
            tiled = np.broadcast_to(
                padded[..., np.newaxis, :],
                array.shape[:-1] + (batch, stride),
            ).reshape(array.shape[:-1] + (batch * stride,))
            out = np.zeros(array.shape[:-1] + (wp,), array.dtype)
            out[..., : batch * stride] = tiled
            return out

        def pad_height(array):
            """(..., height, X) -> (..., ph, X)."""
            array = np.asarray(array)
            pad = [(0, 0)] * (array.ndim - 2) + [
                (0, ph - height),
                (0, 0),
            ]
            return np.pad(array, pad)

        self.geometry_static = dict(
            height=height,
            inv_dx0_sqr=np.float32(1.0 / float(d_x0) ** 2),
            inv_dx1_sqr=np.float32(1.0 / float(d_x1) ** 2),
            inv_two_dx0=np.float32(1.0 / (2.0 * float(d_x0))),
            inv_two_dx1=np.float32(1.0 / (2.0 * float(d_x1))),
            two_dx0=np.float32(2.0 * float(d_x0)),
            two_dx1=np.float32(2.0 * float(d_x1)),
        )
        self.packed_constants = (
            jnp.asarray(
                pad_height(pack_width(constants["dir_mask"]))
            ),
            jnp.asarray(
                pad_height(
                    pack_width(constants["dir_vals"])
                ).astype(np.float32)
            ),
            jnp.asarray(pack_width(constants["ghost_row_mask"])),
            jnp.asarray(
                pack_width(constants["ghost_row_vals"]).astype(
                    np.float32
                )
            ),
            # column faces: per-row vectors shared by every slice
            jnp.asarray(
                np.pad(
                    constants["ghost_col_mask"],
                    ((0, 0), (0, 0), (0, ph - height)),
                )
            ),
            jnp.asarray(
                np.pad(
                    constants["ghost_col_vals"],
                    ((0, 0), (0, 0), (0, ph - height)),
                ).astype(np.float32)
            ),
        )

    def make_step(
        self,
        dir_mask,
        dir_vals,
        ghost_row_mask,
        ghost_row_vals,
        ghost_col_mask,
        ghost_col_vals,
    ):
        dtype = self.dtype
        ph, wp = self.padded_height, self.packed_width
        # the packed-layout masks are pure functions of the column
        # index, so they are generated in-kernel from integer iotas
        # (which Mosaic lowers natively) instead of riding in as
        # plane-sized constant tensors
        col = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        offset = jax.lax.rem(col, self.stride)
        in_width = (offset < self.width) & (
            col < self.batch * self.stride
        )
        row = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0)
        # combined as f32 products: i1 vectors cannot broadcast along
        # the minor dim in Mosaic
        in_grid = in_width.astype(dtype) * (
            row < self.height
        ).astype(dtype)
        edge_left = (
            ((offset == 0) & (col < self.batch * self.stride))
            .astype(dtype)
        )
        edge_right = (
            (offset == self.width - 1)
            & (col < self.batch * self.stride)
        ).astype(dtype)
        geometry = dict(
            self.geometry_static,
            in_grid=in_grid,
            edge_left=edge_left,
            edge_right=edge_right,
            zero_row=jnp.zeros((1, wp), dtype),
            zero_col=jnp.zeros((ph, 1), dtype),
        )
        helpers = _PackedStencilHelpers(
            geometry,
            ghost_row_mask,
            ghost_row_vals,
            ghost_col_mask,
            ghost_col_vals,
        )

        def dirichlet_component(comp, plane):
            return jnp.where(dir_mask[comp], dir_vals[comp], plane)

        def apply_dirichlet(y):
            return tuple(
                dirichlet_component(comp, plane)
                for comp, plane in enumerate(y)
            )

        return self.step_factory(
            helpers, apply_dirichlet, dirichlet_component
        )

    # -- host-side packing ---------------------------------------------------

    def pack(self, y: jax.Array) -> jax.Array:
        """(B, h, w, n) batch -> (n, ph, Wp) packed planes."""
        batch, stride = self.batch, self.stride
        height, width, n = self.height, self.width, self.n
        planes = jnp.asarray(y, self.dtype).reshape(
            batch, height, width, n
        )
        planes = jnp.pad(
            planes, ((0, 0), (0, 0), (0, stride - width), (0, 0))
        )
        # (B, h, stride, n) -> (n, h, B, stride) -> (n, h, B * stride)
        packed = jnp.moveaxis(planes, -1, 0).transpose(0, 2, 1, 3)
        packed = packed.reshape(n, height, batch * stride)
        return jnp.pad(
            packed,
            (
                (0, 0),
                (0, self.padded_height - height),
                (0, self.packed_width - batch * stride),
            ),
        )

    def unpack(self, packed: jax.Array) -> jax.Array:
        """(..., n, ph, Wp) packed planes -> (..., B, h, w, n).

        The whole unpacking is one slice + reshape + SINGLE transpose,
        so XLA lowers it to one copy pass over the data — on trajectory
        arrays (hundreds of MB) a chain of ``moveaxis`` calls would
        cost extra full-array passes."""
        batch, stride = self.batch, self.stride
        height, width, n = self.height, self.width, self.n
        out = packed[..., :height, : batch * stride]
        out = out.reshape(out.shape[:-1] + (batch, stride))[
            ..., :width
        ]
        # (..., n, h, B, w) -> (..., B, h, w, n)
        lead = out.ndim - 4
        perm = tuple(range(lead)) + (
            lead + 2,
            lead + 1,
            lead + 3,
            lead,
        )
        return jnp.transpose(out, perm)


def build_packed_system_rk4_ends(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    batch: int,
    interpret: bool = False,
):
    """Builds ``ends(y) -> y_final`` advancing every one of ``batch``
    stacked sub-states ``(B, h, w, n)`` by ``n_steps`` fused RK4 steps
    in ONE kernel program, returning only the final states.

    The packed batch stays in VMEM for the whole solve — no per-step
    HBM traffic at all (the ends-only analog of
    ``fused_system.build_fused_system_rk4_end``, but batched along the
    lane axis instead of the Pallas grid so small grids still fill the
    VPU).
    """
    from jax.experimental.pallas import tpu as pltpu

    cfg = _PackedConfig(cp, d_t, batch)
    n = cfg.n

    def kernel(
        y_ref,
        dir_mask_ref,
        dir_vals_ref,
        ghost_row_mask_ref,
        ghost_row_vals_ref,
        ghost_col_mask_ref,
        ghost_col_vals_ref,
        out_ref,
    ):
        step = cfg.make_step(
            dir_mask_ref[:],
            dir_vals_ref[:],
            ghost_row_mask_ref[:],
            ghost_row_vals_ref[:],
            ghost_col_mask_ref[:],
            ghost_col_vals_ref[:],
        )
        final = jax.lax.fori_loop(
            0,
            n_steps,
            lambda k, carry: step(carry),
            tuple(y_ref[comp] for comp in range(n)),
        )
        for comp, plane in enumerate(final):
            out_ref[comp] = plane

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n, cfg.padded_height, cfg.packed_width), cfg.dtype
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def ends(y: jax.Array) -> jax.Array:
        out = call(cfg.pack(y), *cfg.packed_constants)
        return cfg.unpack(out).reshape(y.shape).astype(y.dtype)

    return ends


def build_packed_system_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    batch: int,
    interpret: bool = False,
    traj_dtype=None,
):
    """Builds ``trajectory(y) -> ys`` computing all ``batch`` stacked
    sub-trajectories ``(B, h, w, n) -> (B, n_steps, h, w, n)`` in ONE
    kernel program, each step's packed plane set streamed to HBM with
    double-buffered async DMA (the batched analog of
    ``fused_system.build_fused_system_rk4_trajectory``).

    ``traj_dtype`` rounds the STREAMED per-step snapshots (e.g. to
    bfloat16, halving the kernel's HBM write traffic and the unpacking
    epilogue's read traffic); the carried state that integration
    actually advances stays in the working dtype, so rounding affects
    stored frames only, never the dynamics — the same contract as
    ``resident_diffusion``'s snapshot dtype. The returned array is cast
    back to the input dtype.

    Snapshots are grouped into multi-step DMA batches: at ~5 us of
    compute per step, per-copy issue overhead on ~0.5 MB frames is a
    measurable fraction of the stream, so the kernel accumulates
    ``steps_per_dma`` frames in a VMEM slot and ships them as one
    copy, sized to the largest power of two that divides ``n_steps``
    and fits the VMEM budget."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = _PackedConfig(cp, d_t, batch)
    n = cfg.n
    snapshot_dtype = jnp.dtype(
        traj_dtype if traj_dtype is not None else cfg.dtype
    )
    cells = cfg.padded_height * cfg.packed_width
    steps_per_dma = 1
    for candidate in (8, 4, 2):
        if (
            n_steps % candidate == 0
            and cells * (7 * n + 4 + 2 * candidate * n)
            <= _VMEM_BUDGET_CELLS
        ):
            steps_per_dma = candidate
            break

    def kernel(
        y_ref,
        dir_mask_ref,
        dir_vals_ref,
        ghost_row_mask_ref,
        ghost_row_vals_ref,
        ghost_col_mask_ref,
        ghost_col_vals_ref,
        traj_ref,  # (n_steps, n, ph, Wp) in HBM
        scratch_ref,  # (2 slots, steps_per_dma, n, ph, Wp) VMEM
        copy_sems,
    ):
        step = cfg.make_step(
            dir_mask_ref[:],
            dir_vals_ref[:],
            ghost_row_mask_ref[:],
            ghost_row_vals_ref[:],
            ghost_col_mask_ref[:],
            ghost_col_vals_ref[:],
        )

        spd = steps_per_dma
        n_groups = n_steps // spd

        def body(k, carry):
            y = step(carry)
            group = k // spd
            index = jax.lax.rem(k, spd)
            slot = jax.lax.rem(group, 2)

            # before overwriting a slot's first frame, the copy that
            # shipped this slot two groups ago must have completed
            @pl.when(jnp.logical_and(index == 0, group >= 2))
            def _():
                pltpu.make_async_copy(
                    scratch_ref.at[slot],
                    traj_ref.at[pl.ds((group - 2) * spd, spd)],
                    copy_sems.at[slot],
                ).wait()

            for comp, plane in enumerate(y):
                scratch_ref[slot, index, comp] = plane.astype(
                    snapshot_dtype
                )

            @pl.when(index == spd - 1)
            def _():
                pltpu.make_async_copy(
                    scratch_ref.at[slot],
                    traj_ref.at[pl.ds(group * spd, spd)],
                    copy_sems.at[slot],
                ).start()

            return y

        jax.lax.fori_loop(
            0,
            n_steps,
            body,
            tuple(y_ref[comp] for comp in range(n)),
        )

        @pl.when(n_groups >= 2)
        def _():
            slot = jax.lax.rem(n_groups - 2, 2)
            pltpu.make_async_copy(
                scratch_ref.at[slot],
                traj_ref.at[pl.ds((n_groups - 2) * spd, spd)],
                copy_sems.at[slot],
            ).wait()

        @pl.when(n_groups >= 1)
        def _():
            slot = jax.lax.rem(n_groups - 1, 2)
            pltpu.make_async_copy(
                scratch_ref.at[slot],
                traj_ref.at[pl.ds((n_groups - 1) * spd, spd)],
                copy_sems.at[slot],
            ).wait()

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_steps, n, cfg.padded_height, cfg.packed_width),
            snapshot_dtype,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(
                (
                    2,
                    steps_per_dma,
                    n,
                    cfg.padded_height,
                    cfg.packed_width,
                ),
                snapshot_dtype,
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def unpack_trajectory(packed: jax.Array, y_shape) -> jax.Array:
        # (steps, n, ph, Wp) -> (B, steps, h, w, n) in one slice +
        # reshape + single transpose: the trajectory is hundreds of MB,
        # so every avoided extra pass is milliseconds of HBM time on
        # Parareal's critical path
        height, width, n_comp = cfg.height, cfg.width, cfg.n
        out = packed[:, :, :height, : cfg.batch * cfg.stride]
        out = out.reshape(
            n_steps, n_comp, height, cfg.batch, cfg.stride
        )[..., :width]
        out = jnp.transpose(out, (3, 0, 2, 4, 1))
        return out.reshape(
            (cfg.batch, n_steps) + tuple(y_shape)
        ).astype(cfg.dtype)

    def unpack_last(packed: jax.Array, y_shape) -> jax.Array:
        # the final frame only — a ~sub-MB unpack for consumers (the
        # Parareal iteration loop) that need just the slice END states
        # while the full trajectory stays packed in the loop carry
        frame = cfg.unpack(packed[-1])
        return frame.reshape((cfg.batch,) + tuple(y_shape)).astype(
            cfg.dtype
        )

    def trajectory(y: jax.Array) -> jax.Array:
        out = call(cfg.pack(y), *cfg.packed_constants)
        return unpack_trajectory(out, y.shape[1:]).astype(y.dtype)

    def trajectory_raw(y: jax.Array) -> jax.Array:
        """The kernel's untransformed (steps, n, ph, Wp) output, for
        callers that carry the trajectory through a loop and want to
        defer the unpacking transpose until after it."""
        return call(cfg.pack(y), *cfg.packed_constants)

    trajectory.raw = trajectory_raw
    trajectory.unpack = unpack_trajectory
    trajectory.unpack_last = unpack_last
    trajectory.pack_states = lambda y: cfg.pack(y).astype(
        snapshot_dtype
    )

    return trajectory
