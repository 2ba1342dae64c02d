"""Fused Pallas TPU kernels for 2D diffusion-family RK4 steps.

The generic FDM path builds each Laplacian from padded/concatenated
shifted arrays; XLA materializes many of those intermediates, so a full
RK4 step on a large grid touches HBM dozens of times (measured ~2.5% of
v5e HBM bandwidth at 641x641). This kernel computes the *entire* RK4
step — all four Laplacian stages, Neumann ghost synthesis, and Dirichlet
constraint application — inside VMEM with one HBM read of y and one HBM
write of the result, which is the speed-of-light traffic for a stencil
time step.

Applicability (checked by :func:`fused_diffusion_step_applicable`): a
single-component 2D Cartesian ``DiffusionEquation`` or
``ConvectionDiffusionEquation`` problem with static boundary conditions,
solved with RK4 — the reference's flagship
benchmark configuration (examples/diffusion_2d_parareal.py). Everything
else falls back to the fully general jnp path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.differential_equation import (
    ConvectionDiffusionEquation,
    DiffusionEquation,
)
from pararealml_tpu.mesh import CoordinateSystem

# VMEM is ~16 MB per core and the kernel holds ~10 live padded (H, W)
# f32 arrays (state, shifts, stages, double-buffered scratch); grids up
# to ~500x500 compile and run (empirically validated on v5e), larger
# ones fall back to the generic path.
_MAX_VMEM_CELLS = 504 * 512


def fused_diffusion_step_applicable(
    cp: ConstrainedProblem, integrator
) -> bool:
    """Whether a fused kernel (whole-grid-in-VMEM for small grids,
    block-tiled for large ones) reproduces the generic path exactly for
    this problem."""
    from pararealml_tpu.operators.fdm.numerical_integrator import RK4

    diff_eq = cp.differential_equation
    # exact-type check: a user subclass may override the symbolic
    # equation system (e.g. add a reaction term) that the fused kernel
    # would silently ignore
    if not (
        not jax.config.read("jax_enable_x64")
        and type(diff_eq)
        in (DiffusionEquation, ConvectionDiffusionEquation)
        and isinstance(integrator, RK4)
        and diff_eq.x_dimension == 2
        and diff_eq.y_dimension == 1
        and cp.mesh is not None
        and cp.mesh.coordinate_system_type == CoordinateSystem.CARTESIAN
        and cp.are_all_boundary_conditions_static
    ):
        return False
    if _padded_cells(cp.mesh.vertices_shape) <= _MAX_VMEM_CELLS:
        return True

    from pararealml_tpu.ops.tiled_diffusion import (
        dirichlet_is_face_only,
        make_tile_plan,
    )

    return (
        make_tile_plan(*cp.mesh.vertices_shape) is not None
        and dirichlet_is_face_only(cp)
    )


def _padded_cells(shape) -> int:
    height, width = shape
    return (-(-height // 8) * 8) * (-(-width // 128) * 128)


def _face_vectors(pair, length: int):
    """Extracts the dense (mask, values) vectors of both sides of a
    boundary constraint pair (zero-mask when a side is None)."""
    sides = []
    for side_constraint in (pair.lower, pair.upper) if pair else (None,
                                                                  None):
        if side_constraint is None:
            sides.append(
                (np.zeros(length, bool), np.zeros(length, np.float64))
            )
        else:
            mask = np.asarray(side_constraint.mask).reshape(length)
            values = np.asarray(side_constraint.values).reshape(length)
            sides.append((mask, values))
    return sides


def _constraint_tensors(cp: ConstrainedProblem):
    """Extracts the dense static constraint tensors the kernels need."""
    mesh = cp.mesh
    height, width = mesh.vertices_shape
    dtype = jnp.float32

    if cp.static_y_vertex_constraints is not None:
        dir_mask = np.asarray(
            cp.static_y_vertex_constraints.mask
        ).reshape(height, width)
        dir_vals = np.asarray(
            cp.static_y_vertex_constraints.values
        ).reshape(height, width)
    else:
        dir_mask = np.zeros((height, width), bool)
        dir_vals = np.zeros((height, width))

    d_y = cp.static_boundary_vertex_constraints.d_y
    (row_lo_mask, row_lo_vals), (row_hi_mask, row_hi_vals) = (
        _face_vectors(d_y[0], width)
    )
    (col_lo_mask, col_lo_vals), (col_hi_mask, col_hi_vals) = (
        _face_vectors(d_y[1], height)
    )
    return dict(
        dir_mask=jnp.asarray(dir_mask),
        dir_vals=jnp.asarray(dir_vals, dtype),
        ghost_row_mask=jnp.asarray(
            np.stack([row_lo_mask, row_hi_mask])
        ),
        ghost_row_vals=jnp.asarray(
            np.stack([row_lo_vals, row_hi_vals]), dtype
        ),
        ghost_col_mask=jnp.asarray(
            np.stack([col_lo_mask, col_hi_mask])
        ),
        ghost_col_vals=jnp.asarray(
            np.stack([col_lo_vals, col_hi_vals]), dtype
        ),
    )


class _KernelConfig:
    """Shared static configuration for the VMEM-resident diffusion
    kernels: grid geometry, padded constant tensors, and the RK4 step
    factory both the trajectory and the end-only kernel body call with
    the constant values read from their refs."""

    def __init__(self, cp: ConstrainedProblem, d_t, diffusion_coefficient):
        diff_eq = cp.differential_equation
        mesh = cp.mesh
        self.height, self.width = height, width = mesh.vertices_shape
        d_x0, d_x1 = mesh.d_x
        self.dtype = jnp.float32
        # pad to the TPU tile grid so the per-step DMA slices are
        # aligned; the padding region stays zero and never feeds back
        # into the logical grid (all reads crossing the logical edges
        # are overridden with ghost values)
        self.padded_height = -(-height // 8) * 8
        self.padded_width = -(-width // 128) * 128

        self.d = float(diffusion_coefficient)
        if isinstance(diff_eq, ConvectionDiffusionEquation):
            self.velocity = tuple(float(v) for v in diff_eq._velocity)
        else:
            self.velocity = (0.0, 0.0)
        self.has_convection = any(v != 0.0 for v in self.velocity)
        self.d_t = float(d_t)
        self.inv_dx0_sqr = 1.0 / float(d_x0) ** 2
        self.inv_dx1_sqr = 1.0 / float(d_x1) ** 2
        self.inv_two_dx0 = 1.0 / (2.0 * float(d_x0))
        self.inv_two_dx1 = 1.0 / (2.0 * float(d_x1))
        self.two_dx0 = 2.0 * float(d_x0)
        self.two_dx1 = 2.0 * float(d_x1)

        constants = _constraint_tensors(cp)
        self.padded_constants = (
            self.pad_grid(constants["dir_mask"]),
            self.pad_grid(constants["dir_vals"]),
            jnp.pad(
                constants["ghost_row_mask"],
                ((0, 0), (0, self.padded_width - width)),
            ),
            jnp.pad(
                constants["ghost_row_vals"],
                ((0, 0), (0, self.padded_width - width)),
            ),
            jnp.pad(
                constants["ghost_col_mask"],
                ((0, 0), (0, self.padded_height - height)),
            ),
            jnp.pad(
                constants["ghost_col_vals"],
                ((0, 0), (0, self.padded_height - height)),
            ),
        )

    def pad_grid(self, array):
        return jnp.pad(
            array,
            (
                (0, self.padded_height - self.height),
                (0, self.padded_width - self.width),
            ),
        )

    def make_rk4(
        self,
        dir_mask,
        dir_vals,
        ghost_row_mask,
        ghost_row_vals,
        ghost_col_mask,
        ghost_col_vals,
    ):
        """Returns ``rk4(state) -> state`` over the padded grid, given
        the constant tensors (read from kernel refs)."""
        height, width = self.height, self.width
        padded_height, padded_width = (
            self.padded_height,
            self.padded_width,
        )
        dtype = self.dtype
        d = self.d
        d_t = self.d_t
        velocity = self.velocity
        has_convection = self.has_convection
        inv_dx0_sqr = self.inv_dx0_sqr
        inv_dx1_sqr = self.inv_dx1_sqr
        inv_two_dx0 = self.inv_two_dx0
        inv_two_dx1 = self.inv_two_dx1
        two_dx0 = self.two_dx0
        two_dx1 = self.two_dx1

        def apply_dirichlet(state):
            return jnp.where(dir_mask, dir_vals, state)

        zero_row = jnp.zeros((1, padded_width), dtype)
        zero_col = jnp.zeros((padded_height, 1), dtype)
        row_pad = jnp.zeros(
            (padded_height - height, padded_width), dtype
        )
        col_pad = jnp.zeros((padded_height, padded_width - width), dtype)

        def laplacian(state):
            # shifted copies with implicit zero ghosts; the Neumann
            # ghost contributions are added back as single-row/column
            # corrections afterwards (full-grid masked selects are an
            # order of magnitude more VPU work than 1D fixes), and the
            # padding block is zeroed so the padding region of the state
            # stays identically zero and never feeds back through the
            # shifts
            above = jnp.concatenate([zero_row, state[:-1, :]], axis=0)
            below = jnp.concatenate([state[1:, :], zero_row], axis=0)
            left = jnp.concatenate([zero_col, state[:, :-1]], axis=1)
            right = jnp.concatenate([state[:, 1:], zero_col], axis=1)
            lap = (above - 2.0 * state + below) * inv_dx0_sqr + (
                left - 2.0 * state + right
            ) * inv_dx1_sqr

            ghost_top = jnp.where(
                ghost_row_mask[0],
                state[1, :] - two_dx0 * ghost_row_vals[0],
                0.0,
            )
            ghost_bottom = jnp.where(
                ghost_row_mask[1],
                state[height - 2, :] + two_dx0 * ghost_row_vals[1],
                0.0,
            )
            row_parts = [
                lap[0:1, :] + ghost_top[jnp.newaxis] * inv_dx0_sqr,
                lap[1: height - 1, :],
                lap[height - 1: height, :]
                + ghost_bottom[jnp.newaxis] * inv_dx0_sqr,
            ]
            if padded_height > height:
                row_parts.append(row_pad)
            lap = jnp.concatenate(row_parts, axis=0)

            ghost_left = jnp.where(
                ghost_col_mask[0],
                state[:, 1] - two_dx1 * ghost_col_vals[0],
                0.0,
            )
            ghost_right = jnp.where(
                ghost_col_mask[1],
                state[:, width - 2] + two_dx1 * ghost_col_vals[1],
                0.0,
            )
            col_parts = [
                lap[:, 0:1] + ghost_left[:, jnp.newaxis] * inv_dx1_sqr,
                lap[:, 1: width - 1],
                lap[:, width - 1: width]
                + ghost_right[:, jnp.newaxis] * inv_dx1_sqr,
            ]
            if padded_width > width:
                col_parts.append(col_pad)
            lap = jnp.concatenate(col_parts, axis=1)
            rhs_value = d * lap

            if has_convection:
                # central first derivatives with the generic path's
                # semantics: zero halos, boundary values overridden by
                # the constrained normal derivative where one exists
                gradient_0 = (below - above) * inv_two_dx0
                gradient_0_parts = [
                    jnp.where(
                        ghost_row_mask[0],
                        ghost_row_vals[0],
                        gradient_0[0:1, :],
                    ),
                    gradient_0[1: height - 1, :],
                    jnp.where(
                        ghost_row_mask[1],
                        ghost_row_vals[1],
                        gradient_0[height - 1: height, :],
                    ),
                ]
                if padded_height > height:
                    gradient_0_parts.append(row_pad)
                gradient_0 = jnp.concatenate(gradient_0_parts, axis=0)

                gradient_1 = (right - left) * inv_two_dx1
                gradient_1_parts = [
                    jnp.where(
                        ghost_col_mask[0],
                        ghost_col_vals[0],
                        gradient_1[:, 0],
                    )[:, jnp.newaxis],
                    gradient_1[:, 1: width - 1],
                    jnp.where(
                        ghost_col_mask[1],
                        ghost_col_vals[1],
                        gradient_1[:, width - 1],
                    )[:, jnp.newaxis],
                ]
                if padded_width > width:
                    gradient_1_parts.append(col_pad)
                gradient_1 = jnp.concatenate(gradient_1_parts, axis=1)

                rhs_value = (
                    rhs_value
                    - velocity[0] * gradient_0
                    - velocity[1] * gradient_1
                )
            return rhs_value

        def rk4(state):
            k1 = d_t * laplacian(state)
            k2 = d_t * laplacian(apply_dirichlet(state + 0.5 * k1))
            k3 = d_t * laplacian(apply_dirichlet(state + 0.5 * k2))
            k4 = d_t * laplacian(apply_dirichlet(state + k3))
            return apply_dirichlet(
                state + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
            )

        return rk4


def build_fused_diffusion_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    diffusion_coefficient: Optional[float] = None,
    interpret: bool = False,
    storage_dtype=None,
    traj_dtype=None,
    temporal_block: int = 1,
):
    """Builds ``trajectory(y) -> ys`` computing ``n_steps`` fused RK4
    diffusion steps in ONE kernel invocation.

    The state never leaves VMEM between steps; each step's result is
    streamed to the HBM trajectory buffer with an async DMA that overlaps
    the next step's compute (double-buffered). HBM traffic is therefore
    one initial read plus one write per step — the minimum possible for
    a solver that materializes the trajectory — instead of the dozens of
    intermediate round-trips of the generic XLA path.

    ``storage_dtype`` (beyond-VMEM grids only) selects the HBM
    state/trajectory precision; ``jnp.bfloat16`` halves the tiled
    kernel's HBM traffic while all stencil arithmetic stays f32 (see
    :func:`pararealml_tpu.ops.tiled_diffusion.
    build_tiled_diffusion_rk4_trajectory`). ``traj_dtype`` and
    ``temporal_block`` tune the beyond-VMEM streaming pipeline the
    same way (snapshot precision and RK4 steps per tile residency).
    The VMEM-resident kernel ignores all three (its state never
    round-trips through HBM and its snapshots DMA straight out of the
    resident state).
    """
    from jax.experimental.pallas import tpu as pltpu

    diff_eq = cp.differential_equation
    if diffusion_coefficient is None:
        diffusion_coefficient = diff_eq._d
    mesh = cp.mesh
    height, width = mesh.vertices_shape

    if _padded_cells(mesh.vertices_shape) > _MAX_VMEM_CELLS:
        from pararealml_tpu.ops.resident_diffusion import (
            build_resident_diffusion_rk4_trajectory,
            make_resident_plan,
        )
        from pararealml_tpu.ops.tiled_diffusion import (
            build_tiled_diffusion_rk4_trajectory,
            dirichlet_is_face_only,
        )

        # mid-size grids: VMEM-resident Horner kernel (state never
        # round-trips through HBM — 3x less traffic than tiled)
        if (
            make_resident_plan(*mesh.vertices_shape) is not None
            and dirichlet_is_face_only(cp)
        ):
            return build_resident_diffusion_rk4_trajectory(
                cp,
                d_t,
                n_steps,
                diffusion_coefficient=diffusion_coefficient,
                interpret=interpret,
                storage_dtype=storage_dtype,
            )

        # beyond VMEM: the overlapped row-tiling kernel
        return build_tiled_diffusion_rk4_trajectory(
            cp,
            d_t,
            n_steps,
            diffusion_coefficient=diffusion_coefficient,
            interpret=interpret,
            storage_dtype=storage_dtype,
            traj_dtype=traj_dtype,
            temporal_block=temporal_block,
        )
    cfg = _KernelConfig(cp, d_t, diffusion_coefficient)
    dtype = cfg.dtype
    padded_height = cfg.padded_height
    padded_width = cfg.padded_width

    def kernel(
        y_ref,
        dir_mask_ref,
        dir_vals_ref,
        ghost_row_mask_ref,
        ghost_row_vals_ref,
        ghost_col_mask_ref,
        ghost_col_vals_ref,
        traj_ref,
        scratch_ref,
        copy_sems,
    ):
        rk4 = cfg.make_rk4(
            dir_mask_ref[:],
            dir_vals_ref[:],
            ghost_row_mask_ref[:],
            ghost_row_vals_ref[:],
            ghost_col_mask_ref[:],
            ghost_col_vals_ref[:],
        )

        def body(k, state):
            state = rk4(state)
            slot = jax.lax.rem(k, 2)

            # wait for the DMA that used this scratch slot two steps ago
            @pl.when(k >= 2)
            def _():
                pltpu.make_async_copy(
                    scratch_ref.at[slot],
                    traj_ref.at[k - 2],
                    copy_sems.at[slot],
                ).wait()

            scratch_ref[slot] = state
            pltpu.make_async_copy(
                scratch_ref.at[slot],
                traj_ref.at[k],
                copy_sems.at[slot],
            ).start()
            return state

        final = jax.lax.fori_loop(0, n_steps, body, y_ref[:])
        del final

        # drain the in-flight copies of the last two steps
        @pl.when(n_steps >= 2)
        def _():
            slot = jax.lax.rem(n_steps - 2, 2)
            pltpu.make_async_copy(
                scratch_ref.at[slot],
                traj_ref.at[n_steps - 2],
                copy_sems.at[slot],
            ).wait()

        @pl.when(n_steps >= 1)
        def _():
            slot = jax.lax.rem(n_steps - 1, 2)
            pltpu.make_async_copy(
                scratch_ref.at[slot],
                traj_ref.at[n_steps - 1],
                copy_sems.at[slot],
            ).wait()

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_steps, padded_height, padded_width), dtype
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, padded_height, padded_width), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def trajectory(y: jax.Array) -> jax.Array:
        y_2d = cfg.pad_grid(
            jnp.asarray(y, dtype).reshape(height, width)
        )
        out = call(y_2d, *cfg.padded_constants)
        # reshape the contiguous output first (free), slice last so the
        # slice fuses into the consumer instead of materializing the
        # whole clean trajectory (see tiled_diffusion.trajectory)
        return (
            out.reshape(n_steps, padded_height, padded_width, 1)[
                :, :height, :width
            ].astype(y.dtype)
        )

    return trajectory


def build_fused_diffusion_rk4_end(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    diffusion_coefficient: Optional[float] = None,
    interpret: bool = False,
    batch: Optional[int] = None,
):
    """Builds ``end(y) -> y_final`` advancing ``n_steps`` fused RK4
    steps and returning ONLY the final state, or ``None`` when the grid
    exceeds VMEM.

    Unlike :func:`build_fused_diffusion_rk4_trajectory`, no trajectory
    is ever written to HBM — the state stays in VMEM for the whole
    solve and HBM traffic is one grid read plus one grid write total.
    This is the right kernel for Parareal's ends-only iterations
    (the correction update needs fine/coarse slice END states only;
    the reference discards interiors the same way, /root/reference/
    pararealml/operators/parareal/parareal_operator.py:163-185).

    With ``batch=B``, ``end`` maps ``(B, ...) -> (B, ...)`` via a
    Pallas grid over the batch: each program instance advances one
    slice's grid in VMEM, so vmap-batched Parareal slices on a single
    device run fused (sequentially, like the separate launches of a
    ``lax.map``, but in one kernel) instead of falling back to the
    generic XLA path.
    """
    from jax.experimental.pallas import tpu as pltpu

    diff_eq = cp.differential_equation
    if diffusion_coefficient is None:
        diffusion_coefficient = diff_eq._d
    mesh = cp.mesh
    height, width = mesh.vertices_shape
    if _padded_cells(mesh.vertices_shape) > _MAX_VMEM_CELLS:
        # beyond-VMEM grids stream tiles through HBM every step anyway;
        # callers fall back to the (lazily sliced) trajectory kernel
        return None
    cfg = _KernelConfig(cp, d_t, diffusion_coefficient)
    dtype = cfg.dtype
    padded_height = cfg.padded_height
    padded_width = cfg.padded_width

    batched = batch is not None

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
        rk4 = cfg.make_rk4(
            dir_mask_ref[:],
            dir_vals_ref[:],
            ghost_row_mask_ref[:],
            ghost_row_vals_ref[:],
            ghost_col_mask_ref[:],
            ghost_col_vals_ref[:],
        )
        y_start = y_ref[0] if batched else y_ref[:]
        final = jax.lax.fori_loop(
            0, n_steps, lambda k, state: rk4(state), y_start
        )
        if batched:
            out_ref[0] = final
        else:
            out_ref[:] = final

    if batched:
        grid_block = pl.BlockSpec(
            (1, padded_height, padded_width), lambda b: (b, 0, 0)
        )

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda b: (0,) * len(shape))

        call = pl.pallas_call(
            kernel,
            grid=(batch,),
            out_shape=jax.ShapeDtypeStruct(
                (batch, padded_height, padded_width), dtype
            ),
            in_specs=[grid_block]
            + [
                const_spec(np.asarray(c).shape)
                for c in cfg.padded_constants
            ],
            out_specs=grid_block,
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (padded_height, padded_width), dtype
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    def end(y: jax.Array) -> jax.Array:
        if batched:
            grids = jnp.asarray(y, dtype).reshape(-1, height, width)
            padded = jnp.pad(
                grids,
                (
                    (0, 0),
                    (0, padded_height - height),
                    (0, padded_width - width),
                ),
            )
            out = call(padded, *cfg.padded_constants)
            return (
                out[:, :height, :width]
                .reshape((-1,) + tuple(y.shape[1:]))
                .astype(y.dtype)
            )
        y_2d = cfg.pad_grid(
            jnp.asarray(y, dtype).reshape(height, width)
        )
        out = call(y_2d, *cfg.padded_constants)
        return (
            out[:height, :width].reshape(y.shape).astype(y.dtype)
        )

    return end


def build_fused_diffusion_rk4_step(
    cp: ConstrainedProblem,
    d_t: float,
    diffusion_coefficient: Optional[float] = None,
    interpret: bool = False,
):
    """Builds ``step(y) -> y_next`` computing one fused RK4 step (the
    single-step specialization of
    :func:`build_fused_diffusion_rk4_trajectory`)."""
    trajectory = build_fused_diffusion_rk4_trajectory(
        cp,
        d_t,
        1,
        diffusion_coefficient=diffusion_coefficient,
        interpret=interpret,
    )

    def step(y):
        return trajectory(y)[0]

    return step
