"""Fused Pallas TPU kernel for 2D wave-equation RK4 steps.

Extends the fused-kernel coverage beyond the diffusion family
(ops/fused_diffusion.py) to the reference's two-component wave system
(differential_equation.py WaveEquation: ``y0' = y1``,
``y1' = c^2 lap(y0)``; reference /root/reference/pararealml/
differential_equation.py:673-700). Both displacement and velocity
planes stay resident in VMEM across *all* time steps; each step's pair
of planes is streamed to the HBM trajectory buffer with double-buffered
async DMA — one HBM write per step and no reads after the initial
state load, the speed-of-light traffic for a trajectory-materializing
solver.

Applicability (checked by :func:`fused_wave_step_applicable`): an exact
``WaveEquation`` on a 2D Cartesian mesh with static boundary
conditions, solved with RK4 in float32, small enough for both planes
and the RK4 stages to fit VMEM. Everything else falls back to the
generic jnp path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.differential_equation import WaveEquation
from pararealml_tpu.mesh import CoordinateSystem
from pararealml_tpu.ops.fused_diffusion import (
    _MAX_VMEM_CELLS,
    _face_vectors,
    _padded_cells,
)


def fused_wave_step_applicable(
    cp: ConstrainedProblem, integrator
) -> bool:
    """Whether the fused wave kernel reproduces the generic path exactly
    for this problem."""
    from pararealml_tpu.operators.fdm.numerical_integrator import RK4

    diff_eq = cp.differential_equation
    return (
        not jax.config.read("jax_enable_x64")
        and type(diff_eq) is WaveEquation
        and isinstance(integrator, RK4)
        and diff_eq.x_dimension == 2
        and cp.mesh is not None
        and cp.mesh.coordinate_system_type == CoordinateSystem.CARTESIAN
        and cp.are_all_boundary_conditions_static
        # two planes plus the RK4 stage intermediates must fit VMEM
        and _padded_cells(cp.mesh.vertices_shape)
        <= _MAX_VMEM_CELLS // 2
    )


def _component_constraint_tensors(cp: ConstrainedProblem):
    """Dense per-component static constraint tensors: Dirichlet grids
    for both components, Neumann ghost face vectors for component 0
    (the only one the Laplacian touches)."""
    mesh = cp.mesh
    height, width = mesh.vertices_shape
    dtype = np.float32

    if cp.static_y_vertex_constraints is not None:
        dir_mask = np.asarray(
            cp.static_y_vertex_constraints.mask
        ).reshape(height, width, 2)
        dir_vals = np.asarray(
            cp.static_y_vertex_constraints.values
        ).reshape(height, width, 2)
        dir_vals = np.where(dir_mask, dir_vals, 0.0)
    else:
        dir_mask = np.zeros((height, width, 2), bool)
        dir_vals = np.zeros((height, width, 2))

    def face_component(pair, length, comp):
        sides = []
        for side in (pair.lower, pair.upper) if pair else (None, None):
            if side is None:
                sides.append(
                    (
                        np.zeros(length, bool),
                        np.zeros(length, dtype),
                    )
                )
            else:
                mask = np.asarray(side.mask).reshape(length, 2)[
                    :, comp
                ]
                values = np.asarray(side.values).reshape(length, 2)[
                    :, comp
                ]
                sides.append((mask, values.astype(dtype)))
        return sides

    d_y = cp.static_boundary_vertex_constraints.d_y
    (row_lo_m, row_lo_v), (row_hi_m, row_hi_v) = face_component(
        d_y[0], width, 0
    )
    (col_lo_m, col_lo_v), (col_hi_m, col_hi_v) = face_component(
        d_y[1], height, 0
    )
    return dict(
        dir_mask=np.moveaxis(dir_mask, -1, 0),  # (2, h, w)
        dir_vals=np.moveaxis(dir_vals.astype(dtype), -1, 0),
        ghost_row_mask=np.stack([row_lo_m, row_hi_m]),
        ghost_row_vals=np.stack([row_lo_v, row_hi_v]),
        ghost_col_mask=np.stack([col_lo_m, col_hi_m]),
        ghost_col_vals=np.stack([col_lo_v, col_hi_v]),
    )


def build_fused_wave_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    interpret: bool = False,
):
    """Builds ``trajectory(y) -> ys`` computing ``n_steps`` fused RK4
    wave steps in ONE kernel invocation, ``y`` of shape (h, w, 2)."""
    from jax.experimental.pallas import tpu as pltpu

    diff_eq = cp.differential_equation
    mesh = cp.mesh
    height, width = mesh.vertices_shape
    d_x0, d_x1 = mesh.d_x
    constants = _component_constraint_tensors(cp)
    dtype = jnp.float32

    padded_height = -(-height // 8) * 8
    padded_width = -(-width // 128) * 128

    c_sqr = float(diff_eq._c) ** 2
    inv_dx0_sqr = 1.0 / float(d_x0) ** 2
    inv_dx1_sqr = 1.0 / float(d_x1) ** 2
    two_dx0 = 2.0 * float(d_x0)
    two_dx1 = 2.0 * float(d_x1)

    def kernel(
        y_ref,  # (2, ph, pw)
        dir_mask_ref,
        dir_vals_ref,
        ghost_row_mask_ref,
        ghost_row_vals_ref,
        ghost_col_mask_ref,
        ghost_col_vals_ref,
        traj_ref,  # (n_steps, 2, ph, pw) in HBM
        scratch_ref,  # (2 slots, 2 comps, ph, pw) VMEM
        copy_sems,
    ):
        dir_mask = dir_mask_ref[:]
        dir_vals = dir_vals_ref[:]
        ghost_row_mask = ghost_row_mask_ref[:]
        ghost_row_vals = ghost_row_vals_ref[:]
        ghost_col_mask = ghost_col_mask_ref[:]
        ghost_col_vals = ghost_col_vals_ref[:]

        def apply_dirichlet(y0, y1):
            return (
                jnp.where(dir_mask[0], dir_vals[0], y0),
                jnp.where(dir_mask[1], dir_vals[1], y1),
            )

        zero_row = jnp.zeros((1, padded_width), dtype)
        zero_col = jnp.zeros((padded_height, 1), dtype)
        row_pad = jnp.zeros(
            (padded_height - height, padded_width), dtype
        )
        col_pad = jnp.zeros((padded_height, padded_width - width), dtype)

        def laplacian(state):
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
            return jnp.concatenate(col_parts, axis=1)

        def rhs(y0, y1):
            # y0' = y1 ; y1' = c^2 lap(y0)
            return y1, c_sqr * laplacian(y0)

        def rk4(y0, y1):
            k1_0, k1_1 = rhs(y0, y1)
            s0, s1 = apply_dirichlet(
                y0 + 0.5 * d_t * k1_0, y1 + 0.5 * d_t * k1_1
            )
            k2_0, k2_1 = rhs(s0, s1)
            s0, s1 = apply_dirichlet(
                y0 + 0.5 * d_t * k2_0, y1 + 0.5 * d_t * k2_1
            )
            k3_0, k3_1 = rhs(s0, s1)
            s0, s1 = apply_dirichlet(
                y0 + d_t * k3_0, y1 + d_t * k3_1
            )
            k4_0, k4_1 = rhs(s0, s1)
            return apply_dirichlet(
                y0
                + (d_t / 6.0)
                * (k1_0 + 2.0 * k2_0 + 2.0 * k3_0 + k4_0),
                y1
                + (d_t / 6.0)
                * (k1_1 + 2.0 * k2_1 + 2.0 * k3_1 + k4_1),
            )

        def body(k, carry):
            y0, y1 = carry
            y0, y1 = rk4(y0, y1)
            slot = jax.lax.rem(k, 2)

            @pl.when(k >= 2)
            def _():
                pltpu.make_async_copy(
                    scratch_ref.at[slot],
                    traj_ref.at[k - 2],
                    copy_sems.at[slot],
                ).wait()

            scratch_ref[slot, 0] = y0
            scratch_ref[slot, 1] = y1
            pltpu.make_async_copy(
                scratch_ref.at[slot],
                traj_ref.at[k],
                copy_sems.at[slot],
            ).start()
            return y0, y1

        jax.lax.fori_loop(
            0, n_steps, body, (y_ref[0], y_ref[1])
        )

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
            (n_steps, 2, padded_height, padded_width), dtype
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, padded_height, padded_width), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def pad_grid(array):
        return jnp.pad(
            array,
            (
                (0, 0),
                (0, padded_height - height),
                (0, padded_width - width),
            ),
        )

    padded_constants = (
        pad_grid(jnp.asarray(constants["dir_mask"])),
        pad_grid(jnp.asarray(constants["dir_vals"], dtype)),
        jnp.pad(
            jnp.asarray(constants["ghost_row_mask"]),
            ((0, 0), (0, padded_width - width)),
        ),
        jnp.pad(
            jnp.asarray(constants["ghost_row_vals"], dtype),
            ((0, 0), (0, padded_width - width)),
        ),
        jnp.pad(
            jnp.asarray(constants["ghost_col_mask"]),
            ((0, 0), (0, padded_height - height)),
        ),
        jnp.pad(
            jnp.asarray(constants["ghost_col_vals"], dtype),
            ((0, 0), (0, padded_height - height)),
        ),
    )

    def trajectory(y: jax.Array) -> jax.Array:
        planes = jnp.moveaxis(
            jnp.asarray(y, dtype).reshape(height, width, 2), -1, 0
        )
        y_padded = jnp.pad(
            planes,
            (
                (0, 0),
                (0, padded_height - height),
                (0, padded_width - width),
            ),
        )
        out = call(y_padded, *padded_constants)
        out = jnp.moveaxis(out[:, :, :height, :width], 1, -1)
        return out.astype(y.dtype)

    return trajectory


def build_fused_wave_rk4_step(
    cp: ConstrainedProblem,
    d_t: float,
    interpret: bool = False,
):
    """One fused RK4 wave step (the single-step specialization)."""
    trajectory = build_fused_wave_rk4_trajectory(
        cp, d_t, 1, interpret=interpret
    )

    def step(y):
        return trajectory(y)[0]

    return step
