"""Fused Pallas TPU kernels for two-component 2D systems (wave,
Burgers).

Generalizes the single-component diffusion kernel
(ops/fused_diffusion.py) to systems of two coupled planes: both
components stay resident in VMEM across *all* RK4 time steps, with
per-component Dirichlet grids and Neumann ghost synthesis matching the
generic path's semantics, and each step's plane pair streamed to the
HBM trajectory buffer with double-buffered async DMA. The equation
only enters through a small ``rhs`` builder over shared stencil
helpers, so the wave system (``y0' = y1``, ``y1' = c^2 lap(y0)``;
reference /root/reference/pararealml/differential_equation.py:673-700)
and the viscous Burgers system (``yi' = nu lap(yi) - y . grad(yi)``;
reference :734-766) share one kernel scaffold.

Applicability (checked by :func:`fused_wave_step_applicable` /
:func:`fused_burgers_step_applicable`): an exact ``WaveEquation`` /
2D ``BurgersEquation`` on a 2D Cartesian mesh with static boundary
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
from pararealml_tpu.differential_equation import (
    BurgersEquation,
    WaveEquation,
)
from pararealml_tpu.mesh import CoordinateSystem
from pararealml_tpu.ops.fused_diffusion import (
    _MAX_VMEM_CELLS,
    _padded_cells,
)


def _two_component_applicable(cp, integrator, equation_type) -> bool:
    from pararealml_tpu.operators.fdm.numerical_integrator import RK4

    diff_eq = cp.differential_equation
    return (
        not jax.config.read("jax_enable_x64")
        and type(diff_eq) is equation_type
        and isinstance(integrator, RK4)
        and diff_eq.x_dimension == 2
        and diff_eq.y_dimension == 2
        and cp.mesh is not None
        and cp.mesh.coordinate_system_type == CoordinateSystem.CARTESIAN
        and cp.are_all_boundary_conditions_static
        # two planes plus the RK4 stage intermediates must fit VMEM
        and _padded_cells(cp.mesh.vertices_shape)
        <= _MAX_VMEM_CELLS // 2
    )


def fused_wave_step_applicable(cp, integrator) -> bool:
    """Whether the fused wave kernel reproduces the generic path exactly
    for this problem."""
    return _two_component_applicable(cp, integrator, WaveEquation)


def fused_burgers_step_applicable(cp, integrator) -> bool:
    """Whether the fused Burgers kernel reproduces the generic path
    exactly for this problem."""
    return _two_component_applicable(cp, integrator, BurgersEquation)


def _component_constraint_tensors(cp: ConstrainedProblem):
    """Dense static constraint tensors, one entry per component:
    Dirichlet grids (2, h, w) and Neumann ghost face vectors
    (2 faces, 2 components, length)."""
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

    def face_vectors(pair, length):
        """(2 sides, 2 components, length) mask and value arrays."""
        masks = np.zeros((2, 2, length), bool)
        values = np.zeros((2, 2, length), dtype)
        for side_index, side in enumerate(
            (pair.lower, pair.upper) if pair else (None, None)
        ):
            if side is None:
                continue
            masks[side_index] = np.moveaxis(
                np.asarray(side.mask).reshape(length, 2), -1, 0
            )
            values[side_index] = np.moveaxis(
                np.asarray(side.values).reshape(length, 2), -1, 0
            ).astype(dtype)
        return masks, values

    d_y = cp.static_boundary_vertex_constraints.d_y
    ghost_row_mask, ghost_row_vals = face_vectors(d_y[0], width)
    ghost_col_mask, ghost_col_vals = face_vectors(d_y[1], height)
    return dict(
        dir_mask=np.moveaxis(dir_mask, -1, 0),
        dir_vals=np.moveaxis(dir_vals.astype(dtype), -1, 0),
        ghost_row_mask=ghost_row_mask,
        ghost_row_vals=ghost_row_vals,
        ghost_col_mask=ghost_col_mask,
        ghost_col_vals=ghost_col_vals,
    )


class _StencilHelpers:
    """Per-stage stencil helpers over a (ph, pw) plane with
    per-component boundary data, matching the generic
    ThreePointCentralDifferenceMethod semantics."""

    def __init__(
        self,
        geometry,
        ghost_row_mask,
        ghost_row_vals,
        ghost_col_mask,
        ghost_col_vals,
    ):
        self._g = geometry
        self._grm = ghost_row_mask
        self._grv = ghost_row_vals
        self._gcm = ghost_col_mask
        self._gcv = ghost_col_vals

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

    def laplacian(self, comp, state):
        g = self._g
        height, width = g["height"], g["width"]
        above, below, left, right = self._shifts(state)
        lap = (above - 2.0 * state + below) * g["inv_dx0_sqr"] + (
            left - 2.0 * state + right
        ) * g["inv_dx1_sqr"]

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
        row_parts = [
            lap[0:1, :] + ghost_top[jnp.newaxis] * g["inv_dx0_sqr"],
            lap[1: height - 1, :],
            lap[height - 1: height, :]
            + ghost_bottom[jnp.newaxis] * g["inv_dx0_sqr"],
        ]
        if g["row_pad"] is not None:
            row_parts.append(g["row_pad"])
        lap = jnp.concatenate(row_parts, axis=0)

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
        return jnp.concatenate(col_parts, axis=1)

    def gradient_0(self, comp, state):
        """Central row-derivative with zero halos, boundary rows
        replaced by the constrained normal derivative where masked."""
        g = self._g
        height = g["height"]
        above, below, _, _ = self._shifts(state)
        gradient = (below - above) * g["inv_two_dx0"]
        row_parts = [
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
        if g["row_pad"] is not None:
            row_parts.append(g["row_pad"])
        return jnp.concatenate(row_parts, axis=0)

    def gradient_1(self, comp, state):
        g = self._g
        width = g["width"]
        _, _, left, right = self._shifts(state)
        gradient = (right - left) * g["inv_two_dx1"]
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
        return jnp.concatenate(col_parts, axis=1)


def _make_rhs_builder(diff_eq):
    """The per-equation RHS over the stencil helpers."""
    if isinstance(diff_eq, WaveEquation):
        c_sqr = float(diff_eq._c) ** 2

        def rhs(helpers, y0, y1):
            return y1, c_sqr * helpers.laplacian(0, y0)

        return rhs

    viscosity = 1.0 / float(diff_eq._re)

    def rhs(helpers, y0, y1):
        outputs = []
        for comp, plane in ((0, y0), (1, y1)):
            outputs.append(
                viscosity * helpers.laplacian(comp, plane)
                - y0 * helpers.gradient_0(comp, plane)
                - y1 * helpers.gradient_1(comp, plane)
            )
        return tuple(outputs)

    return rhs


def build_fused_system_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    interpret: bool = False,
):
    """Builds ``trajectory(y) -> ys`` computing ``n_steps`` fused RK4
    steps of a two-component system, ``y`` of shape (h, w, 2)."""
    from jax.experimental.pallas import tpu as pltpu

    diff_eq = cp.differential_equation
    mesh = cp.mesh
    height, width = mesh.vertices_shape
    d_x0, d_x1 = mesh.d_x
    constants = _component_constraint_tensors(cp)
    rhs_builder = _make_rhs_builder(diff_eq)
    dtype = jnp.float32

    padded_height = -(-height // 8) * 8
    padded_width = -(-width // 128) * 128

    geometry_static = dict(
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

        geometry = dict(
            geometry_static,
            zero_row=jnp.zeros((1, padded_width), dtype),
            zero_col=jnp.zeros((padded_height, 1), dtype),
            row_pad=(
                jnp.zeros(
                    (padded_height - height, padded_width), dtype
                )
                if padded_height > height
                else None
            ),
            col_pad=(
                jnp.zeros(
                    (padded_height, padded_width - width), dtype
                )
                if padded_width > width
                else None
            ),
        )
        helpers = _StencilHelpers(
            geometry,
            ghost_row_mask_ref[:],
            ghost_row_vals_ref[:],
            ghost_col_mask_ref[:],
            ghost_col_vals_ref[:],
        )

        def apply_dirichlet(y0, y1):
            return (
                jnp.where(dir_mask[0], dir_vals[0], y0),
                jnp.where(dir_mask[1], dir_vals[1], y1),
            )

        def rhs(y0, y1):
            return rhs_builder(helpers, y0, y1)

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
            y0, y1 = rk4(*carry)
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

        jax.lax.fori_loop(0, n_steps, body, (y_ref[0], y_ref[1]))

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

    def pad_planes(array, value_dtype=None):
        return jnp.pad(
            jnp.asarray(
                array,
                value_dtype if value_dtype is not None else None,
            ),
            (
                (0, 0),
                (0, padded_height - height),
                (0, padded_width - width),
            ),
        )

    padded_constants = (
        pad_planes(constants["dir_mask"]),
        pad_planes(constants["dir_vals"], dtype),
        jnp.pad(
            jnp.asarray(constants["ghost_row_mask"]),
            ((0, 0), (0, 0), (0, padded_width - width)),
        ),
        jnp.pad(
            jnp.asarray(constants["ghost_row_vals"], dtype),
            ((0, 0), (0, 0), (0, padded_width - width)),
        ),
        jnp.pad(
            jnp.asarray(constants["ghost_col_mask"]),
            ((0, 0), (0, 0), (0, padded_height - height)),
        ),
        jnp.pad(
            jnp.asarray(constants["ghost_col_vals"], dtype),
            ((0, 0), (0, 0), (0, padded_height - height)),
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


def build_fused_system_rk4_step(
    cp: ConstrainedProblem,
    d_t: float,
    interpret: bool = False,
):
    """One fused RK4 system step (the single-step specialization)."""
    trajectory = build_fused_system_rk4_trajectory(
        cp, d_t, 1, interpret=interpret
    )

    def step(y):
        return trajectory(y)[0]

    return step


# backwards-compatible wave-specific aliases
build_fused_wave_rk4_trajectory = build_fused_system_rk4_trajectory
build_fused_wave_rk4_step = build_fused_system_rk4_step
