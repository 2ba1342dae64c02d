"""Fused Pallas TPU kernels for multi-component 2D systems (wave,
Burgers, shallow water, Cahn-Hilliard, Navier-Stokes).

Generalizes the single-component diffusion kernel
(ops/fused_diffusion.py) to systems of coupled planes: all components
stay resident in VMEM across *all* RK4 time steps, with per-component
Dirichlet grids and Neumann ghost synthesis matching the generic
path's semantics, and each step's plane set streamed to the HBM
trajectory buffer with double-buffered async DMA. The equation only
enters through a small ``rhs`` builder over shared stencil helpers, so
the wave system (``y0' = y1``, ``y1' = c^2 lap(y0)``; reference
/root/reference/pararealml/differential_equation.py:673-700), the
viscous Burgers system (``yi' = nu lap(yi) - y . grad(yi)``;
reference :734-766), the non-conservative shallow-water system
(reference :768-819), the mixed-LHS Cahn-Hilliard system (:700-731),
and the vorticity-stream Navier-Stokes system (:822-850, with the
stream-function Jacobi solve as an in-kernel while loop) share one
kernel scaffold.

Applicability (checked by the per-equation ``*_step_applicable``
gates): the exact built-in equation type on a 2D Cartesian or polar
mesh with static boundary conditions, solved with RK4 in float32,
small enough for all planes and the RK4 stages to fit VMEM (the
Cartesian variants additionally extend beyond VMEM via the tiled
kernels). Polar meshes run with the metric terms of the generic
differentiator's polar branches — 1/r-scaled theta gradients, the
polar Laplacian, and the shallow-water divergence's u/r term — as
per-row coefficient columns; Navier-Stokes stays Cartesian-only (its
in-kernel Jacobi anti-Laplacian sweep is the Cartesian update).
Everything else falls back to the generic jnp path.
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
    NavierStokesEquation,
    ShallowWaterEquation,
    WaveEquation,
)
from pararealml_tpu.mesh import CoordinateSystem
from pararealml_tpu.ops.fused_diffusion import (
    _MAX_VMEM_CELLS,
    _padded_cells,
)

_SYSTEM_EQUATION_TYPES = (
    WaveEquation,
    BurgersEquation,
    ShallowWaterEquation,
    CahnHilliardEquation,
    NavierStokesEquation,
)


def _fits_vmem(cp) -> bool:
    # all planes plus the RK4 stage intermediates and the
    # double-buffered trajectory scratch must fit VMEM: roughly
    # (5n + 4) live stage planes + 2n scratch planes of f32
    n_components = cp.differential_equation.y_dimension
    return _padded_cells(cp.mesh.vertices_shape) <= 3_000_000 // (
        7 * n_components + 4
    )


def _system_applicable(cp, integrator, equation_type) -> bool:
    from pararealml_tpu.operators.fdm.numerical_integrator import RK4

    diff_eq = cp.differential_equation
    if not (
        not jax.config.read("jax_enable_x64")
        and type(diff_eq) is equation_type
        and isinstance(integrator, RK4)
        and diff_eq.x_dimension == 2
        and cp.mesh is not None
        and cp.are_all_boundary_conditions_static
    ):
        return False
    coordinate_system = cp.mesh.coordinate_system_type
    if coordinate_system == CoordinateSystem.POLAR:
        # the polar metric terms live in the VMEM-resident kernel only
        # (no tiled polar variant), and the Navier-Stokes in-kernel
        # Jacobi anti-Laplacian is Cartesian; origin-inclusive radial
        # domains (r_low == 0) are excluded because 1/r at the origin
        # row produces an inf whose downstream nan pattern differs
        # between the f32 kernel and the generic (possibly f64) path
        return (
            equation_type is not NavierStokesEquation
            and float(cp.mesh.x_intervals[0][0]) > 0.0
            and _fits_vmem(cp)
        )
    if coordinate_system != CoordinateSystem.CARTESIAN:
        return False
    if _fits_vmem(cp):
        return True

    # beyond VMEM: the overlapped row-tiling kernel
    from pararealml_tpu.ops.tiled_system import tiled_system_applicable

    return tiled_system_applicable(cp)


def fused_wave_step_applicable(cp, integrator) -> bool:
    """Whether the fused wave kernel reproduces the generic path exactly
    for this problem."""
    return _system_applicable(cp, integrator, WaveEquation)


def fused_burgers_step_applicable(cp, integrator) -> bool:
    """Whether the fused Burgers kernel reproduces the generic path
    exactly for this problem."""
    return _system_applicable(cp, integrator, BurgersEquation)


def fused_shallow_water_step_applicable(cp, integrator) -> bool:
    """Whether the fused shallow-water kernel reproduces the generic
    path exactly for this problem."""
    return _system_applicable(cp, integrator, ShallowWaterEquation)


def fused_cahn_hilliard_step_applicable(cp, integrator) -> bool:
    """Whether the fused Cahn-Hilliard kernel reproduces the generic
    path exactly for this problem."""
    return _system_applicable(cp, integrator, CahnHilliardEquation)


def fused_navier_stokes_step_applicable(cp, integrator) -> bool:
    """Whether the fused Navier-Stokes kernel reproduces the generic
    path exactly for this problem."""
    return _system_applicable(cp, integrator, NavierStokesEquation)


def fused_system_step_applicable(cp, integrator) -> bool:
    """Whether any fused multi-component system kernel applies."""
    return any(
        _system_applicable(cp, integrator, equation_type)
        for equation_type in _SYSTEM_EQUATION_TYPES
    )


def _component_constraint_tensors(cp: ConstrainedProblem, n: int):
    """Dense static constraint tensors, one entry per component:
    Dirichlet grids (n, h, w) and Neumann ghost face vectors
    (2 faces, n components, length)."""
    mesh = cp.mesh
    height, width = mesh.vertices_shape
    dtype = np.float32

    if cp.static_y_vertex_constraints is not None:
        dir_mask = np.asarray(
            cp.static_y_vertex_constraints.mask
        ).reshape(height, width, n)
        dir_vals = np.asarray(
            cp.static_y_vertex_constraints.values
        ).reshape(height, width, n)
        dir_vals = np.where(dir_mask, dir_vals, 0.0)
    else:
        dir_mask = np.zeros((height, width, n), bool)
        dir_vals = np.zeros((height, width, n))

    def face_vectors(pair, length):
        """(2 sides, n components, length) mask and value arrays."""
        masks = np.zeros((2, n, length), bool)
        values = np.zeros((2, n, length), dtype)
        for side_index, side in enumerate(
            (pair.lower, pair.upper) if pair else (None, None)
        ):
            if side is None:
                continue
            masks[side_index] = np.moveaxis(
                np.asarray(side.mask).reshape(length, n), -1, 0
            )
            values[side_index] = np.moveaxis(
                np.asarray(side.values).reshape(length, n), -1, 0
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
    ThreePointCentralDifferenceMethod semantics — including the polar
    metric terms (matching numerical_differentiator's laplacian and
    gradient polar branches) when the geometry carries an ``inv_r``
    row-coefficient column."""

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
        self._shift_cache = {}

    def _shifts(self, state):
        # every RHS evaluates laplacian + gradients on the SAME state
        # plane, and each helper needs the same four shifted copies;
        # memoizing per traced plane emits them once per stage instead
        # of once per helper call (the held reference keeps the tracer
        # alive so ids cannot be recycled within a trace)
        cached = self._shift_cache.get(id(state))
        if cached is not None and cached[0] is state:
            return cached[1]
        g = self._g
        above = jnp.concatenate(
            [g["zero_row"], state[:-1, :]], axis=0
        )
        below = jnp.concatenate(
            [state[1:, :], g["zero_row"]], axis=0
        )
        left = jnp.concatenate([g["zero_col"], state[:, :-1]], axis=1)
        right = jnp.concatenate([state[:, 1:], g["zero_col"]], axis=1)
        shifts = (above, below, left, right)
        self._shift_cache[id(state)] = (state, shifts)
        return shifts

    def _zero_pads(self, x):
        """Replaces pad rows/lanes with zeros so garbage can never leak
        back into real vertices through the shift stencils."""
        g = self._g
        if g["row_pad"] is not None:
            x = jnp.concatenate(
                [x[: g["height"]], g["row_pad"]], axis=0
            )
        if g["col_pad"] is not None:
            x = jnp.concatenate(
                [x[:, : g["width"]], g["col_pad"]], axis=1
            )
        return x

    def over_r(self, plane):
        """plane / r (polar geometry only) — the extra divergence term
        the shallow-water RHS needs beyond metric-scaled gradients."""
        return plane * self._g["inv_r"]

    def _second_derivative_0(self, comp, state):
        """Axis-0 second derivative with Neumann ghost rows; pad rows
        pass through unzeroed (callers zero pads once at the end)."""
        g = self._g
        height = g["height"]
        above, below, _, _ = self._shifts(state)
        d2 = (above - 2.0 * state + below) * g["inv_dx0_sqr"]
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
            d2[0:1, :] + ghost_top[jnp.newaxis] * g["inv_dx0_sqr"],
            d2[1: height - 1, :],
            d2[height - 1: height, :]
            + ghost_bottom[jnp.newaxis] * g["inv_dx0_sqr"],
        ]
        if g["row_pad"] is not None:
            parts.append(d2[height:, :])
        return jnp.concatenate(parts, axis=0)

    def _second_derivative_1(self, comp, state):
        """Axis-1 second derivative with Neumann ghost columns; pad
        lanes pass through unzeroed."""
        g = self._g
        width = g["width"]
        _, _, left, right = self._shifts(state)
        d2 = (left - 2.0 * state + right) * g["inv_dx1_sqr"]
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
        parts = [
            d2[:, 0:1]
            + ghost_left[:, jnp.newaxis] * g["inv_dx1_sqr"],
            d2[:, 1: width - 1],
            d2[:, width - 1: width]
            + ghost_right[:, jnp.newaxis] * g["inv_dx1_sqr"],
        ]
        if g["col_pad"] is not None:
            parts.append(d2[:, width:])
        return jnp.concatenate(parts, axis=1)

    def _derivative_0(self, comp, state):
        """Central row-derivative with zero halos, boundary rows
        replaced by the constrained normal derivative where masked;
        pad rows pass through unzeroed."""
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
        if g["row_pad"] is not None:
            parts.append(gradient[height:, :])
        return jnp.concatenate(parts, axis=0)

    def laplacian(self, comp, state):
        g = self._g
        d2_0 = self._second_derivative_0(comp, state)
        d2_1 = self._second_derivative_1(comp, state)
        if g["inv_r"] is None:
            lap = d2_0 + d2_1
        else:
            # polar: d2/dr2 + (d2/dtheta2 / r + d/dr) / r, with the
            # generic operator's evaluation ordering
            lap = d2_0 + (
                d2_1 * g["inv_r"] + self._derivative_0(comp, state)
            ) * g["inv_r"]
        return self._zero_pads(lap)

    def gradient_0(self, comp, state):
        """y-gradient[comp, 0]: the row-derivative (never
        metric-scaled — axis 0 is r in polar geometry)."""
        return self._zero_pads(self._derivative_0(comp, state))

    def gradient_1(self, comp, state):
        """y-gradient[comp, 1], metric-scaled by 1/r in polar
        geometry."""
        g = self._g
        width = g["width"]
        _, _, left, right = self._shifts(state)
        gradient = (right - left) * g["inv_two_dx1"]
        parts = [
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
            parts.append(gradient[:, width:])
        out = jnp.concatenate(parts, axis=1)
        if g["inv_r"] is not None:
            out = out * g["inv_r"]
        return self._zero_pads(out)


def _make_step_factory(
    diff_eq,
    d_t,
    mesh,
    anti_laplacian_tol: float = 1e-3,
    anti_laplacian_max_iterations: int = 100_000,
):
    """The per-equation step over the stencil helpers: given
    ``(helpers, apply_dirichlet, dirichlet_component)`` at kernel trace
    time, returns ``step(y) -> y_next`` over the component-plane tuple.

    All-``D_Y_OVER_D_T`` systems share the RK4 template; Cahn-Hilliard's
    mixed LHS (integrate the concentration, algebraically assign the
    chemical potential from the *step-initial* state, matching
    fdm_operator's Y handling) and Navier-Stokes (vorticity integration,
    Jacobi anti-Laplacian stream-function solve, algebraic velocity
    assignment) get their own steps."""
    if isinstance(diff_eq, NavierStokesEquation):
        viscosity = 1.0 / float(diff_eq._re)
        d_x0, d_x1 = mesh.d_x
        # Jacobi update: psi + (lap(psi) - rhs) / denom, the fixed point
        # of which satisfies lap(psi) = rhs (the generic sweep in
        # numerical_differentiator._next_anti_laplacian_estimate in its
        # algebraically equivalent form)
        denominator = 2.0 / float(d_x0) ** 2 + 2.0 / float(d_x1) ** 2
        tol = float(anti_laplacian_tol)
        max_iterations = anti_laplacian_max_iterations

        def factory(helpers, apply_dirichlet, dirichlet_component):
            def vorticity_rhs(w, u, v):
                return (
                    viscosity * helpers.laplacian(0, w)
                    - u * helpers.gradient_0(0, w)
                    - v * helpers.gradient_1(0, w)
                )

            def anti_laplacian(rhs, psi_init):
                psi_0 = dirichlet_component(1, psi_init)

                def cond(carry):
                    _, diff, i = carry
                    return (diff > tol) & (i < max_iterations)

                def body(carry):
                    psi, _, i = carry
                    update = (
                        helpers.laplacian(1, psi) - rhs
                    ) / denominator
                    psi_new = dirichlet_component(1, psi + update)
                    diff = jnp.linalg.norm(psi_new - psi)
                    return psi_new, diff, i + 1

                psi_final, _, _ = jax.lax.while_loop(
                    cond,
                    body,
                    (
                        psi_0,
                        jnp.asarray(jnp.inf, psi_0.dtype),
                        0,
                    ),
                )
                return psi_final

            def step(y):
                w, psi, u, v = y
                # RK4 on the vorticity; the velocity planes are constant
                # through the stages except for the per-stage Dirichlet
                # application (their k entries are zero)
                u_d = dirichlet_component(2, u)
                v_d = dirichlet_component(3, v)
                k1 = vorticity_rhs(w, u, v)
                k2 = vorticity_rhs(
                    dirichlet_component(0, w + 0.5 * d_t * k1),
                    u_d,
                    v_d,
                )
                k3 = vorticity_rhs(
                    dirichlet_component(0, w + 0.5 * d_t * k2),
                    u_d,
                    v_d,
                )
                k4 = vorticity_rhs(
                    dirichlet_component(0, w + d_t * k3), u_d, v_d
                )
                w_next = dirichlet_component(
                    0,
                    w
                    + (d_t / 6.0)
                    * (k1 + 2.0 * k2 + 2.0 * k3 + k4),
                )
                # LHS.Y: velocities from the step-initial stream
                # function (matching fdm_operator's ordering)
                u_next = dirichlet_component(
                    2, helpers.gradient_1(1, psi)
                )
                v_next = dirichlet_component(
                    3, -helpers.gradient_0(1, psi)
                )
                # LHS.Y_LAPLACIAN: lap(psi_next) = -w (step-initial w),
                # warm-started from the current stream function
                psi_next = anti_laplacian(-w, psi)
                return (w_next, psi_next, u_next, v_next)

            return step

        return factory

    if isinstance(diff_eq, CahnHilliardEquation):
        d = float(diff_eq._d)
        gamma = float(diff_eq._gamma)

        def factory(helpers, apply_dirichlet, dirichlet_component):
            def step(y):
                y0, y1 = y
                # RK4 on y0' = d lap(y1): the y1 plane is constant
                # through the stages except for the per-stage Dirichlet
                # application, so k2 = k3 = k4
                k1 = d * helpers.laplacian(1, y1)
                k_rest = d * helpers.laplacian(
                    1, dirichlet_component(1, y1)
                )
                y0_next = dirichlet_component(
                    0, y0 + (d_t / 6.0) * (k1 + 5.0 * k_rest)
                )
                # LHS.Y: algebraic assignment from the step-initial y0
                y1_next = dirichlet_component(
                    1,
                    y0**3 - y0 - gamma * helpers.laplacian(0, y0),
                )
                return (y0_next, y1_next)

            return step

        return factory

    rhs_builder = _make_rhs_builder(
        diff_eq,
        polar=(
            mesh.coordinate_system_type == CoordinateSystem.POLAR
        ),
    )

    def factory(helpers, apply_dirichlet, dirichlet_component):
        def rhs(y):
            return rhs_builder(helpers, y)

        def axpy(y, k, scale):
            return tuple(
                plane + scale * k_plane
                for plane, k_plane in zip(y, k)
            )

        def step(y):
            k1 = rhs(y)
            k2 = rhs(apply_dirichlet(axpy(y, k1, 0.5 * d_t)))
            k3 = rhs(apply_dirichlet(axpy(y, k2, 0.5 * d_t)))
            k4 = rhs(apply_dirichlet(axpy(y, k3, d_t)))
            combined = tuple(
                k1_p + 2.0 * k2_p + 2.0 * k3_p + k4_p
                for k1_p, k2_p, k3_p, k4_p in zip(k1, k2, k3, k4)
            )
            return apply_dirichlet(axpy(y, combined, d_t / 6.0))

        return step

    return factory


def _make_rhs_builder(diff_eq, polar=False):
    """The per-equation RHS over the stencil helpers, as a function of
    the component-plane tuple. The helpers' laplacian/gradient_1 carry
    the polar metric internally; ``polar`` only switches the one term
    that differs structurally (the shallow-water divergence's u/r)."""
    if isinstance(diff_eq, WaveEquation):
        c_sqr = float(diff_eq._c) ** 2

        def rhs(helpers, y):
            return (y[1], c_sqr * helpers.laplacian(0, y[0]))

        return rhs

    if isinstance(diff_eq, ConvectionDiffusionEquation):
        d = float(diff_eq._d)
        v0, v1 = (float(v) for v in diff_eq._velocity)

        def rhs(helpers, y):
            return (
                d * helpers.laplacian(0, y[0])
                - v0 * helpers.gradient_0(0, y[0])
                - v1 * helpers.gradient_1(0, y[0]),
            )

        return rhs

    if isinstance(diff_eq, DiffusionEquation):
        d = float(diff_eq._d)

        def rhs(helpers, y):
            return (d * helpers.laplacian(0, y[0]),)

        return rhs

    if isinstance(diff_eq, BurgersEquation):
        viscosity = 1.0 / float(diff_eq._re)

        def rhs(helpers, y):
            return tuple(
                viscosity * helpers.laplacian(comp, plane)
                - y[0] * helpers.gradient_0(comp, plane)
                - y[1] * helpers.gradient_1(comp, plane)
                for comp, plane in enumerate(y)
            )

        return rhs

    # shallow water (reference differential_equation.py:768-819):
    # eta' = -h div(u, w) - eta du/dx0 - u deta/dx0
    #        - eta dw/dx1 - w deta/dx1
    # u'   = v lap(u) - u du/dx0 - w du/dx1 - g deta/dx0 - b u + f w
    # w'   = v lap(w) - u dw/dx0 - w dw/dx1 - g deta/dx1 - b w - f u
    h = float(diff_eq._h)
    b = float(diff_eq._b)
    v = float(diff_eq._v)
    f = float(diff_eq._f)
    g_accel = float(diff_eq._g)

    def rhs(helpers, y):
        eta, u, w = y
        d_eta_0 = helpers.gradient_0(0, eta)
        d_eta_1 = helpers.gradient_1(0, eta)
        d_u_0 = helpers.gradient_0(1, u)
        d_u_1 = helpers.gradient_1(1, u)
        d_w_0 = helpers.gradient_0(2, w)
        d_w_1 = helpers.gradient_1(2, w)
        # polar divergence of (u, w) carries the extra u/r term
        # (numerical_differentiator.divergence's polar branch); the
        # gradients are already metric-scaled by the helpers
        div = d_u_0 + d_w_1
        if polar:
            div = div + helpers.over_r(u)
        r_eta = (
            -h * div
            - eta * d_u_0
            - u * d_eta_0
            - eta * d_w_1
            - w * d_eta_1
        )
        r_u = (
            v * helpers.laplacian(1, u)
            - u * d_u_0
            - w * d_u_1
            - g_accel * d_eta_0
            - b * u
            + f * w
        )
        r_w = (
            v * helpers.laplacian(2, w)
            - u * d_w_0
            - w * d_w_1
            - g_accel * d_eta_1
            - b * w
            - f * u
        )
        return (r_eta, r_u, r_w)

    return rhs


class _SystemKernelConfig:
    """Shared static configuration for the VMEM-resident system
    kernels: grid geometry, padded constant tensors, and the step
    factory both the trajectory and the end-only kernel body call with
    the constant values read from their refs."""

    def __init__(
        self,
        cp: ConstrainedProblem,
        d_t,
        anti_laplacian_tol,
        anti_laplacian_max_iterations,
    ):
        diff_eq = cp.differential_equation
        self.n = n = diff_eq.y_dimension
        mesh = cp.mesh
        self.height, self.width = height, width = mesh.vertices_shape
        d_x0, d_x1 = mesh.d_x
        constants = _component_constraint_tensors(cp, n)
        self.step_factory = _make_step_factory(
            diff_eq,
            d_t,
            mesh,
            anti_laplacian_tol=anti_laplacian_tol,
            anti_laplacian_max_iterations=anti_laplacian_max_iterations,
        )
        self.dtype = dtype = jnp.float32
        self.padded_height = -(-height // 8) * 8
        self.padded_width = -(-width // 128) * 128
        self.polar = (
            mesh.coordinate_system_type == CoordinateSystem.POLAR
        )
        self.r_low = float(mesh.x_intervals[0][0])
        # the generic differentiator's metric terms divide by the
        # linspace vertex radii (numerical_differentiator._grid), whose
        # effective spacing (hi - lo) / (height - 1) differs from the
        # requested d_x0 whenever d_x0 does not evenly divide the r
        # interval — reconstructing the radii from d_x0 would silently
        # break the exact-parity contract on such meshes
        r_high = float(mesh.x_intervals[0][1])
        self.r_spacing = (
            (r_high - self.r_low) / (height - 1) if height > 1 else 0.0
        )

        self.geometry_static = dict(
            height=height,
            width=width,
            inv_dx0_sqr=1.0 / float(d_x0) ** 2,
            inv_dx1_sqr=1.0 / float(d_x1) ** 2,
            inv_two_dx0=1.0 / (2.0 * float(d_x0)),
            inv_two_dx1=1.0 / (2.0 * float(d_x1)),
            two_dx0=2.0 * float(d_x0),
            two_dx1=2.0 * float(d_x1),
        )

        self.padded_constants = (
            self.pad_planes(constants["dir_mask"]),
            self.pad_planes(constants["dir_vals"], dtype),
            jnp.pad(
                jnp.asarray(constants["ghost_row_mask"]),
                ((0, 0), (0, 0), (0, self.padded_width - width)),
            ),
            jnp.pad(
                jnp.asarray(constants["ghost_row_vals"], dtype),
                ((0, 0), (0, 0), (0, self.padded_width - width)),
            ),
            jnp.pad(
                jnp.asarray(constants["ghost_col_mask"]),
                ((0, 0), (0, 0), (0, self.padded_height - height)),
            ),
            jnp.pad(
                jnp.asarray(constants["ghost_col_vals"], dtype),
                ((0, 0), (0, 0), (0, self.padded_height - height)),
            ),
        )

    def pad_planes(self, array, value_dtype=None):
        return jnp.pad(
            jnp.asarray(array, value_dtype),
            (
                (0, 0),
                (0, self.padded_height - self.height),
                (0, self.padded_width - self.width),
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
        """Returns ``step(y_planes) -> y_planes`` over padded component
        planes, given the constant tensors (read from kernel refs)."""
        dtype = self.dtype
        height, width = self.height, self.width
        padded_height, padded_width = (
            self.padded_height,
            self.padded_width,
        )
        geometry = dict(
            self.geometry_static,
            # the polar radius grows along axis 0 from the mesh's lower
            # r bound, so 1/r is a per-row coefficient column (pad rows
            # continue the progression — finite, and zeroed by the
            # helpers' pad handling anyway)
            inv_r=(
                1.0
                / (
                    self.r_low
                    + self.r_spacing
                    # Mosaic only lowers integer iotas
                    * jax.lax.broadcasted_iota(
                        jnp.int32, (padded_height, 1), 0
                    ).astype(dtype)
                )
                if self.polar
                else None
            ),
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


def build_fused_system_rk4_trajectory(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    interpret: bool = False,
    anti_laplacian_tol: float = 1e-3,
    anti_laplacian_max_iterations: int = 100_000,
    storage_dtype=None,
):
    """Builds ``trajectory(y) -> ys`` computing ``n_steps`` fused RK4
    steps of a multi-component system, ``y`` of shape (h, w, n).

    ``storage_dtype`` (beyond-VMEM grids only) selects the tiled
    kernel's HBM state/trajectory precision; the VMEM-resident kernel
    ignores it."""
    from jax.experimental.pallas import tpu as pltpu

    diff_eq = cp.differential_equation
    if not _fits_vmem(cp):
        if cp.mesh.coordinate_system_type != CoordinateSystem.CARTESIAN:
            # the tiled kernel has no curvilinear metric terms;
            # delegating would return wrong physics with no error
            raise ValueError(
                "beyond-VMEM grids are only supported on Cartesian "
                "meshes (the tiled kernel has no polar metric terms)"
            )
        # beyond VMEM: the overlapped row-tiling kernel
        from pararealml_tpu.ops.tiled_system import (
            build_tiled_system_rk4_trajectory,
        )

        return build_tiled_system_rk4_trajectory(
            cp,
            d_t,
            n_steps,
            interpret=interpret,
            storage_dtype=storage_dtype,
        )
    cfg = _SystemKernelConfig(
        cp, d_t, anti_laplacian_tol, anti_laplacian_max_iterations
    )
    n = cfg.n
    height, width = cfg.height, cfg.width
    dtype = cfg.dtype
    padded_height = cfg.padded_height
    padded_width = cfg.padded_width

    def kernel(
        y_ref,  # (n, ph, pw)
        dir_mask_ref,
        dir_vals_ref,
        ghost_row_mask_ref,
        ghost_row_vals_ref,
        ghost_col_mask_ref,
        ghost_col_vals_ref,
        traj_ref,  # (n_steps, n, ph, pw) in HBM
        scratch_ref,  # (2 slots, n comps, ph, pw) VMEM
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

        def body(k, carry):
            y = step(carry)
            slot = jax.lax.rem(k, 2)

            @pl.when(k >= 2)
            def _():
                pltpu.make_async_copy(
                    scratch_ref.at[slot],
                    traj_ref.at[k - 2],
                    copy_sems.at[slot],
                ).wait()

            for comp, plane in enumerate(y):
                scratch_ref[slot, comp] = plane
            pltpu.make_async_copy(
                scratch_ref.at[slot],
                traj_ref.at[k],
                copy_sems.at[slot],
            ).start()
            return y

        jax.lax.fori_loop(
            0,
            n_steps,
            body,
            tuple(y_ref[comp] for comp in range(n)),
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
            (n_steps, n, padded_height, padded_width), dtype
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, n, padded_height, padded_width), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    def trajectory(y: jax.Array) -> jax.Array:
        planes = jnp.moveaxis(
            jnp.asarray(y, dtype).reshape(height, width, n), -1, 0
        )
        y_padded = cfg.pad_planes(planes)
        out = call(y_padded, *cfg.padded_constants)
        # transpose first, slice last so the slice fuses into the
        # consumer (see tiled_diffusion.trajectory)
        out = jnp.moveaxis(out, 1, -1)
        return out[:, :height, :width].astype(y.dtype)

    return trajectory


def build_fused_system_rk4_end(
    cp: ConstrainedProblem,
    d_t: float,
    n_steps: int,
    interpret: bool = False,
    anti_laplacian_tol: float = 1e-3,
    anti_laplacian_max_iterations: int = 100_000,
    batch: Optional[int] = None,
):
    """Builds ``end(y) -> y_final`` advancing ``n_steps`` fused system
    RK4 steps and returning ONLY the final state, or ``None`` when the
    grid exceeds VMEM.

    No trajectory is written to HBM — the state stays in VMEM for the
    whole solve. This is the right kernel for Parareal's ends-only
    iterations (see
    :func:`pararealml_tpu.ops.fused_diffusion.
    build_fused_diffusion_rk4_end`). With ``batch=B``, ``end`` maps
    ``(B, ...) -> (B, ...)`` via a Pallas grid over the batch, so
    vmap-batched Parareal slices on one device run fused instead of
    falling back to the generic XLA path.
    """
    from jax.experimental.pallas import tpu as pltpu

    if not _fits_vmem(cp):
        return None
    cfg = _SystemKernelConfig(
        cp, d_t, anti_laplacian_tol, anti_laplacian_max_iterations
    )
    n = cfg.n
    height, width = cfg.height, cfg.width
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
        step = cfg.make_step(
            dir_mask_ref[:],
            dir_vals_ref[:],
            ghost_row_mask_ref[:],
            ghost_row_vals_ref[:],
            ghost_col_mask_ref[:],
            ghost_col_vals_ref[:],
        )
        y_planes = y_ref[0] if batched else y_ref[:]
        final = jax.lax.fori_loop(
            0,
            n_steps,
            lambda k, carry: step(carry),
            tuple(y_planes[comp] for comp in range(n)),
        )
        for comp, plane in enumerate(final):
            if batched:
                out_ref[0, comp] = plane
            else:
                out_ref[comp] = plane

    if batched:
        grid_block = pl.BlockSpec(
            (1, n, padded_height, padded_width),
            lambda b: (b, 0, 0, 0),
        )

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda b: (0,) * len(shape))

        call = pl.pallas_call(
            kernel,
            grid=(batch,),
            out_shape=jax.ShapeDtypeStruct(
                (batch, n, padded_height, padded_width), dtype
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
                (n, padded_height, padded_width), dtype
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    def end(y: jax.Array) -> jax.Array:
        if batched:
            planes = jnp.moveaxis(
                jnp.asarray(y, dtype).reshape(-1, height, width, n),
                -1,
                1,
            )
            y_padded = jnp.pad(
                planes,
                (
                    (0, 0),
                    (0, 0),
                    (0, padded_height - height),
                    (0, padded_width - width),
                ),
            )
            out = call(y_padded, *cfg.padded_constants)
            out = jnp.moveaxis(out, 1, -1)[:, :height, :width]
            return out.reshape((-1,) + tuple(y.shape[1:])).astype(
                y.dtype
            )
        planes = jnp.moveaxis(
            jnp.asarray(y, dtype).reshape(height, width, n), -1, 0
        )
        y_padded = cfg.pad_planes(planes)
        out = call(y_padded, *cfg.padded_constants)
        out = jnp.moveaxis(out, 0, -1)[:height, :width]
        return out.reshape(y.shape).astype(y.dtype)

    return end


def build_fused_system_rk4_step(
    cp: ConstrainedProblem,
    d_t: float,
    interpret: bool = False,
    anti_laplacian_tol: float = 1e-3,
    anti_laplacian_max_iterations: int = 100_000,
):
    """One fused RK4 system step (the single-step specialization)."""
    trajectory = build_fused_system_rk4_trajectory(
        cp,
        d_t,
        1,
        interpret=interpret,
        anti_laplacian_tol=anti_laplacian_tol,
        anti_laplacian_max_iterations=anti_laplacian_max_iterations,
    )

    def step(y):
        return trajectory(y)[0]

    return step


# backwards-compatible wave-specific aliases
build_fused_wave_rk4_trajectory = build_fused_system_rk4_trajectory
build_fused_wave_rk4_step = build_fused_system_rk4_step
