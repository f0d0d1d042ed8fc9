"""Distributed iterative KKT solver: alpha-sharded MINRES over a mesh.

The direct solution operator (qp/solution_map.py) factorizes the KKT
system on ONE host -- the right call at the paper's scale. When a
single QP outgrows one chip (huge Hankel width N - L - n + 1, the
dominant dimension), the KKT system itself must be sharded. This module
implements that extension (SURVEY.md section 5 "sharded-QP extension",
BASELINE.json north star "QP KKT/residual block reductions via
psum/all-reduce collectives over ICI"):

- The alpha block (Hankel columns) is partitioned over the mesh's
  ``model`` axis: each device owns a column shard of H_u/H_y and the
  matching slice of alpha.
- One MINRES iteration = local block matvecs + exactly TWO collectives:
  a ``psum`` of the (n_u + n_y)-vector [H_u; H_y] @ alpha (the KKT
  residual block reduction, over ICI) and a ``psum`` of the alpha part
  of each inner product.
- MINRES handles the symmetric INDEFINITE (and, for NOMINAL variants,
  singular-but-consistent) KKT matrix that plain CG cannot.

Solves min z^T(H/2)z + g^T z s.t. A z = b(theta) for the slack-NONE
variants; verified against the exact direct operator on the virtual
CPU mesh (tests/test_distributed_qp.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from direct_data_driven_mpc_tpu.qp.spec import (
    DataDrivenMPCType,
    QPSpec,
    SlackVarConstraintTypes,
)


class ShardedKKTOperand(NamedTuple):
    """Per-device operand data (a JAX pytree; leaves carry a leading
    shard dimension when placed through shard_map in_specs)."""

    Hu: jax.Array  # (n_u, n_alpha_shard) column shard
    Hy: jax.Array  # (n_y, n_alpha_shard)
    h_alpha_diag: jax.Array  # () ridge 2*lamb_alpha*eps_max (0 nominal)
    h_u_diag: jax.Array  # (n_u,) diagonal of the ubar cost block
    h_y_diag: jax.Array  # (n_y,)
    h_sigma_diag: jax.Array  # () ridge 2*lamb_sigma (0 if no sigma)


def _extract_blocks(spec: QPSpec):
    """Pull the structured blocks out of a slack-NONE QPSpec (the
    Hessian is diagonal per variable block; constraints are the
    dynamics + selection rows)."""
    if spec.slack_var_constraint_type == SlackVarConstraintTypes.CONVEX:
        raise ValueError(
            "The distributed solver covers the equality-constrained "
            "(slack-NONE) variants."
        )
    d = spec.dims
    robust = spec.controller_type == DataDrivenMPCType.ROBUST
    asl, usl, ysl = spec.alpha_slice, spec.ubar_slice, spec.ybar_slice
    Hu = -spec.A[0 : d.n_u, asl]
    Hy = -spec.A[d.n_u : d.n_u + d.n_y, asl]
    # The sharded matvec models the ubar/ybar Hessian blocks as
    # diagonals; anything else (cross-weighted Q/R) would be silently
    # truncated, so reject it outright.
    for name, sl in (("R", usl), ("Q", ysl)):
        block = spec.H[sl, sl]
        if np.abs(block - np.diag(np.diag(block))).max() > 1e-12 * max(
            1.0, np.abs(block).max()
        ):
            raise NotImplementedError(
                f"The distributed solver currently supports diagonal "
                f"{name} weighting blocks only."
            )
    h_alpha = float(spec.H[asl, asl][0, 0]) if robust else 0.0
    h_u = np.diag(spec.H[usl, usl]).copy()
    h_y = np.diag(spec.H[ysl, ysl]).copy()
    if robust:
        ssl = spec.sigma_slice
        h_sigma = float(spec.H[ssl, ssl][0, 0])
    else:
        h_sigma = 0.0
    return Hu, Hy, h_alpha, h_u, h_y, h_sigma, robust


def build_sharded_kkt(
    spec: QPSpec, mesh: Mesh, axis: str = "model", dtype=jnp.float32
) -> Tuple[ShardedKKTOperand, dict]:
    """Prepare the sharded operand (alpha columns padded to a multiple
    of the axis size) plus static metadata."""
    Hu, Hy, h_alpha, h_u, h_y, h_sigma, robust = _extract_blocks(spec)
    n_dev = mesh.shape[axis]
    n_alpha = Hu.shape[1]
    pad = (-n_alpha) % n_dev
    if pad:
        Hu = np.pad(Hu, ((0, 0), (0, pad)))
        Hy = np.pad(Hy, ((0, 0), (0, pad)))
    operand = ShardedKKTOperand(
        Hu=jnp.asarray(Hu, dtype=dtype),
        Hy=jnp.asarray(Hy, dtype=dtype),
        h_alpha_diag=jnp.asarray(h_alpha, dtype=dtype),
        h_u_diag=jnp.asarray(h_u, dtype=dtype),
        h_y_diag=jnp.asarray(h_y, dtype=dtype),
        h_sigma_diag=jnp.asarray(h_sigma, dtype=dtype),
    )
    meta = {
        "robust": robust,
        "n_alpha": n_alpha,
        "n_alpha_pad": n_alpha + pad,
        "dims": spec.dims,
        "use_terminal": spec.use_terminal_constraint,
        "b_const": np.asarray(spec.b_const, dtype=np.float64),
        "S": np.asarray(spec.S, dtype=np.float64),
    }
    return operand, meta


def make_distributed_kkt_solver(
    spec: QPSpec,
    mesh: Mesh,
    axis: str = "model",
    num_iters: int = 200,
    dtype=jnp.float32,
):
    """Build ``solve(theta) -> (u_opt, residual_norm)``: MINRES on the
    KKT system with the alpha dimension sharded over ``axis``.

    The per-device state vector is ``(alpha_shard, rest)`` where
    ``rest`` stacks the replicated blocks [ubar; ybar; (sigma); nu].
    """
    operand, meta = build_sharded_kkt(spec, mesh, axis, dtype=dtype)
    d = meta["dims"]
    robust = meta["robust"]
    n_u, n_y = d.n_u, d.n_y
    nc = spec.nc
    n_dev = mesh.shape[axis]
    shard_cols = meta["n_alpha_pad"] // n_dev

    # Replicated-block layout inside `rest`.
    u0, y0 = 0, n_u
    s0 = y0 + n_y
    v0 = s0 + (n_y if robust else 0)
    n_rest = v0 + nc

    # Constraint-row layout inside nu.
    n_dyn = n_u + n_y
    n_int_u = d.n * d.m
    n_int_y = d.n * d.p

    def _kkt_matvec(op, alpha_s, rest):
        """One sharded KKT matvec. alpha_s: (shard_cols,) local;
        rest: replicated. Returns (alpha_out_local, rest_out)."""
        ubar = rest[u0:y0]
        ybar = rest[y0:s0]
        sigma = rest[s0:v0] if robust else None
        nu = rest[v0:]
        nu_dyn_u = nu[0:n_u]
        nu_dyn_y = nu[n_u:n_dyn]
        nu_int_u = nu[n_dyn : n_dyn + n_int_u]
        nu_int_y = nu[n_dyn + n_int_u : n_dyn + n_int_u + n_int_y]

        with jax.default_matmul_precision("highest"):
            # H z rows.
            out_alpha = op.h_alpha_diag * alpha_s
            out_u = op.h_u_diag * ubar
            out_y = op.h_y_diag * ybar

            # A^T nu rows: alpha columns get -[Hu; Hy]^T nu_dyn (local
            # column slice -> no collective).
            out_alpha = out_alpha - (
                nu_dyn_u @ op.Hu + nu_dyn_y @ op.Hy
            )
            out_u = out_u + nu_dyn_u
            out_y = out_y + nu_dyn_y
            out_u = out_u.at[0:n_int_u].add(nu_int_u)
            out_y = out_y.at[0:n_int_y].add(nu_int_y)
            if meta["use_terminal"]:
                t0 = n_dyn + n_int_u + n_int_y
                nu_term_u = nu[t0 : t0 + n_int_u]
                nu_term_y = nu[t0 + n_int_u : t0 + n_int_u + n_int_y]
                out_u = out_u.at[n_u - n_int_u :].add(nu_term_u)
                out_y = out_y.at[n_y - n_int_y :].add(nu_term_y)

            # A z rows (dynamics): ubar - Hu alpha and
            # ybar (+ sigma) - Hy alpha. The Hankel-alpha products are
            # partial sums per shard -> THE psum (KKT residual block
            # reduction over ICI).
            Hu_a = jax.lax.psum(op.Hu @ alpha_s, axis)
            Hy_a = jax.lax.psum(op.Hy @ alpha_s, axis)
            out_nu_dyn_u = ubar - Hu_a
            out_nu_dyn_y = ybar - Hy_a
            if robust:
                out_sigma = op.h_sigma_diag * sigma + nu_dyn_y
                out_nu_dyn_y = out_nu_dyn_y + sigma
            out_nu = [out_nu_dyn_u, out_nu_dyn_y]
            out_nu.append(ubar[0:n_int_u])
            out_nu.append(ybar[0:n_int_y])
            if meta["use_terminal"]:
                out_nu.append(ubar[n_u - n_int_u :])
                out_nu.append(ybar[n_y - n_int_y :])

        rest_out = [out_u, out_y]
        if robust:
            rest_out.append(out_sigma)
        rest_out.extend(out_nu)
        return out_alpha, jnp.concatenate(rest_out)

    def _dot(a_s1, r1, a_s2, r2):
        """Global inner product: psum the alpha part; replicated part
        computed identically on every device."""
        return jax.lax.psum(a_s1 @ a_s2, axis) + r1 @ r2

    in_specs = (
        ShardedKKTOperand(
            Hu=P(None, axis),
            Hy=P(None, axis),
            h_alpha_diag=P(),
            h_u_diag=P(),
            h_y_diag=P(),
            h_sigma_diag=P(),
        ),
        P(axis),  # rhs alpha part, sharded (zeros)
        P(),  # rhs rest part, replicated
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )
    def minres(op, rhs_alpha, rhs_rest):
        """MINRES on the symmetric (possibly singular, consistent) KKT
        system; returns (alpha_shard, rest, residual_norm)."""
        rhs_a = rhs_alpha.reshape(-1)
        b_norm = jnp.sqrt(_dot(rhs_a, rhs_rest, rhs_a, rhs_rest))

        # Lanczos/MINRES state.
        x_a = jnp.zeros_like(rhs_a)
        x_r = jnp.zeros_like(rhs_rest)
        v_a, v_r = rhs_a, rhs_rest
        beta = b_norm
        v_a = v_a / beta
        v_r = v_r / beta
        v_prev_a = jnp.zeros_like(v_a)
        v_prev_r = jnp.zeros_like(v_r)
        # Direction recurrences.
        w_a = jnp.zeros_like(v_a)
        w_r = jnp.zeros_like(v_r)
        w_prev_a = jnp.zeros_like(v_a)
        w_prev_r = jnp.zeros_like(v_r)
        eta = beta
        # Scalars typed to the solve dtype: Python floats would weak-
        # promote to f64 under x64 and break the fori_loop carry.
        one = jnp.asarray(1.0, dtype=dtype)
        zero = jnp.asarray(0.0, dtype=dtype)
        c_prev, s_prev = one, zero
        c_pprev, s_pprev = one, zero
        beta_prev = zero

        def body(i, st):
            (x_a, x_r, v_a, v_r, v_prev_a, v_prev_r, w_a, w_r,
             w_prev_a, w_prev_r, eta, c_prev, s_prev, c_pprev,
             s_pprev, beta_prev) = st
            # Lanczos step.
            Av_a, Av_r = _kkt_matvec(op, v_a, v_r)
            alpha_coef = _dot(Av_a, Av_r, v_a, v_r)
            t_a = Av_a - alpha_coef * v_a - beta_prev * v_prev_a
            t_r = Av_r - alpha_coef * v_r - beta_prev * v_prev_r
            beta_new = jnp.sqrt(jnp.maximum(_dot(t_a, t_r, t_a, t_r), 0.0))

            # Two previous Givens rotations applied to the new column.
            delta = c_prev * alpha_coef - c_pprev * s_prev * beta_prev
            rho2 = s_prev * alpha_coef + c_pprev * c_prev * beta_prev
            rho3 = s_pprev * beta_prev
            # New rotation annihilating beta_new.
            rho1 = jnp.sqrt(delta * delta + beta_new * beta_new)
            rho1 = jnp.where(rho1 == 0.0, 1e-30, rho1)
            c_new = delta / rho1
            s_new = beta_new / rho1

            # Direction update.
            wn_a = (v_a - rho2 * w_a - rho3 * w_prev_a) / rho1
            wn_r = (v_r - rho2 * w_r - rho3 * w_prev_r) / rho1
            x_a = x_a + c_new * eta * wn_a
            x_r = x_r + c_new * eta * wn_r
            eta = -s_new * eta

            safe_beta = jnp.where(beta_new == 0.0, 1.0, beta_new)
            vn_a = t_a / safe_beta
            vn_r = t_r / safe_beta
            return (x_a, x_r, vn_a, vn_r, v_a, v_r, wn_a, wn_r,
                    w_a, w_r, eta, c_new, s_new, c_prev, s_prev,
                    beta_new)

        st = (x_a, x_r, v_a, v_r, v_prev_a, v_prev_r, w_a, w_r,
              w_prev_a, w_prev_r, eta, c_prev, s_prev, c_pprev,
              s_pprev, beta_prev)
        st = jax.lax.fori_loop(0, num_iters, body, st)
        x_a, x_r = st[0], st[1]
        # True residual.
        Ax_a, Ax_r = _kkt_matvec(op, x_a, x_r)
        r_a = rhs_a - Ax_a
        r_r = rhs_rest - Ax_r
        res = jnp.sqrt(_dot(r_a, r_r, r_a, r_r)) / jnp.maximum(
            b_norm, 1e-30
        )
        return x_a, x_r, res

    b_const = meta["b_const"]
    S_mat = meta["S"]
    g_u_np = np.asarray(spec.g[spec.ubar_slice])
    g_y_np = np.asarray(spec.g[spec.ybar_slice])

    def solve(theta):
        """Returns ``(u_opt, relative_residual)``; u_opt is the
        flattened ubar*[0, L-1]."""
        b = jnp.asarray(
            b_const + S_mat @ np.asarray(theta, dtype=np.float64),
            dtype=dtype,
        )
        rhs_rest_parts = [
            -jnp.asarray(g_u_np, dtype=dtype),
            -jnp.asarray(g_y_np, dtype=dtype),
        ]
        if robust:
            rhs_rest_parts.append(jnp.zeros(n_y, dtype=dtype))
        rhs_rest_parts.append(b)
        rhs_rest = jnp.concatenate(rhs_rest_parts)
        rhs_alpha = jnp.zeros(meta["n_alpha_pad"], dtype=dtype)
        x_a, x_r, res = minres(operand, rhs_alpha, rhs_rest)
        ubar = x_r[u0:y0]
        u_opt = ubar[d.n * d.m :]
        return u_opt, res

    return solve
