"""Distributed iterative KKT solver: alpha-sharded PMINRES over a mesh.

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
- A diagonal (Jacobi-type) preconditioner M = sqrt(diag(K^2)) -- the
  row 2-norms of the symmetric KKT matrix, exact and cheap to build --
  equilibrates the wildly spread block scales of this family (R ~ 1e-4
  vs lamb_sigma ~ 1e3) and cuts iterations-to-tolerance severalfold
  (table in docs/SCALING.md).
- Tolerance-based early exit: the iteration is a ``lax.while_loop`` on
  the preconditioned residual estimate, not a fixed trip count; the
  TRUE relative residual is still computed (one extra matvec) at exit.
- ``b(theta) = b_const + S theta`` is assembled ON DEVICE, so the
  solver composes into jitted closed loops
  (:func:`make_distributed_closed_loop`).

Solves min z^T(H/2)z + g^T z s.t. A z = b(theta) for the slack-NONE
variants; verified against the exact direct operator on the virtual
CPU mesh (tests/test_distributed_qp.py), including a closed-loop
parity test of the mesh engine.
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
    pc_alpha: jax.Array  # (n_alpha_shard,) Jacobi diag, alpha rows
    pc_rest: jax.Array  # (n_rest,) Jacobi diag, replicated rows
    g_u: jax.Array  # (n_u,) gradient, ubar block
    g_y: jax.Array  # (n_y,)
    b_const: jax.Array  # (nc,) constant part of b(theta)
    S: jax.Array  # (nc, n_theta) theta -> b map
    r0: jax.Array  # () constant cost term


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


def _jacobi_diag(spec: QPSpec, robust: bool):
    """M = sqrt(diag(K^2)): row 2-norms of the symmetric KKT matrix --
    a positive Jacobi-type preconditioner valid for indefinite K (the
    plain diag is zero on the multiplier rows). Host float64, built
    once. Returns (d_alpha (n_alpha,), d_rest laid out as the solver's
    replicated block [u; y; (sigma); nu])."""
    H, A = spec.H, spec.A
    hdiag = np.diag(H)
    col_norms2 = (A * A).sum(axis=0)  # per z column
    row_norms2 = (A * A).sum(axis=1)  # per constraint row
    d_z = np.sqrt(hdiag**2 + col_norms2)
    d_nu = np.sqrt(row_norms2)
    floor = 1e-12 * max(d_z.max(initial=0.0), d_nu.max(initial=0.0), 1.0)
    d_z = np.maximum(d_z, floor)
    d_nu = np.maximum(d_nu, floor)
    d_alpha = d_z[spec.alpha_slice]
    parts = [d_z[spec.ubar_slice], d_z[spec.ybar_slice]]
    if robust:
        parts.append(d_z[spec.sigma_slice])
    parts.append(d_nu)
    return d_alpha, np.concatenate(parts)


def build_sharded_kkt(
    spec: QPSpec,
    mesh: Mesh,
    axis: str = "model",
    dtype=jnp.float32,
    precondition: bool = True,
) -> Tuple[ShardedKKTOperand, dict]:
    """Prepare the sharded operand (alpha columns padded to a multiple
    of the axis size) plus static metadata."""
    Hu, Hy, h_alpha, h_u, h_y, h_sigma, robust = _extract_blocks(spec)
    n_dev = mesh.shape[axis]
    n_alpha = Hu.shape[1]
    pad = (-n_alpha) % n_dev
    if precondition:
        d_alpha, d_rest = _jacobi_diag(spec, robust)
    else:
        d_alpha = np.ones(n_alpha)
        nc = spec.nc
        n_rest = (
            spec.dims.n_u + spec.dims.n_y + (spec.dims.n_y if robust else 0)
            + nc
        )
        d_rest = np.ones(n_rest)
    if pad:
        Hu = np.pad(Hu, ((0, 0), (0, pad)))
        Hy = np.pad(Hy, ((0, 0), (0, pad)))
        # Padding alpha lanes carry zero data; preconditioner 1.0 keeps
        # them inert (their residual/search components stay zero).
        d_alpha = np.concatenate([d_alpha, np.ones(pad)])
    operand = ShardedKKTOperand(
        Hu=jnp.asarray(Hu, dtype=dtype),
        Hy=jnp.asarray(Hy, dtype=dtype),
        h_alpha_diag=jnp.asarray(h_alpha, dtype=dtype),
        h_u_diag=jnp.asarray(h_u, dtype=dtype),
        h_y_diag=jnp.asarray(h_y, dtype=dtype),
        h_sigma_diag=jnp.asarray(h_sigma, dtype=dtype),
        pc_alpha=jnp.asarray(d_alpha, dtype=dtype),
        pc_rest=jnp.asarray(d_rest, dtype=dtype),
        g_u=jnp.asarray(spec.g[spec.ubar_slice], dtype=dtype),
        g_y=jnp.asarray(spec.g[spec.ybar_slice], dtype=dtype),
        b_const=jnp.asarray(spec.b_const, dtype=dtype),
        S=jnp.asarray(spec.S, dtype=dtype),
        r0=jnp.asarray(spec.r0, dtype=dtype),
    )
    meta = {
        "robust": robust,
        "n_alpha": n_alpha,
        "n_alpha_pad": n_alpha + pad,
        "dims": spec.dims,
        "use_terminal": spec.use_terminal_constraint,
        "nc": spec.nc,
    }
    return operand, meta


def _make_local_solver(
    meta: dict, axis: str, tol: float, max_iters: int, dtype,
    refine: int = 0,
):
    """Build the PER-SHARD solve body (runs INSIDE shard_map): the KKT
    matvec, the global inner product, and preconditioned MINRES with a
    while_loop tolerance exit. Returns ``local_solve(op, theta) ->
    (x_alpha_local, x_rest, rel_residual, iters)``.

    ``refine``: number of iterative-refinement restarts. f32 MINRES
    stagnates near its roundoff floor with the SOLUTION error still
    ~kappa x the residual (measured on the four-tank KKT: res 5.8e-6
    but max|du| 5.4e-4 vs the f64-factored exact map). Each restart
    re-solves K dx = rhs - K x from a fresh Krylov space, whose exit
    test is relative to the (small) restart RHS -- one restart drops
    max|du| below 1e-5 (tests/test_distributed_qp.py). Total reported
    ``iters`` includes the restart passes."""
    d = meta["dims"]
    robust = meta["robust"]
    n_u, n_y = d.n_u, d.n_y
    nc = meta["nc"]

    # Replicated-block layout inside `rest`.
    u0, y0 = 0, n_u
    s0 = y0 + n_y
    v0 = s0 + (n_y if robust else 0)

    # Constraint-row layout inside nu.
    n_dyn = n_u + n_y
    n_int_u = d.n * d.m
    n_int_y = d.n * d.p

    def kkt_matvec(op, alpha_s, rest):
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

    def dot(a_s1, r1, a_s2, r2):
        """Global inner product: psum the alpha part; replicated part
        computed identically on every device."""
        return jax.lax.psum(a_s1 @ a_s2, axis) + r1 @ r2

    one = jnp.asarray(1.0, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    tol_t = jnp.asarray(tol, dtype=dtype)

    def _minres_core(op, rhs_alpha, rhs_rest):
        """Preconditioned MINRES (Paige-Saunders recurrences with
        M = diag Jacobi) on the symmetric (possibly singular,
        consistent) KKT system. Early exit when the preconditioned
        residual estimate phibar drops below tol * beta1. Returns
        ``(x_alpha, x_rest, iters)``."""

        def prec(a, r):
            return a / op.pc_alpha, r / op.pc_rest

        r1_a, r1_r = rhs_alpha, rhs_rest
        y_a, y_r = prec(r1_a, r1_r)
        beta1 = jnp.sqrt(jnp.maximum(dot(r1_a, r1_r, y_a, y_r), 0.0))
        safe_b1 = jnp.maximum(beta1, jnp.asarray(1e-30, dtype))

        # Carry: x, r1, r2, y, oldb, beta, dbar, epsln, phibar, cs, sn,
        # w, w2, k.  (r2 starts equal to r1; w/w2 start at zero.)
        x_a = jnp.zeros_like(rhs_alpha)
        x_r = jnp.zeros_like(rhs_rest)
        init = (
            x_a, x_r,
            r1_a, r1_r,
            r1_a, r1_r,  # r2
            y_a, y_r,
            zero,  # oldb
            safe_b1,  # beta
            zero,  # dbar
            zero,  # epsln
            beta1,  # phibar
            -one,  # cs
            zero,  # sn
            jnp.zeros_like(x_a), jnp.zeros_like(x_r),  # w
            jnp.zeros_like(x_a), jnp.zeros_like(x_r),  # w2
            jnp.asarray(0, jnp.int32),  # k
        )

        def cond(st):
            phibar, k = st[12], st[19]
            return (phibar > tol_t * safe_b1) & (k < max_iters)

        def body(st):
            (x_a, x_r, r1_a, r1_r, r2_a, r2_r, y_a, y_r, oldb, beta,
             dbar, epsln, phibar, cs, sn, w_a, w_r, w2_a, w2_r, k) = st
            v_a = y_a / beta
            v_r = y_r / beta
            yk_a, yk_r = kkt_matvec(op, v_a, v_r)
            coef = jnp.where(
                k > 0,
                beta / jnp.maximum(oldb, jnp.asarray(1e-30, dtype)),
                zero,
            )
            yk_a = yk_a - coef * r1_a
            yk_r = yk_r - coef * r1_r
            alfa = dot(v_a, v_r, yk_a, yk_r)
            yk_a = yk_a - (alfa / beta) * r2_a
            yk_r = yk_r - (alfa / beta) * r2_r
            r1_a, r1_r = r2_a, r2_r
            r2_a, r2_r = yk_a, yk_r
            y_a, y_r = prec(r2_a, r2_r)
            oldb = beta
            beta_new = jnp.sqrt(
                jnp.maximum(dot(r2_a, r2_r, y_a, y_r), 0.0)
            )

            oldeps = epsln
            delta = cs * dbar + sn * alfa
            gbar = sn * dbar - cs * alfa
            epsln = sn * beta_new
            dbar = -cs * beta_new
            gamma = jnp.sqrt(gbar * gbar + beta_new * beta_new)
            gamma = jnp.maximum(gamma, jnp.asarray(1e-30, dtype))
            cs = gbar / gamma
            sn = beta_new / gamma
            phi = cs * phibar
            phibar = sn * phibar

            wn_a = (v_a - oldeps * w2_a - delta * w_a) / gamma
            wn_r = (v_r - oldeps * w2_r - delta * w_r) / gamma
            x_a = x_a + phi * wn_a
            x_r = x_r + phi * wn_r
            beta = jnp.maximum(beta_new, jnp.asarray(1e-30, dtype))
            return (x_a, x_r, r1_a, r1_r, r2_a, r2_r, y_a, y_r, oldb,
                    beta, dbar, epsln, phibar, cs, sn, wn_a, wn_r,
                    w_a, w_r, k + 1)

        st = jax.lax.while_loop(cond, body, init)
        return st[0], st[1], st[19]

    def local_solve(op, rhs_alpha, rhs_rest):
        x_a, x_r, iters = _minres_core(op, rhs_alpha, rhs_rest)
        for _ in range(refine):
            Ax_a, Ax_r = kkt_matvec(op, x_a, x_r)
            dx_a, dx_r, it2 = _minres_core(
                op, rhs_alpha - Ax_a, rhs_rest - Ax_r
            )
            x_a = x_a + dx_a
            x_r = x_r + dx_r
            iters = iters + it2
        # TRUE residual at exit (one extra matvec; phibar is the
        # preconditioned estimate).
        Ax_a, Ax_r = kkt_matvec(op, x_a, x_r)
        r_a = rhs_alpha - Ax_a
        r_r = rhs_rest - Ax_r
        bn = jnp.sqrt(
            jnp.maximum(
                dot(rhs_alpha, rhs_rest, rhs_alpha, rhs_rest), 0.0
            )
        )
        res = jnp.sqrt(
            jnp.maximum(dot(r_a, r_r, r_a, r_r), 0.0)
        ) / jnp.maximum(bn, jnp.asarray(1e-30, dtype))
        return x_a, x_r, res, iters

    layout = {
        "u0": u0, "y0": y0, "s0": s0, "v0": v0,
        "kkt_matvec": kkt_matvec, "dot": dot,
    }
    return local_solve, layout


def _rhs_rest(op, meta, theta, dtype):
    """Device-side RHS assembly: [-g_u; -g_y; (0); b_const + S theta]."""
    with jax.default_matmul_precision("highest"):
        b = op.b_const + op.S @ theta.astype(dtype)
    parts = [-op.g_u, -op.g_y]
    if meta["robust"]:
        parts.append(jnp.zeros(meta["dims"].n_y, dtype=dtype))
    parts.append(b)
    return jnp.concatenate(parts)


def _default_tol(tol, dtype) -> float:
    """Dtype-aware default: 1e-8 is reachable in f64 but below f32's
    roundoff floor (eps ~ 1.2e-7); pick per precision when unset."""
    if tol is not None:
        return tol
    return 1e-8 if jnp.dtype(dtype) == jnp.dtype("float64") else 1e-5


def make_distributed_kkt_solver(
    spec: QPSpec,
    mesh: Mesh,
    axis: str = "model",
    tol: float | None = None,
    max_iters: int = 1000,
    dtype=jnp.float32,
    precondition: bool = True,
    refine: int = 0,
):
    """Build ``solve(theta) -> (u_opt, residual_norm, iterations)``:
    preconditioned MINRES on the KKT system with the alpha dimension
    sharded over ``axis``, b(theta) assembled on device, and a
    while_loop tolerance exit (``tol=None`` -> 1e-8 in f64, 1e-5 in
    f32). ``refine``: iterative-refinement restarts (see
    :func:`_make_local_solver`) -- pass 1 to push the f32 solution
    error well below the stagnated-residual floor.

    The per-device state vector is ``(alpha_shard, rest)`` where
    ``rest`` stacks the replicated blocks [ubar; ybar; (sigma); nu].
    """
    tol = _default_tol(tol, dtype)
    operand, meta = build_sharded_kkt(
        spec, mesh, axis, dtype=dtype, precondition=precondition
    )
    d = meta["dims"]
    local_solve, _ = _make_local_solver(
        meta, axis, tol, max_iters, dtype, refine=refine
    )

    in_specs = (
        ShardedKKTOperand(
            Hu=P(None, axis),
            Hy=P(None, axis),
            h_alpha_diag=P(),
            h_u_diag=P(),
            h_y_diag=P(),
            h_sigma_diag=P(),
            pc_alpha=P(axis),
            pc_rest=P(),
            g_u=P(),
            g_y=P(),
            b_const=P(),
            S=P(),
            r0=P(),
        ),
        P(),  # theta, replicated
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P(), P(), P()),
        check_vma=False,
    )
    def sharded_solve(op, theta):
        rhs_rest = _rhs_rest(op, meta, theta, dtype)
        rhs_alpha = jnp.zeros(op.pc_alpha.shape[0], dtype=dtype)
        x_a, x_r, res, iters = local_solve(op, rhs_alpha, rhs_rest)
        return x_a, x_r, res, iters

    u0, y0 = 0, d.n_u

    def solve(theta):
        """Returns ``(u_opt, relative_residual, iterations)``; u_opt is
        the flattened ubar*[0, L-1]."""
        x_a, x_r, res, iters = sharded_solve(
            operand, jnp.asarray(theta, dtype=dtype)
        )
        ubar = x_r[u0:y0]
        u_opt = ubar[d.n * d.m :]
        return u_opt, res, iters

    return solve


def make_distributed_closed_loop(
    mesh: Mesh,
    plant,
    spec: QPSpec,
    n_steps: int,
    n_mpc_step: int = 1,
    axis: str = "model",
    tol: float | None = None,
    max_iters: int = 1000,
    dtype=jnp.float32,
    precondition: bool = True,
    refine: int = 0,
):
    """Mesh closed-loop engine whose per-step QP solve is the
    alpha-sharded PMINRES solver: scenarios shard over ``data`` and
    each solve's Hankel-alpha reductions psum over ``axis`` (the
    sharded-QP extension run end to end, VERDICT round-1 item 4).

    Returns jitted ``run(x0s, u_pasts, y_pasts, Ws) ->
    ClosedLoopResult`` (per-scenario arrays sharded over ``data``;
    ``converged`` lanes are ``residual <= 10 * tol`` per solve). Cost
    per solve is evaluated from the solution blocks:
    ``0.5 z^T H z + g^T z + r0`` with the structured diagonal H.
    """
    from direct_data_driven_mpc_tpu.control.loop import (
        closed_loop_rollout,
    )
    from direct_data_driven_mpc_tpu.ops.lti import LTIParams

    tol = _default_tol(tol, dtype)

    operand, meta = build_sharded_kkt(
        spec, mesh, axis, dtype=dtype, precondition=precondition
    )
    d = meta["dims"]
    robust = meta["robust"]
    local_solve, layout = _make_local_solver(
        meta, axis, tol, max_iters, dtype, refine=refine
    )
    u0, y0, s0v, v0 = (
        layout["u0"], layout["y0"], layout["s0"], layout["v0"]
    )
    m = d.m
    tol_ok = jnp.asarray(10.0 * tol, dtype=dtype)

    op_specs = ShardedKKTOperand(
        Hu=P(None, axis),
        Hy=P(None, axis),
        h_alpha_diag=P(),
        h_u_diag=P(),
        h_y_diag=P(),
        h_sigma_diag=P(),
        pc_alpha=P(axis),
        pc_rest=P(),
        g_u=P(),
        g_y=P(),
        b_const=P(),
        S=P(),
        r0=P(),
    )
    from direct_data_driven_mpc_tpu.control.loop import ClosedLoopResult

    result_specs = ClosedLoopResult(
        u_sys=P("data"),
        y_sys=P("data"),
        costs=P("data"),
        converged=P("data"),
        x_final=P("data"),
        u_past=P("data"),
        y_past=P("data"),
        solver_state=None,
    )
    plant = LTIParams(*(jnp.asarray(a, dtype=dtype) for a in plant))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(op_specs, P("data"), P("data"), P("data"), P("data")),
        out_specs=result_specs,
        check_vma=False,
    )
    def sharded_run(op, x0s, u_pasts, y_pasts, Ws):
        def solve_fn(theta, state):
            rhs_rest = _rhs_rest(op, meta, theta, dtype)
            rhs_alpha = jnp.zeros(op.pc_alpha.shape[0], dtype=dtype)
            x_a, x_r, res, _ = local_solve(op, rhs_alpha, rhs_rest)
            ubar = x_r[u0:y0]
            ybar = x_r[y0:s0v]
            # Optimal cost from the structured-diagonal Hessian; the
            # alpha ridge needs the global ||alpha||^2 (one psum).
            a2 = jax.lax.psum(x_a @ x_a, axis)
            cost = 0.5 * (
                op.h_alpha_diag * a2
                + ubar @ (op.h_u_diag * ubar)
                + ybar @ (op.h_y_diag * ybar)
            )
            if robust:
                sigma = x_r[s0v:v0]
                cost = cost + 0.5 * op.h_sigma_diag * (sigma @ sigma)
            cost = cost + op.g_u @ ubar + op.g_y @ ybar + op.r0
            u_seq = ubar[d.n * m :].reshape(-1, m)
            ok = (res <= tol_ok) & jnp.all(jnp.isfinite(u_seq))
            return u_seq, cost, state, ok

        def one(x0, up, yp, W):
            return closed_loop_rollout(
                plant, (solve_fn, None), x0, up, yp, W,
                n_steps=n_steps, n_mpc_step=n_mpc_step,
            )

        return jax.vmap(one)(x0s, u_pasts, y_pasts, Ws)

    def run(x0s, u_pasts, y_pasts, Ws):
        return sharded_run(operand, x0s, u_pasts, y_pasts, Ws)

    return jax.jit(run)
