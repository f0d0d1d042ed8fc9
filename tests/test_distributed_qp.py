"""Distributed (alpha-sharded) MINRES KKT solver vs the exact direct
operator, on the virtual CPU mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

from direct_data_driven_mpc_tpu.parallel.mesh import make_scenario_mesh
from direct_data_driven_mpc_tpu.qp.distributed import (
    make_distributed_kkt_solver,
)
from direct_data_driven_mpc_tpu.qp.solution_map import (
    compute_solution_map,
    solve_u,
)
from direct_data_driven_mpc_tpu.qp.spec import (
    DataDrivenMPCType,
    SlackVarConstraintTypes,
)

from tests.test_qp import _small_problem


@pytest.mark.parametrize(
    "ctype,use_terminal,iters,atol",
    [
        (DataDrivenMPCType.ROBUST, True, 400, 5e-4),
        (DataDrivenMPCType.ROBUST, False, 400, 5e-4),
        # NOMINAL: singular (but consistent) KKT; MINRES converges to a
        # minimum-residual point whose ubar_pred matches the optimum.
        (DataDrivenMPCType.NOMINAL, True, 800, 5e-3),
    ],
)
def test_distributed_minres_matches_direct(ctype, use_terminal, iters, atol):
    spec, theta = _small_problem(ctype, use_terminal=use_terminal)
    mesh = make_scenario_mesh(n_data=2, n_model=4)
    solve = make_distributed_kkt_solver(
        spec, mesh, axis="model", num_iters=iters, dtype=jnp.float64
    )
    u_dist, res = solve(theta)
    assert float(res) < 1e-6, f"MINRES residual {float(res)}"

    sol_map = compute_solution_map(spec, dtype=jnp.float64)
    u_exact = solve_u(sol_map, jnp.asarray(theta))
    np.testing.assert_allclose(
        np.asarray(u_dist), np.asarray(u_exact), atol=atol
    )


def test_distributed_rejects_convex_slack():
    spec, _ = _small_problem(slack=SlackVarConstraintTypes.CONVEX)
    mesh = make_scenario_mesh(n_data=2, n_model=4)
    with pytest.raises(ValueError, match="slack-NONE"):
        make_distributed_kkt_solver(spec, mesh)
