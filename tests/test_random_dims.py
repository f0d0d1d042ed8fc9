"""Property-style engine parity across random problem dimensions.

The pairwise parity tests pin the four-tank shapes; this sweep checks
the host loop == generic engine == condensed engine identity holds
across arbitrary (ns, n, m, p, L, N, n_mpc_step) combinations,
including plants whose true order differs from the controller's model
order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from direct_data_driven_mpc_tpu.control.controller import (
    DirectDataDrivenMPCController,
)
from direct_data_driven_mpc_tpu.control.linear_engine import (
    build_affine_block_map,
    linear_closed_loop_rollout,
)
from direct_data_driven_mpc_tpu.control.loop import closed_loop_rollout
from direct_data_driven_mpc_tpu.control.operation import (
    simulate_data_driven_mpc_control_loop,
)
from direct_data_driven_mpc_tpu.models.random_lti import random_stable_lti
from direct_data_driven_mpc_tpu.qp.spec import (
    DataDrivenMPCType,
    SlackVarConstraintTypes,
)

CASES = [
    # (seed, ns, n, m, p, L, n_mpc_step, controller_type)
    (0, 3, 3, 1, 1, 8, 1, DataDrivenMPCType.ROBUST),
    (1, 5, 4, 2, 3, 9, 3, DataDrivenMPCType.ROBUST),
    (2, 2, 2, 3, 1, 6, 1, DataDrivenMPCType.NOMINAL),
    (3, 6, 5, 1, 2, 11, 5, DataDrivenMPCType.ROBUST),
    (4, 4, 3, 2, 2, 7, 2, DataDrivenMPCType.NOMINAL),
]


@pytest.mark.parametrize(
    "seed,ns,n,m,p,L,n_mpc_step,ctype", CASES
)
def test_three_engines_agree_on_random_dims(
    seed, ns, n, m, p, L, n_mpc_step, ctype
):
    rng = np.random.default_rng(seed)
    plant = random_stable_lti(
        seed=seed, ns=ns, m=m, p=p, spectral_radius=0.85
    )
    N = m * (L + 2 * n) + L + 2 * n - 1 + 10
    u_d = rng.uniform(-1, 1, (N, m))
    w_d = 0.002 * rng.uniform(-1, 1, (N, p))
    y_d = plant.simulate(u_d, w_d, N)
    u_s = 0.3 * np.ones((m, 1))
    y_s = plant.get_equilibrium_output_from_input(
        u_s.flatten()
    ).reshape(-1, 1)
    ctrl = DirectDataDrivenMPCController(
        n=n, m=m, p=p, u_d=u_d, y_d=y_d, L=L,
        Q=3.0 * np.eye(p * L), R=1e-4 * np.eye(m * L),
        u_s=u_s, y_s=y_s,
        eps_max=0.002, lamb_alpha=50.0, lamb_sigma=1000.0, c=1.0,
        slack_var_constraint_type=SlackVarConstraintTypes.NONE,
        controller_type=ctype, n_mpc_step=n_mpc_step,
    )

    n_steps = 3 * n_mpc_step + 1  # non-multiple: exercises trimming
    w_sys = 0.002 * rng.uniform(-1, 1, (n_steps, p))
    x0 = plant.get_state().copy()
    up = ctrl.u_past.reshape(n, m).copy()
    yp = ctrl.y_past.reshape(n, p).copy()

    u_host, y_host = simulate_data_driven_mpc_control_loop(
        plant, ctrl, n_steps, rng, verbose=0, w_sys=w_sys
    )
    generic = closed_loop_rollout(
        plant.as_params(),
        ctrl.solution_map(dtype=jnp.float64),
        x0, up, yp, w_sys,
        n_steps=n_steps, n_mpc_step=n_mpc_step,
    )
    bm = build_affine_block_map(
        plant.as_params(), ctrl._op, n=n, m=m, p=p,
        n_mpc_step=n_mpc_step, solves_per_block=2, dtype=jnp.float64,
    )
    linear = linear_closed_loop_rollout(
        bm, x0, up, yp, W=w_sys,
        n_steps=n_steps, n_mpc_step=n_mpc_step,
    )

    np.testing.assert_allclose(
        np.asarray(generic.u_sys), u_host, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(linear.u_sys), u_host, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(linear.y_sys), y_host, atol=1e-8
    )
