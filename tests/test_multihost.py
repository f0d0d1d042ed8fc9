"""Multi-host helpers (single-process semantics + key invariance)."""

import numpy as np

import jax

from direct_data_driven_mpc_tpu.parallel.multihost import (
    global_scenario_keys,
    initialize_distributed,
    make_global_mesh,
)


def test_initialize_distributed_noop_single_process():
    initialize_distributed()  # must not raise or initialize anything
    assert jax.process_count() == 1


def test_global_scenario_keys_cover_global_indices():
    base = jax.random.key(0)
    keys = global_scenario_keys(base, 16)
    assert keys.shape[0] == 16
    # Key for scenario i equals fold_in(base, i) regardless of sharding.
    expected = jax.random.fold_in(base, 3)
    assert jax.random.key_data(keys[3]).tolist() == (
        jax.random.key_data(expected).tolist()
    )
    # Distinct scenarios get distinct keys.
    data = np.asarray(jax.vmap(jax.random.key_data)(keys))
    assert len({tuple(row) for row in data}) == 16


def test_global_mesh_single_process():
    mesh = make_global_mesh(n_model=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 <= len(jax.devices())
