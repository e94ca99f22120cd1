"""Multi-process multi-host path, executed for real (slow).

Spawns 2 child processes x 4 virtual CPU devices joined via
jax.distributed.initialize, runs one train step through Loader/
shard_for_host + make_array_from_process_local_data + the jitted train_step
on the 8-device global mesh, and checks the loss equals a single-process run
on the same global batch. See tools/multihost_smoke.py.
"""

import pytest


@pytest.mark.slow
def test_two_process_train_step_matches_single():
    from tools.multihost_smoke import main

    results = main()
    assert len(results) == 3
    assert results[0]["devices"] == 8  # 2 procs x 4 local = 8 global
    assert results[2]["devices"] == 4
