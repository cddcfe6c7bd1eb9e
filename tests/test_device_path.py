"""Device-path prove on the virtual CPU backend: the jnp stage kernels
(commit, perm traces, quotient, FRI fold/open, batched query gathers) that
run on TPU, exercised end-to-end without hardware.

Uses the toy StarkMachine chips (a full MIPS machine costs ~an hour of CPU
XLA compiles); proofs from the device path must verify with the same
verifier that accepts the numpy prover's proofs.
"""

import numpy as np
import pytest

from tests.test_machine import RECORD, _fib_pv, _machine


def test_device_prove_verify(monkeypatch):
    import jax.numpy as jnp

    from zkmips_tpu.stark import machine as sm

    # force the toy chips through the jnp kernels (they normally stay on the
    # host below DEVICE_MIN_ROWS to bound compile time)
    monkeypatch.setattr(sm, "DEVICE_MIN_ROWS", 0)
    m = _machine()
    pk = m.setup(None)
    pv = np.array([_fib_pv(16)], dtype=np.uint32)
    proof_dev = m.prove_shard(pk, RECORD, pv, xp=jnp)
    assert m.verify_shard(pk.vk, proof_dev)
    proof_np = m.prove_shard(pk, RECORD, pv, xp=np)
    assert m.verify_shard(pk.vk, proof_np)
    # deterministic stages agree bit-for-bit across backends
    assert np.array_equal(proof_dev.main_root, proof_np.main_root)
    assert np.array_equal(proof_dev.perm_root, proof_np.perm_root)
    assert np.array_equal(proof_dev.quotient_root, proof_np.quotient_root)
    for od, on in zip(proof_dev.opened, proof_np.opened):
        assert np.array_equal(od.main_local, on.main_local)
        assert np.array_equal(od.perm_local, on.perm_local)
        assert np.array_equal(od.local_cumulative_sum, on.local_cumulative_sum)
