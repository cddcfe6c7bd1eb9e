"""Multi-chip proving on the virtual 8-device CPU mesh.

Two layers of coverage:

* the mesh proving stage (parallel/kernels.make_multichip_step) runs on a
  real multi-shard fib guest's real Cpu-chip traces — per-shard commit with
  columns on the 'col' axis, real LogUp cumulative sums partitioned over
  'shard', and the cross-shard septic digest collective — cross-checked
  bit-for-bit against the host prover's kernels;
* full shard proofs distributed across mesh devices via
  ``MipsMachine.prove(devices=...)`` / ``StarkMachine`` device placement,
  accepted by the unchanged verifier and bit-identical to the single-device
  prover.  (The full 49-chip machine on the virtual CPU mesh costs tens of
  minutes of XLA CPU compiles — the TPU path compiles the same kernels in
  seconds — so the device-placement test drives the toy machine, like
  test_device_path; set ZKM_HEAVY_TESTS=1 to run the full MIPS machine
  variant.)
"""

import os

import numpy as np
import pytest

import __graft_entry__ as graft


def _mesh(n_shard, n_col):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < n_shard * n_col:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[: n_shard * n_col]).reshape(n_shard, n_col),
                axis_names=("shard", "col"))


def test_mesh_step_real_traces():
    """Real fib guest -> 4 shards -> the full mesh proving stage (commit,
    in-kernel Fiat-Shamir transcript, LogUp perm, AIR quotient, FRI fold
    chain) cross-checked bit-for-bit against a host replay with the real
    DuplexChallenger (the dryrun_multichip core).

    Runs on the Branch chip: the Cpu chip's 21-lookup LogUp graph costs
    XLA:CPU the better part of an hour to compile on the virtual mesh
    (the TPU backend compiles the same kernels in seconds); the Cpu chip's
    mesh commit + septic collective is covered by dryrun_multichip and the
    device-placement prover test below."""
    from zkmips_tpu.parallel.kernels import (
        host_stage_reference,
        make_multichip_step,
        septic_identity_host,
        transcript_prefix_state,
    )

    import jax

    traces, digests, pvs, chip = graft._real_shard_traces(4, chip_name="Branch")
    s, _h, w = traces.shape
    mesh = _mesh(4, 2)
    w_pad = -w % 2
    if w_pad:
        traces = np.concatenate(
            [traces, np.zeros((s, traces.shape[1], w_pad), dtype=np.uint32)], axis=2
        )
    states0 = np.stack([transcript_prefix_state(pv) for pv in pvs])
    step = make_multichip_step(mesh, chip=chip)
    out = jax.device_get(step(traces, digests, pvs, states0))
    assert septic_identity_host(out["all_digests"])
    for i in range(s):
        ref = host_stage_reference(chip, traces[i], pvs[i])
        for dev_key, ref_key in (
            ("main_roots", "main_root"), ("perm_roots", "perm_root"),
            ("quotient_roots", "quotient_root"), ("fold_roots", "fold_roots"),
            ("final_polys", "final_poly"), ("cum_sums", "cum_sum"),
        ):
            assert np.array_equal(out[dev_key][i], ref[ref_key]), (
                f"{ref_key} mismatch shard {i}"
            )


def test_mesh_step_rejects_tampered_digest():
    """Tampering one shard's septic digest breaks the cross-shard identity."""
    from zkmips_tpu.ops import field as f
    from zkmips_tpu.parallel.kernels import septic_identity_host

    _traces, digests, _pvs, _chip = graft._real_shard_traces(4)
    assert septic_identity_host(digests)
    bad = np.array(digests)
    bad[1, 3] = f.to_monty_int(12345)
    assert not septic_identity_host(bad)


def test_device_placement_prove_verify(monkeypatch):
    """Shard proofs land on distinct mesh devices and verify unchanged;
    stage outputs are placement-independent (bit-identical roots)."""
    import jax
    import jax.numpy as jnp

    from tests.test_machine import RECORD, _fib_pv, _machine
    from zkmips_tpu.stark import machine as sm

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    monkeypatch.setattr(sm, "DEVICE_MIN_ROWS", 0)
    m = _machine()
    pk = m.setup(None)
    pv = np.array([_fib_pv(16)], dtype=np.uint32)
    proofs = []
    for dev in jax.devices()[:2]:
        with jax.default_device(dev):
            proofs.append(m.prove_shard(pk, RECORD, pv, xp=jnp))
    for p in proofs:
        assert m.verify_shard(pk.vk, p)
    assert np.array_equal(proofs[0].main_root, proofs[1].main_root)
    assert np.array_equal(proofs[0].quotient_root, proofs[1].quotient_root)


@pytest.mark.skipif(not os.environ.get("ZKM_HEAVY_TESTS"), reason="hour-scale CPU XLA compiles")
def test_full_mips_mesh_prove():
    """Real 4-shard MIPS program proven with shards distributed across the
    8 virtual devices, accepted by the unchanged verifier."""
    import jax

    from zkmips_tpu.executor import Executor, Instruction, Opcode, Register, asm
    from zkmips_tpu.machine.machine import mips_machine
    from zkmips_tpu.stark.machine import StarkConfig

    R, O = Register, Opcode
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, 120),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    ex = Executor(p, shard_size=256)
    records = ex.run()
    assert len(records) >= 3
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records, device=True, devices=jax.devices())
    assert m.verify(pk.vk, proofs, p)
