"""Fiat–Shamir duplex challenger over Poseidon2-KoalaBear, width 16 / rate 8.

Host-side (numpy scalar) reimplementation of the transcript used by the
reference's ``KoalaBearPoseidon2`` config (reference:
crates/stark/src/kb31_poseidon2.rs:28 ``InnerChallenger = DuplexChallenger``;
semantics follow Plonky3's DuplexChallenger: observing clears the output
buffer and absorbs in rate-sized chunks with overwrite; sampling pops from
the end of the output buffer).

The challenger is inherently sequential and tiny — it lives on the host and
must never be traced into an XLA graph.  All values are *canonical* u32
field elements (not Montgomery): transcripts are defined over canonical
representations.
"""

from __future__ import annotations

import numpy as np

from ..ops import ext4, field as f, poseidon2 as p2

WIDTH = 16
RATE = 8


class DuplexChallenger:
    def __init__(self):
        self.state = np.zeros(WIDTH, dtype=np.uint32)  # Montgomery form
        self.input_buffer: list[int] = []  # canonical ints
        self.output_buffer: list[int] = []  # canonical ints

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger.__new__(DuplexChallenger)
        c.state = self.state.copy()
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def _duplexing(self):
        assert len(self.input_buffer) <= RATE
        for i, v in enumerate(self.input_buffer):
            self.state[i] = f.to_monty_int(v)
        self.input_buffer.clear()
        self.state = p2.permute(self.state)
        self.output_buffer = [int(x) for x in f.from_monty(self.state[:RATE])]

    def observe(self, value: int):
        """Observe one canonical field element."""
        self.output_buffer.clear()
        self.input_buffer.append(int(value) % f.P)
        if len(self.input_buffer) == RATE:
            self._duplexing()

    def observe_slice(self, values):
        for v in np.asarray(values, dtype=np.uint64).reshape(-1):
            self.observe(int(v))

    def observe_digest(self, digest_monty: np.ndarray):
        """Observe an 8-element Poseidon2 digest given in Montgomery form."""
        self.observe_slice(f.from_monty(np.asarray(digest_monty, dtype=np.uint32)))

    def sample(self) -> int:
        """Sample one canonical field element."""
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def sample_ext(self) -> np.ndarray:
        """Sample a quartic-extension challenge, Montgomery (4,) uint32."""
        return ext4.scalar(self.sample(), self.sample(), self.sample(), self.sample())

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    # -- proof-of-work grinding (FRI PoW, 16 bits in the core config) -------

    def grind(self, bits: int) -> int:
        """Find a witness w such that observing w then sampling ``bits`` gives 0.

        Host-side vectorized search: permute a batch of candidate states at
        once (the absorb of a single felt touches only lane 0 of the rate).
        """
        if bits == 0:
            return 0
        batch = 1 << max(10, bits - 2)
        start = 0
        while True:
            cand = self._grind_batch(start, batch, bits)
            if cand is not None:
                return cand
            start += batch

    def _grind_batch(self, start: int, batch: int, bits: int) -> int | None:
        sim = self.clone()
        sim.output_buffer.clear()
        base_inputs = list(sim.input_buffer)
        assert len(base_inputs) < RATE  # witness absorb never overflows mid-batch
        states = np.broadcast_to(sim.state, (batch, WIDTH)).copy()
        for i, v in enumerate(base_inputs):
            states[:, i] = f.to_monty_int(v)
        witnesses = (np.arange(start, start + batch, dtype=np.uint64)) % f.P
        states[:, len(base_inputs)] = f.to_monty(witnesses.astype(np.uint32))
        out = p2.permute(states)
        # sample() pops the *last* element of the refreshed output buffer
        sampled = f.from_monty(out[:, RATE - 1])
        hits = np.nonzero((sampled & ((1 << bits) - 1)) == 0)[0]
        if hits.size == 0:
            return None
        return int(witnesses[hits[0]])

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0
