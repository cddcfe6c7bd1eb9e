"""Generic STARK machine: configs, challenger, PCS, AIR builder, prover, verifier."""
