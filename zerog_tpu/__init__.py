"""zerog_tpu — a TPU-native Halo2-style (PLONKish + KZG/BN254) proving framework
for BTHOWeN weightless-neural-network proof-of-inference.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Rust
reference `zkp-gravity/0g-halo2` (`zero_g`): see SURVEY.md at the repo root for
the component map. The compute hot paths (MSM, NTT, quotient evaluation) run
on TPU; sequential bookkeeping (transcripts, layout, sorting) stays on host.
"""

__version__ = "0.1.0"
