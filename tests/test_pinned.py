"""Pinned-verification-key digest KATs (PARITY.md #1).

Freezes the halo2 `format!("{:?}", vk.pinned())` text renderer output for the
shared k=6 toy circuit: any change to the renderer, the CS structures, or the
keygen commitments shows up as a digest change here. The MNIST-Tiny pinned
digest is additionally frozen in PARITY.md (generated on the real backend —
k=14 keygen is too heavy for the default suite).
"""

import hashlib

from zerog_tpu.plonk.pinned import pinned_text, transcript_repr_from_pinned
from zerog_tpu.poly.domain import get_domain

# frozen r5 values for the k=6 NibbleMulCircuit under seed b"k6-shared"
K6_TEXT_BLAKE2B128 = "53e57471f82feb156f29d898e7df57df"
K6_TRANSCRIPT_REPR = (
    0xAF207B0DC257E1B07453766D68B8523128750F0677B48A4AB64E94ABD0A9CCB
)


def test_pinned_text_grammar(k6_setup):
    _, pk = k6_setup
    txt = pinned_text(pk.vk, get_domain(pk.vk.k, pk.vk.cs.degree()))
    # single line, Rust non-alternate Debug
    assert "\n" not in txt
    assert txt.startswith(
        'PinnedVerificationKey { base_modulus: "0x30644e72e131a029b85045b681'
        '81585d97816a916871ca8d3c208c16d87cfd47", scalar_modulus: ')
    assert "minimum_degree: None }" in txt
    assert "permutation: VerifyingKey { commitments: [" in txt
    # query indices must be the position in the query lists
    assert "Advice { query_index: 0, " in txt


def test_pinned_digest_frozen(k6_setup):
    _, pk = k6_setup
    domain = get_domain(pk.vk.k, pk.vk.cs.degree())
    txt = pinned_text(pk.vk, domain)
    assert hashlib.blake2b(txt.encode(),
                           digest_size=16).hexdigest() == K6_TEXT_BLAKE2B128
    assert pk.vk.transcript_repr == K6_TRANSCRIPT_REPR
    assert transcript_repr_from_pinned(pk.vk, domain) == pk.vk.transcript_repr
