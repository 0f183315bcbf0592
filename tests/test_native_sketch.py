"""Native host sketcher (native/sketchnat.cpp) vs the XLA sketch
pipeline: bit-identical banks on ragged inputs with the full alphabet
contract (U->T, lowercase/N/gap -> A), short-sequence edge cases, and
repeated k-mers (duplicates kept in the bottom-s)."""

import numpy as np
import pytest

from dipper_tpu.sketch.native import available, sketch_sequences_native
from dipper_tpu.sketch.minhash import sketch_sequences

pytestmark = pytest.mark.skipif(
    not available(), reason="native sketcher not built")


def test_native_matches_xla_ragged():
    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGTUNacgt-", dtype=np.uint8)
    seqs = [bytes(rng.choice(alpha, rng.integers(5, 2000)).astype(np.uint8))
            for _ in range(120)]
    seqs += [b"ACGT" * 400] * 2   # duplicate rows, repeated k-mers
    seqs += [b"A" * 14, b"ACGTACGTACGTACG"]  # len < k, len == k
    for k, ss in [(15, 200), (12, 64)]:
        nat = sketch_sequences_native(seqs, k, ss)
        ref = np.asarray(sketch_sequences(seqs, k, ss))
        assert np.array_equal(nat, ref), (k, ss)


def test_native_matches_oracle():
    from oracle import mash_sketch

    from dipper_tpu.io.encode import encode_2bit_codes

    rng = np.random.default_rng(7)
    seqs = [bytes(rng.choice(list(b"ACGT"), 300).astype(np.uint8))
            for _ in range(8)]
    nat = sketch_sequences_native(seqs, 11, 50)
    for i, s in enumerate(seqs):
        want = mash_sketch(encode_2bit_codes(s), 11, 50)
        assert np.array_equal(nat[i], np.asarray(want, dtype=np.uint64))


def test_bank_uses_native_and_matches():
    from dipper_tpu.sketch.bank import get_sketch_bank
    from dipper_tpu.utils.params import Param

    rng = np.random.default_rng(11)
    seqs = [bytes(rng.choice(list(b"ACGT"), rng.integers(100, 400))
                  .astype(np.uint8)) for _ in range(40)]
    p = Param(kmer_size=13, sketch_size=80)
    bank = get_sketch_bank(seqs, p)
    ref = np.asarray(sketch_sequences(seqs, 13, 80))
    assert np.array_equal(np.asarray(bank), ref)
