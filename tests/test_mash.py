"""Mash pipeline: murmur bit-exactness, sketch equality, merge-count
equivalence, full-matrix + CLI end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from dipper_tpu.sketch.minhash import (
    murmur3_low64_tail, sketch_sequences, sketch_batch_device,
)
from dipper_tpu.distance.mash import (
    rank_compress, pad_ranks, mash_distance_matrix_device,
    _merged_inter_count,
)
from dipper_tpu.io.encode import encode_2bit_codes

import oracle
from datagen import simulate_unaligned, write_fasta


def test_murmur_bit_exact():
    rng = np.random.default_rng(0)
    for klen in range(2, 16):
        keys = [bytes(rng.integers(65, 90, klen).astype(np.uint8)) for _ in range(64)]
        want = np.array([oracle.murmur3_x64_128_low64(kb) for kb in keys],
                        dtype=np.uint64)
        k1 = np.zeros(64, dtype=np.uint64)
        k2 = np.zeros(64, dtype=np.uint64)
        for i, kb in enumerate(keys):
            k1[i] = int.from_bytes(kb[:8].ljust(8, b"\0"), "little")
            k2[i] = int.from_bytes(kb[8:].ljust(8, b"\0"), "little")
        got = np.asarray(murmur3_low64_tail(jnp.asarray(k1), jnp.asarray(k2), klen))
        assert (got == want).all(), klen


@pytest.mark.parametrize("k", [4, 11, 15])
def test_sketch_matches_oracle(k):
    rng = np.random.default_rng(k)
    seqs = []
    for L in [k, k + 1, 37, 200, 1500]:
        seqs.append(bytes(rng.choice(list(b"ACGT"), L).astype(np.uint8)))
    # duplicate-rich sequence (repeats -> duplicate hashes in bottom-k)
    seqs.append(bytes(b"ACGT" * 100))
    sk = sketch_sequences(seqs, k, sketch_size=100)
    for i, s in enumerate(seqs):
        want = oracle.mash_sketch(encode_2bit_codes(s), k, 100)
        assert (sk[i] == want).all(), (i, len(s))


def _walk_inter(a, b, sketch_size):
    """Count `inter` with the oracle's literal merge-walk."""
    uni = 0
    inter = 0
    bpos = 0
    ai = 0
    while uni < sketch_size:
        aval = int(a[ai])
        while uni < sketch_size and bpos < sketch_size:
            bval = int(b[bpos])
            if bval > aval:
                break
            if bval < aval:
                uni += 1
            else:
                inter += 1
            bpos += 1
        if uni >= sketch_size:
            break
        uni += 1
        ai += 1
    return inter


@pytest.mark.parametrize("seed", range(6))
def test_merge_count_equivalence(seed):
    """Vectorized merged-count == serial walk on adversarial multisets."""
    rng = np.random.default_rng(seed)
    S = 100
    # small value universe forces many duplicates and cross-duplicates
    a = np.sort(rng.integers(0, 60, S))
    b = np.sort(rng.integers(0, 60, S))
    # sentinel-heavy variants
    if seed % 2:
        a[-30:] = 59
        b[-45:] = 59
    want = _walk_inter(a, b, S)
    M = 128
    PAD = (2**31 - 2) // 2
    a_pad = np.concatenate([a, np.full(M - S, PAD)]).astype(np.int32)
    b_pad = np.concatenate([b, np.full(M - S, PAD)]).astype(np.int32)
    got = int(_merged_inter_count(
        jnp.asarray(a_pad * 2 + 1)[None, :], jnp.asarray(b_pad * 2)[None, :], S
    )[0])
    assert got == want


def test_mash_matrix_matches_oracle():
    rng = np.random.default_rng(5)
    names, seqs = simulate_unaligned(10, 400, rng)
    k, S = 12, 64
    sk = sketch_sequences(seqs, k, sketch_size=S)
    got = mash_distance_matrix_device(sk, k, S, dtype="float64")
    N = len(seqs)
    want = np.zeros((N, N))
    for i in range(N):
        for j in range(i):
            want[i, j] = want[j, i] = oracle.mash_distance(sk[j], sk[i], k, S)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)


def test_cli_mash_nj(tmp_path):
    from dipper_tpu.cli import main
    from dipper_tpu.utils.treecmp import rf_distance
    from oracle import neighbor_joining, nj_newick

    rng = np.random.default_rng(8)
    names, seqs = simulate_unaligned(15, 2000, rng)
    inp = tmp_path / "in.fa"
    outp = tmp_path / "out.nwk"
    write_fasta(str(inp), names, seqs)
    rc = main(["-i", "r", "-I", str(inp), "-O", str(outp), "-k", "12",
               "-s", "200", "--precision", "f64", "--seed", "-1"])
    assert rc == 0

    sk = sketch_sequences(seqs, 12, 200)
    N = len(seqs)
    D = np.zeros((N, N))
    for i in range(N):
        for j in range(i):
            D[i, j] = D[j, i] = oracle.mash_distance(sk[j], sk[i], 12, 200)
    children, root = neighbor_joining(D)
    want = nj_newick(children, root, names)
    rf, _ = rf_distance(outp.read_text(), want)
    assert rf == 0


def test_rank_compress_host_equivalent():
    """Host np.unique ranks vs device hierarchical-sort ranks: values
    differ (consecutive vs first-iota-of-run) but order and equality —
    the only properties mash_rows_vs_bank consumes — must match, and
    the resulting distances must be bitwise identical."""
    from dipper_tpu.distance.mash import rank_compress_host, mash_rows_vs_bank

    rng = np.random.default_rng(7)
    # duplicate- and sentinel-heavy bank
    vals = rng.integers(0, 50, (16, 64)).astype(np.uint64) * np.uint64(2**40)
    vals.sort(axis=1)
    dev = np.asarray(rank_compress(jnp.asarray(vals)))
    host = rank_compress_host(vals)
    fd, fh = dev.reshape(-1), host.reshape(-1)
    order = np.argsort(fd, kind="stable")
    # same equal-runs and same ordering between the two rank assignments
    assert (np.diff(fd[order]) > 0).sum() == (np.diff(fh[order]) > 0).sum()
    assert ((np.diff(fd[order]) == 0) == (np.diff(fh[order]) == 0)).all()
    d_dev = np.asarray(mash_rows_vs_bank(
        pad_ranks(jnp.asarray(dev)), pad_ranks(jnp.asarray(dev))[3],
        k=15, sketch_size=64, dtype_name="float64"))
    d_host = np.asarray(mash_rows_vs_bank(
        pad_ranks(jnp.asarray(host)), pad_ranks(jnp.asarray(host))[3],
        k=15, sketch_size=64, dtype_name="float64"))
    np.testing.assert_array_equal(d_dev, d_host)


def test_dist_table_matches_reference_formula():
    """The [S+1] host lookup table must equal the reference's per-pair
    formula d = min(1, |ln(2j/(1+j))|/k), j = max(inter,1)/S
    (src/mash.cu:453-454) evaluated in plain python floats — the table
    exists so every dispatch shape/backend yields these exact values."""
    import math

    from dipper_tpu.distance.mash import _dist_table

    for k, S in ((15, 1000), (12, 100), (9, 17)):
        tab = _dist_table(k, S, "float64")
        assert tab.shape == (S + 1,)
        for inter in (0, 1, 2, S // 3, S - 1, S):
            j = max(inter, 1) / S
            want = min(1.0, abs(math.log(2.0 * j / (1.0 + j)) / k))
            assert tab[inter] == want, (k, S, inter)
        # monotone non-increasing in inter
        assert (tab[1:] <= tab[:-1] + 1e-18).all()
