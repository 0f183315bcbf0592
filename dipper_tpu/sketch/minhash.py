"""MinHash (Mash) sketching on TPU.

Behavioral spec (src/mash.cu:239-369):
- every k-mer window j in [0, len-k] of the 2-bit-encoded sequence,
- canonical form = lexicographically smaller of the forward and
  reverse-complement CHARACTER strings (:311-321),
- hash = low 64 bits of MurmurHash3_x64_128(canonical chars, k,
  seed=42) (:320-323),
- sketch = the 1000 smallest hashes as a MULTISET (the block-sort
  keeps duplicates), ascending, padded with 0xFFFF... sentinels.

TPU design: the reference maintains a rolling bottom-1000 via repeated
cub::BlockRadixSort merges because it streams k-mers through shared
memory. On TPU we hold all L hashes of a sequence in HBM/VMEM at once:
hash every window vectorized on the VPU (native-u64 ops; XLA lowers to
32-bit pairs) and take the bottom-k with one sort. The lexicographic
canonicalization never materializes strings: with MSB-first 2-bit
packing, lex order == numeric order, and the reverse complement in
MSB-first form is just the bitwise complement of the forward k-mer in
LSB-first form (see _canonical_kmers).

Only k <= 15 is supported (the CLI range is 2..15), so the murmur key
is < 16 bytes and only the tail path of the hash runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dipper_tpu.io.encode import encode_2bit_codes

SENTINEL = jnp.uint64(0xFFFFFFFFFFFFFFFF)

_C1 = jnp.uint64(0x87C37B91114253D5)
_C2 = jnp.uint64(0x4CF5AD432745937F)
_F1 = jnp.uint64(0xFF51AFD7ED558CCD)
_F2 = jnp.uint64(0xC4CEB9FE1A85EC53)
_ASCII = jnp.array([65, 67, 71, 84], dtype=jnp.uint64)  # 'A' 'C' 'G' 'T'


def _rotl64(x, r: int):
    return (x << jnp.uint64(r)) | (x >> jnp.uint64(64 - r))


def _fmix64(k):
    k = k ^ (k >> jnp.uint64(33))
    k = k * _F1
    k = k ^ (k >> jnp.uint64(33))
    k = k * _F2
    k = k ^ (k >> jnp.uint64(33))
    return k


def murmur3_low64_tail(k1, k2, klen: int):
    """MurmurHash3_x64_128 low 64 bits for keys of length klen in
    [1, 15], given the two little-endian u64 key words (k2 = bytes
    8..14, zero if klen <= 8). Vectorized over arrays."""
    assert 1 <= klen <= 15
    h1 = jnp.uint64(42) * jnp.ones_like(k1)
    h2 = jnp.uint64(42) * jnp.ones_like(k1)
    if klen > 8:
        kk2 = k2 * _C2
        kk2 = _rotl64(kk2, 33)
        kk2 = kk2 * _C1
        h2 = h2 ^ kk2
    kk1 = k1 * _C1
    kk1 = _rotl64(kk1, 31)
    kk1 = kk1 * _C2
    h1 = h1 ^ kk1
    h1 = h1 ^ jnp.uint64(klen)
    h2 = h2 ^ jnp.uint64(klen)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    return h1


def _canonical_kmers(codes, k: int):
    """codes: uint8 [B, L] 2-bit codes. Returns canonical k-mers in
    MSB-first (lexicographic) form, uint64 [B, L-k+1]."""
    B, L = codes.shape
    P = L - k + 1
    c64 = codes.astype(jnp.uint64)
    fwd_lex = jnp.zeros((B, P), jnp.uint64)
    fwd_lsb = jnp.zeros((B, P), jnp.uint64)
    for i in range(k):
        c = c64[:, i : i + P]
        # lex (MSB-first) form: window position i at bit 2*(k-1-i)
        fwd_lex = fwd_lex | (c << jnp.uint64(2 * (k - 1 - i)))
        fwd_lsb = fwd_lsb | (c << jnp.uint64(2 * i))
    mask = jnp.uint64((1 << (2 * k)) - 1)
    # reverse complement in lex form: rev_lex_i = 3 - b_{k-1-i}, i.e.
    # sum_m (3-b_m) << 2m = bitwise complement of the LSB-first form
    rev_lex = (~fwd_lsb) & mask
    return jnp.minimum(fwd_lex, rev_lex)


def _kmer_key_words(canon, k: int):
    """Canonical k-mer (lex form) -> little-endian murmur key words of
    the ASCII character string."""
    z = jnp.zeros_like(canon)
    k1 = z
    k2 = z
    for i in range(k):
        code = ((canon >> jnp.uint64(2 * (k - 1 - i))) & jnp.uint64(3)).astype(jnp.int32)
        b = jnp.take(_ASCII, code)
        if i < 8:
            k1 = k1 | (b << jnp.uint64(8 * i))
        else:
            k2 = k2 | (b << jnp.uint64(8 * (i - 8)))
    return k1, k2


@functools.partial(jax.jit, static_argnames=("k", "sketch_size"))
def sketch_batch_device(codes, lengths, *, k: int, sketch_size: int):
    """codes uint8 [B, L] (padded), lengths int32 [B] ->
    sorted uint64 sketches [B, sketch_size] (sentinel-padded)."""
    B, L = codes.shape
    P = L - k + 1
    canon = _canonical_kmers(codes, k)
    k1, k2 = _kmer_key_words(canon, k)
    h = murmur3_low64_tail(k1, k2, k)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    valid = pos <= (lengths[:, None] - k)
    h = jnp.where(valid, h, SENTINEL)
    h = jnp.sort(h, axis=1)
    return h[:, :sketch_size]


def sketch_sequences(seqs, k: int, sketch_size: int = 1000,
                     batch_size: int = 512) -> np.ndarray:
    """Host driver: encode + sketch a list of byte sequences.
    Returns uint64 [N, sketch_size] (each row ascending)."""
    N = len(seqs)
    out = np.empty((N, sketch_size), dtype=np.uint64)
    order = np.argsort([len(s) for s in seqs], kind="stable")
    # batch similarly-sized sequences together to bound padding waste
    for s in range(0, N, batch_size):
        idx = order[s : s + batch_size]
        Lmax = max(max(len(seqs[i]) for i in idx), k)
        # round L up to limit recompilation across batches
        Lpad = int(2 ** np.ceil(np.log2(max(Lmax, 256))))
        codes = np.zeros((len(idx), Lpad), dtype=np.uint8)
        lens = np.empty(len(idx), dtype=np.int32)
        for r, i in enumerate(idx):
            e = encode_2bit_codes(seqs[i])
            codes[r, : len(e)] = e
            lens[r] = len(e)
        sk = sketch_batch_device(
            jnp.asarray(codes), jnp.asarray(lens), k=k, sketch_size=sketch_size
        )
        out[idx] = np.asarray(jax.device_get(sk))
    return out
