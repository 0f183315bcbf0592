"""Phase-3 nondeterminism probe: run every bucket build TWICE on the
real inputs (second call with clusters reversed to defeat the tunnel's
identical-buffer dispatch dedup) and compare per-cluster outputs.

Context: two identical warm 100K DC runs produced identical phase-2
assignments but different phase-3 edge arrays (branch lengths shifted
~0.5%, occasionally topology). This pinpoints which bucket program
varies.

Usage: python scripts/dc_det_probe.py [FASTA] (defaults to the 100K
dataset)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

import dipper_tpu.dc.pipeline as pl


def main():
    fa = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/dipper_scale/ds_n100000_L10000_s1.fa"
    jax.config.update("jax_compilation_cache_dir", "/tmp/dipper_jax_cache")

    orig_bucket = pl._bucket_build_batch
    orig_stream = pl._cluster_build_stream_mash

    def _cmp(tag, r1, r2, kw):
        same = all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(r1, r2))
        if not same:
            bad = [int(c) for c in range(min(r1[0].shape[0],
                                             r2[0].shape[0]))
                   if not all(np.array_equal(np.asarray(a)[c],
                                             np.asarray(b)[c])
                              for a, b in zip(r1, r2))][:6]
            print(f"[det] bucket cmax={kw.get('cmax')} {tag}: MISMATCH "
                  f"clusters {bad}", flush=True)
        else:
            print(f"[det] bucket cmax={kw.get('cmax')} {tag}: identical",
                  flush=True)
        return same

    def bucket_twice(payload, wit, mem, cd, cid, lens, sz, **kw):
        args = (wit, mem, cd, cid, lens, sz)
        r1 = jax.device_get(orig_bucket(payload, *args, **kw))
        # A: temporal — same order, fresh host copies (new buffers so
        # the tunnel cannot dedup the dispatch)
        argsA = tuple(np.asarray(x).copy() for x in args)
        rA = jax.device_get(orig_bucket(payload, *argsA, **kw))
        _cmp("rerun", r1, rA, kw)
        # B: lane position — duplicated clusters in ONE dispatch;
        # halves must match unless lanes contaminate each other
        argsB = tuple(np.concatenate([np.asarray(x), np.asarray(x)])
                      for x in args)
        rB = jax.device_get(orig_bucket(payload, *argsB, **kw))
        C = np.asarray(args[0]).shape[0]
        _cmp("lane-dup lo-vs-hi",
             tuple(np.asarray(x)[:C] for x in rB),
             tuple(np.asarray(x)[C:] for x in rB), kw)
        _cmp("lane-dup vs base", r1,
             tuple(np.asarray(x)[:C] for x in rB), kw)
        return r1

    def stream_twice(ranks, wit_ids, mem_ids, *a, **kw):
        r1 = jax.device_get(orig_stream(ranks, wit_ids, mem_ids, *a, **kw))
        r2 = jax.device_get(orig_stream(ranks, wit_ids, mem_ids, *a, **kw))
        same = all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(r1, r2))
        print(f"[det] stream cmax={kw.get('cmax')}: "
              f"{'identical' if same else 'MISMATCH'}", flush=True)
        return r1

    pl._bucket_build_batch = bucket_twice
    pl._cluster_build_stream_mash = stream_twice

    from dipper_tpu.io.fasta import read_fasta
    from dipper_tpu.utils.params import Param

    names, seqs = read_fasta(fa)
    n = len(names)
    params = Param(in_format="r", kmer_size=15, sketch_size=1000,
                   dtype="float32", backbone_size=n // 20,
                   batch_size=n // 20)
    nwk = pl.build_dc_tree(seqs, names, params)
    print("[det] tree built,", len(nwk), "bytes")


if __name__ == "__main__":
    main()
