"""Isolate the cmax=16 bucket nondeterminism: distances vs build.

Rebuilds the real phase-1/2 state for the 100K dataset, forms the
cmax=16 bucket inputs exactly as build_dc_tree does, then compares
repeated runs of (a) the distance section alone, (b) the build alone
on FIXED distances, (c) variants (no lax.map, different c_in).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import dipper_tpu.dc.pipeline as pl
from dipper_tpu.distance.mash import _inter_to_dist, mash_pairwise_inter


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/dipper_jax_cache")
    # capture the cmax=16 bucket's inputs by intercepting the call
    captured = {}
    orig = pl._bucket_build_batch

    def capture(payload, wit, mem, cd, cid, lens, sz, **kw):
        if kw.get("cmax") == 16 and "wit" not in captured:
            captured.update(payload=payload, wit=np.asarray(wit),
                            mem=np.asarray(mem), cd=np.asarray(cd),
                            cid=np.asarray(cid), lens=np.asarray(lens),
                            sz=np.asarray(sz), kw=dict(kw))
            raise SystemExit(0)  # stop the pipeline early
        return orig(payload, wit, mem, cd, cid, lens, sz, **kw)

    pl._bucket_build_batch = capture

    from dipper_tpu.io.fasta import read_fasta
    from dipper_tpu.utils.params import Param

    names, seqs = read_fasta("/tmp/dipper_scale/ds_n100000_L10000_s1.fa")
    n = len(names)
    params = Param(in_format="r", kmer_size=15, sketch_size=1000,
                   dtype="float32", backbone_size=n // 20,
                   batch_size=n // 20)
    try:
        pl.build_dc_tree(seqs, names, params)
    except SystemExit:
        pass
    assert "wit" in captured, "cmax=16 bucket not reached"
    kw = captured["kw"]
    cmax, c_in = kw["cmax"], kw["c_in"]
    ranks = captured["payload"]
    print(f"captured: C={captured['wit'].shape[0]} cmax={cmax} "
          f"c_in={c_in} W={captured['wit'].shape[1]}", flush=True)

    ss = kw["sketch_size"]

    @functools.partial(jax.jit, static_argnames=("c_in",))
    def dist_map(ranks, wit, mem, *, c_in):
        nch = wit.shape[0] // c_in

        def one(args):
            w, m = args
            inter = jax.vmap(
                lambda wi, mi: mash_pairwise_inter(
                    ranks[wi], ranks[mi], sketch_size=ss,
                    impl="vmap"))(w, m)
            return inter

        parts = tuple(x.reshape((nch, c_in) + x.shape[1:])
                      for x in (wit, mem))
        r = jax.lax.map(one, parts)
        return r.reshape((wit.shape[0],) + r.shape[2:])

    @jax.jit
    def dist_flat(ranks, wit, mem):
        return jax.vmap(
            lambda wi, mi: mash_pairwise_inter(
                ranks[wi], ranks[mi], sketch_size=ss,
                impl="vmap"))(wit, mem)

    wit, mem = captured["wit"], captured["mem"]
    for tag, fn in (("dist lax.map", lambda: dist_map(
            ranks, jnp.asarray(wit.copy()), jnp.asarray(mem.copy()),
            c_in=c_in)),
            ("dist flat-vmap", lambda: dist_flat(
                ranks, jnp.asarray(wit.copy()), jnp.asarray(mem.copy())))):
        a = np.asarray(jax.device_get(fn()))
        b = np.asarray(jax.device_get(fn()))
        same = np.array_equal(a, b)
        print(f"[iso] {tag}: {'identical' if same else 'MISMATCH'} "
              + ("" if same else
                 f"({(a != b).sum()} cells, first cluster "
                 f"{int(np.argwhere(np.any(a != b, axis=(1, 2)))[0])})"),
              flush=True)
        captured[tag] = a

    # build on FIXED distances
    Dq = _inter_to_dist(jnp.asarray(captured["dist lax.map"]),
                        kw["kmer"], ss, jnp.float32)
    Dq = np.asarray(jax.device_get(Dq))

    @functools.partial(jax.jit, static_argnames=("c_in",))
    def build_map(Dqa, cd, cid, lens, sz, *, c_in):
        nch = Dqa.shape[0] // c_in

        def one(args):
            d, a, b, c, e = args
            return jax.vmap(
                lambda p, q, r, s, t: pl._cluster_build(
                    p, q, r, s, t, cmax=cmax,
                    dtype_name="float32"))(d, a, b, c, e)

        parts = tuple(x.reshape((nch, c_in) + x.shape[1:])
                      for x in (Dqa, cd, cid, lens, sz))
        le, lb, ll = jax.lax.map(one, parts)
        return (le.reshape((Dqa.shape[0],) + le.shape[2:]),
                lb.reshape((Dqa.shape[0],) + lb.shape[2:]),
                ll.reshape((Dqa.shape[0],) + ll.shape[2:]))

    for trial in range(3):
        r = jax.device_get(build_map(
            jnp.asarray(Dq.copy()), jnp.asarray(captured["cd"].copy()),
            jnp.asarray(captured["cid"].copy()),
            jnp.asarray(captured["lens"].copy()),
            jnp.asarray(captured["sz"].copy()), c_in=c_in))
        if trial == 0:
            base = r
            continue
        same = all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(base, r))
        print(f"[iso] build-fixed-Dq trial {trial}: "
              f"{'identical' if same else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
