"""Variant hunt for the cmax=16 lax.map nondeterminism (see
dc_det_isolate.py): which lowering of the bucketed distance computation
is run-to-run deterministic at the bad shapes?"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import dipper_tpu.dc.pipeline as pl
from dipper_tpu.distance.mash import mash_pairwise_inter


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/dipper_jax_cache")
    captured = {}
    orig = pl._bucket_build_batch

    def capture(payload, wit, mem, cd, cid, lens, sz, **kw):
        if kw.get("cmax") == 16 and "wit" not in captured:
            captured.update(payload=payload, wit=np.asarray(wit),
                            mem=np.asarray(mem), kw=dict(kw))
            raise SystemExit(0)
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
    kw = captured["kw"]
    ss = kw["sketch_size"]
    wit, mem = captured["wit"], captured["mem"]
    ranks = captured["payload"]
    C = wit.shape[0]
    print(f"captured C={C} W={wit.shape[1]} cmax={mem.shape[1]}",
          flush=True)

    def chunk_inter(w, m):
        return jax.vmap(
            lambda wi, mi: mash_pairwise_inter(
                ranks_[wi], ranks_[mi], sketch_size=ss,
                impl="vmap"))(w, m)

    @functools.partial(jax.jit, static_argnames=("c_in",))
    def v_fori(ranks_a, w_all, m_all, *, c_in):
        nch = w_all.shape[0] // c_in
        W, cm = w_all.shape[1], m_all.shape[1]
        out = jnp.zeros((nch, c_in, cm, W), jnp.int32)

        def body(i, out):
            w = jax.lax.dynamic_slice_in_dim(w_all, i * c_in, c_in)
            m = jax.lax.dynamic_slice_in_dim(m_all, i * c_in, c_in)
            r = jax.vmap(
                lambda wi, mi: mash_pairwise_inter(
                    ranks_a[wi], ranks_a[mi], sketch_size=ss,
                    impl="vmap"))(w, m)
            return jax.lax.dynamic_update_slice(
                out, r[None], (i, 0, 0, 0))

        out = jax.lax.fori_loop(0, nch, body, out)
        return out.reshape(nch * c_in, cm, W)

    @functools.partial(jax.jit, static_argnames=("c_in",))
    def v_map(ranks_a, w_all, m_all, *, c_in):
        nch = w_all.shape[0] // c_in

        def one(args):
            w, m = args
            return jax.vmap(
                lambda wi, mi: mash_pairwise_inter(
                    ranks_a[wi], ranks_a[mi], sketch_size=ss,
                    impl="vmap"))(w, m)

        parts = tuple(x.reshape((nch, c_in) + x.shape[1:])
                      for x in (w_all, m_all))
        r = jax.lax.map(one, parts)
        return r.reshape((w_all.shape[0],) + r.shape[2:])

    @functools.partial(jax.jit, static_argnames=("c_in",))
    def v_ss(ranks_a, w_all, m_all, *, c_in):
        # searchsorted-based intersection count: |A & B| for sorted
        # rank rows = sum_j [A[searchsorted(A, B_j)] == B_j]
        nch = w_all.shape[0] // c_in

        def inter_rows(a, b):  # a [W, M], b [cm, M] -> [cm, W]
            def one_pair(ar, br):
                pos = jnp.searchsorted(ar, br)
                pos = jnp.minimum(pos, ar.shape[0] - 1)
                return jnp.sum((ar[pos] == br).astype(jnp.int32))
            return jax.vmap(lambda br: jax.vmap(
                lambda ar: one_pair(ar, br))(a))(b)

        def one(args):
            w, m = args
            return jax.vmap(
                lambda wi, mi: inter_rows(ranks_a[wi], ranks_a[mi]))(w, m)

        parts = tuple(x.reshape((nch, c_in) + x.shape[1:])
                      for x in (w_all, m_all))
        r = jax.lax.map(one, parts)
        return r.reshape((w_all.shape[0],) + r.shape[2:])

    variants = [("fori c78", v_fori, 78), ("map c64", v_map, 64),
                ("searchsorted c78", v_ss, 78)]
    base = None
    for tag, fn, ci in variants:
        Cpad = (C // ci) * ci  # truncate to a multiple for the probe
        try:
            a = np.asarray(jax.device_get(fn(
                ranks, jnp.asarray(wit[:Cpad].copy()),
                jnp.asarray(mem[:Cpad].copy()), c_in=ci)))
            b = np.asarray(jax.device_get(fn(
                ranks, jnp.asarray(wit[:Cpad].copy()),
                jnp.asarray(mem[:Cpad].copy()), c_in=ci)))
            det = np.array_equal(a, b)
            msg = "identical" if det else f"MISMATCH ({(a != b).sum()})"
            if base is None and det:
                base = (a, Cpad)
            elif base is not None:
                m = min(base[1], Cpad)
                agree = np.array_equal(base[0][:m], a[:m])
                msg += f", agrees-with-base={agree}"
            print(f"[iso2] {tag}: {msg}", flush=True)
        except Exception as e:
            print(f"[iso2] {tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
