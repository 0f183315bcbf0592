"""Is the BUILD section deterministic under lax.map at the cmax=16
shapes? (The distance section is known-bad; if the build is clean, the
fix is distances-only.) Also tests the block-diagonal Pallas distance
workaround for determinism + agreement with a CPU oracle count."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import dipper_tpu.dc.pipeline as pl
from dipper_tpu.distance.mash import _inter_to_dist


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/dipper_jax_cache")
    captured = {}
    orig = pl._bucket_build_batch

    def capture(payload, wit, mem, cd, cid, lens, sz, **kw):
        if kw.get("cmax") == 16 and "wit" not in captured:
            captured.update(payload=payload, wit=np.asarray(wit),
                            mem=np.asarray(mem), cd=np.asarray(cd),
                            cid=np.asarray(cid), lens=np.asarray(lens),
                            sz=np.asarray(sz), kw=dict(kw))
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
    cmax, c_in, ss = kw["cmax"], kw["c_in"], kw["sketch_size"]
    ranks = captured["payload"]
    wit, mem = captured["wit"], captured["mem"]
    C = wit.shape[0]
    W = wit.shape[1]
    print(f"captured C={C} W={W} cmax={cmax} c_in={c_in}", flush=True)

    # ---- oracle counts on host for a sample (ground truth)
    rh = np.asarray(jax.device_get(ranks))
    def host_inter(wi, mi):
        a = rh[wi]  # [W, M]
        b = rh[mi]  # [cmax, M]
        out = np.zeros((len(mi), len(wi)), np.int32)
        for x in range(len(mi)):
            bs = b[x][:ss]
            for y in range(len(wi)):
                out[x, y] = np.intersect1d(a[y][:ss], bs).size
        return out

    # ---- block-diagonal Pallas distances (the candidate fix)
    G = 8

    @functools.partial(jax.jit, static_argnames=("g",))
    def v_pallas_bd(ranks_a, w_all, m_all, *, g):
        from dipper_tpu.distance.mash_pallas import mash_inter_pallas

        ng = w_all.shape[0] // g
        Wl, cm = w_all.shape[1], m_all.shape[1]

        def one(args):
            w, m = args                       # [g, W], [g, cmax]
            bank = ranks_a[w.reshape(-1)]     # [g*W, M]
            q = ranks_a[m.reshape(-1)]        # [g*cmax, M]
            full = mash_inter_pallas(bank * 2 + 1, q * 2,
                                     sketch_size=ss)  # [g*cmax, g*W]
            blk = full.reshape(g, cm, g, Wl)
            return jax.vmap(lambda i: blk[i, :, i, :])(
                jnp.arange(g))                # [g, cmax, W]

        parts = tuple(x.reshape((ng, g) + x.shape[1:])
                      for x in (w_all, m_all))
        r = jax.lax.map(one, parts)
        return r.reshape((w_all.shape[0],) + r.shape[2:])

    Cg = (C // G) * G
    try:
        a = np.asarray(jax.device_get(v_pallas_bd(
            ranks, jnp.asarray(wit[:Cg].copy()),
            jnp.asarray(mem[:Cg].copy()), g=G)))
        b = np.asarray(jax.device_get(v_pallas_bd(
            ranks, jnp.asarray(wit[:Cg].copy()),
            jnp.asarray(mem[:Cg].copy()), g=G)))
        det = np.array_equal(a, b)
        oh = host_inter(wit[3], mem[3])
        ok = np.array_equal(a[3], oh)
        print(f"[iso3] pallas-blockdiag: "
              f"{'identical' if det else 'MISMATCH'}, "
              f"oracle-agree={ok}", flush=True)
        if det:
            Dq_good = _inter_to_dist(jnp.asarray(a), kw["kmer"], ss,
                                     jnp.float32)
            Dq_good = np.asarray(jax.device_get(Dq_good))
    except Exception as e:
        print(f"[iso3] pallas-blockdiag FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return

    # ---- build under lax.map on FIXED distances
    @functools.partial(jax.jit, static_argnames=("ci",))
    def build_map(Dqa, cd, cid, lens, sz, *, ci):
        nch = Dqa.shape[0] // ci

        def one(args):
            d, a2, b2, c2, e2 = args
            return jax.vmap(
                lambda p, q, r, s, t: pl._cluster_build(
                    p, q, r, s, t, cmax=cmax,
                    dtype_name="float32"))(d, a2, b2, c2, e2)

        parts = tuple(x.reshape((nch, ci) + x.shape[1:])
                      for x in (Dqa, cd, cid, lens, sz))
        le, lb, ll = jax.lax.map(one, parts)
        return (le.reshape((Dqa.shape[0],) + le.shape[2:]),
                lb.reshape((Dqa.shape[0],) + lb.shape[2:]),
                ll.reshape((Dqa.shape[0],) + ll.shape[2:]))

    ci = 78
    Cb = (Cg // ci) * ci
    args0 = (captured["cd"][:Cb], captured["cid"][:Cb],
             captured["lens"][:Cb], captured["sz"][:Cb])
    base = None
    for trial in range(3):
        r = jax.device_get(build_map(
            jnp.asarray(Dq_good[:Cb].copy()),
            *(jnp.asarray(x.copy()) for x in args0), ci=ci))
        if base is None:
            base = r
            continue
        same = all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(base, r))
        print(f"[iso3] build-fixed-Dq trial {trial}: "
              f"{'identical' if same else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
