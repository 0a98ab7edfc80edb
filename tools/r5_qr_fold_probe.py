"""Single-fold QR accuracy probe (round-5 stretch-accuracy root cause).

The chain pins localize the ns=1024 df32 degradation to the FOLD chain
(fold-only error == chain error).  This tool isolates ONE fold: it runs
the realistic beta-chain to fold #K, reconstructs that fold's actual
equilibrated QR input Mn exactly as ops/df_linalg.mat_mul_ldr builds it
(BL = B_blk^T @ L, colmax-equilibrated, scale-presorted), then runs the
multiword QR through each available path and scores it against a CPU
f64 QR of the identical input:

  orth   max |Q^T Q - I|           (basis quality)
  back   max |Q R - Mn|            (backward error; Mn colmax = 1)
  d_rel  max_j |d_j - d64_j|/d64_j (columnwise resolution of the
                                    diagonal ladder — THE quantity the
                                    LDR chain's stability rests on)

Paths: 'xla' (ops/df_qr.df_qr — the n>512 fallback) and, on TPU with
n<=512, 'kernel' (ops/df_qr_kernel.df_qr_hybrid).

Usage: python tools/r5_qr_fold_probe.py --n 1024 --beta 16 [--fold 32]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--nt", type=int, default=320)
    p.add_argument("--beta", type=float, default=16.0)
    p.add_argument("--n-stab", type=int, default=5)
    p.add_argument("--fold", type=int, default=-1,
                   help="fold index to probe (default: the deepest, "
                        "n_stack - 1)")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--nm", choices=("df32", "tf32"), default="df32")
    args = p.parse_args()

    import functools

    import jax
    jax.config.update("jax_enable_x64", True)
    from dqmc_tpu import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp
    from dqmc_tpu.ops import df32, df_linalg
    from dqmc_tpu.ops.df_linalg import _bcast_row
    if args.nm == "tf32":
        from dqmc_tpu.ops import tf32 as nm
    else:
        nm = df32

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_df_linalg import _b_chain

    rng = np.random.default_rng(args.seed)
    Bs = _b_chain(rng, args.n, args.nt, args.beta)
    n = args.n
    n_stab = args.n_stab
    n_stack = -(-args.nt // n_stab)
    k_probe = (n_stack - 1) if args.fold < 0 else args.fold

    on_cpu = jax.default_backend() == "cpu"
    jj = (lambda f: f) if on_cpu else jax.jit
    fold_first = jj(functools.partial(df_linalg.to_ldr, nm=nm))
    fold_next = jj(functools.partial(df_linalg.mat_mul_ldr, nm=nm))

    def df_from64(x):
        return nm.from_f64(jnp.asarray(x, jnp.float64))

    def to64(x):
        return np.asarray(nm.to_f64(x))

    # run the dag chain from the deep end to fold k_probe-1
    t0 = time.time()
    F = None
    n_folds = 0
    T_probe = None
    for i_blk in range(n_stack - 1, -1, -1):
        blk = Bs[i_blk * n_stab:(i_blk + 1) * n_stab]
        Bbar = np.eye(n)
        for B in blk:
            Bbar = B @ Bbar
        T = df_from64(Bbar.T)
        if n_folds == k_probe:
            T_probe = T
            break
        F = fold_first(T) if F is None else fold_next(T, F)
        n_folds += 1
    assert T_probe is not None and F is not None, "fold index out of range"
    print(f"chain to fold {k_probe} in {time.time()-t0:.0f}s "
          f"(n={n} beta={args.beta} nm={args.nm} "
          f"backend={jax.default_backend()})", flush=True)

    # --- reconstruct the fold's QR input exactly as mat_mul_ldr does ---
    BL = nm.matmul(T_probe, F.L)
    c = jnp.max(jnp.abs(BL.hi), axis=-2)
    cs = jnp.where(c == 0, jnp.ones_like(c), c)
    m = nm.mul(nm.df(cs), F.d)
    m, e = df_linalg._renorm_d(m, F.e, nm=nm)
    t = e.astype(jnp.float32) + jnp.log2(m.hi)
    perm = jnp.argsort(-t, stable=True)
    inv_c = nm.div(nm.df(jnp.ones_like(cs)), nm.df(cs))
    Mn = nm.mul(BL, _bcast_row(inv_c, BL.hi.shape))
    Mn = nm.cmap(lambda cc: jnp.take_along_axis(
        cc, perm[None, :], axis=-1), Mn)
    M64 = to64(Mn)
    print(f"fold input: cond(equilibrated)={np.linalg.cond(M64):.3e}",
          flush=True)

    # --- f64 oracle of the same input (host LAPACK) ---
    Q64, R64 = np.linalg.qr(M64)
    d64 = np.abs(np.diag(R64))

    def score(tag, qr_fn):
        t1 = time.time()
        Q, R = qr_fn(Mn)
        Qh, Rh = to64(Q), to64(R)
        orth = np.abs(Qh.T @ Qh - np.eye(n)).max()
        back = np.abs(Qh @ Rh - M64).max()
        d = np.abs(np.diag(Rh))
        d_rel = (np.abs(d - d64) / d64).max()
        # where in the ladder the damage sits
        j_bad = int((np.abs(d - d64) / d64).argmax())
        print(f"[{tag}] orth={orth:.3e} back={back:.3e} "
              f"d_rel={d_rel:.3e} (worst at col {j_bad}/{n}, "
              f"d64={d64[j_bad]:.3e})  [{time.time()-t1:.0f}s]",
              flush=True)

    from dqmc_tpu.ops.df_qr import df_qr
    score("xla", jj(functools.partial(df_qr, nm=nm)))
    if not on_cpu and n <= 512:
        if nm is df32:
            from dqmc_tpu.ops.df_qr_kernel import df_qr_hybrid as hyb
        else:
            from dqmc_tpu.ops.tf_qr_kernel import tf_qr_hybrid as hyb
        score("kernel", jj(hyb))


if __name__ == "__main__":
    main()
