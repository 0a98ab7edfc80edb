"""Error attribution for the df32 parity chain (the 1e-10 push).

Measures, on the fixed-field beta=8 chain (the tests/test_df_linalg.py
workload, scaled), where the ~1e-8 df32 chain error comes from and what
buys the next two digits:

  1. chain error vs f64-stabilized oracle at fold granularities
     n_fold = n_stab, 2, 1 (single-slice df folds cut the equilibrated
     fold-input condition number, which multiplies eps_df per fold);
  2. the same chains re-solved EXACTLY in f64 (isolates fold error from
     the df solve tier);
  3. the per-fold condition numbers of the equilibrated QR inputs.

Run on TPU (df graphs are bit-stable under jit there) or CPU (forced
eager — XLA:CPU backend codegen corrupts fused df chains, see
ops/df_linalg.py docstring).

Usage: python tools/df_parity_probe.py [--n 64] [--nt 80] [--beta 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    # the axon plugin overrides the JAX_PLATFORMS env var (see
    # tests/conftest.py) — honor it programmatically so CPU arms of the
    # path-discrimination probes do not land on the TPU tunnel
    if __import__("os").environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--nt", type=int, default=80)
    p.add_argument("--beta", type=float, default=8.0)
    p.add_argument("--n-stab", type=int, default=5)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--nm", choices=("df32", "tf32"), default="df32",
                   help="multiword tier to probe (tf32 = the <1e-10 "
                        "parity++ tier; its error vs the f64 chain is "
                        "dominated by the F64 CHAIN'S OWN ~6.7e-10 error "
                        "at beta=8 — see tests/test_tf_linalg.py)")
    p.add_argument("--granularities", default="",
                   help="comma list of n_fold values to probe (default: "
                        "n_stab,2,1).  The stretch pin (ns=1024) runs "
                        "'--granularities 5' — the production fold stride "
                        "only; finer strides multiply the fold count "
                        "without informing the production-accuracy claim")
    p.add_argument("--no-cond", action="store_true",
                   help="skip per-fold condition tracking (each cond is "
                        "one host SVD — ~3 s at ns=1024 on this 1-core "
                        "host, x O(nt/n_fold) folds)")
    args = p.parse_args()

    import functools

    import jax
    jax.config.update("jax_enable_x64", True)
    from dqmc_tpu import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp
    from dqmc_tpu.ops import df32, df_linalg, linalg
    if args.nm == "tf32":
        from dqmc_tpu.ops import tf32 as nm
    else:
        nm = df32

    sys.path.insert(0, "tests")
    from test_df_linalg import _b_chain, _stab64_suffix

    rng = np.random.default_rng(args.seed)
    Bs = _b_chain(rng, args.n, args.nt, args.beta)
    n = args.n

    # The f64 oracle (stabilized LDR chain + exact solves) runs on the
    # HOST CPU backend: at stretch scale (ns=1024) LAPACK f64 QR is
    # ~0.3 s/fold while the TPU's emulated f64 would be minutes/fold.
    # The df/tf chains under probe stay on the default (TPU) backend.
    cpu0 = jax.devices("cpu")[0]

    # On TPU, jit the per-fold ops (df graphs are bit-stable under jit
    # there; one compile each, then ~ms dispatches).  On CPU stay eager
    # (the LLVM contraction bug corrupts jitted df chains).
    on_cpu = jax.default_backend() == "cpu"
    jj = (lambda f: f) if on_cpu else jax.jit
    fold_first = jj(functools.partial(df_linalg.to_ldr, nm=nm))
    fold_next = jj(functools.partial(df_linalg.mat_mul_ldr, nm=nm))

    # f64 stabilized oracle (host CPU — see cpu0 note above)
    t_or = time.time()
    with jax.default_device(cpu0):
        F64 = _stab64_suffix(Bs, args.n_stab)
        G64, _ = linalg.inv_one_plus_ldr_dag(
            linalg.identity_ldr(n, jnp.float64), F64)
        G64 = np.asarray(G64)
    print(f"f64 oracle built on cpu in {time.time()-t_or:.0f}s")

    def df_from64(x):
        return nm.from_f64(jnp.asarray(x, jnp.float64))

    def to64(x):
        return np.asarray(nm.to_f64(x))

    def df_chain(n_fold, track_cond=False):
        """Transpose-suffix df chain folding every n_fold slices."""
        F2t = None
        conds = []
        nt = len(Bs)
        for i_blk in range(-(-nt // n_fold) - 1, -1, -1):
            blk = Bs[i_blk * n_fold:(i_blk + 1) * n_fold]
            Bbar = np.eye(n)
            for B in blk:
                Bbar = B @ Bbar
            T = df_from64(Bbar.T)
            if F2t is None:
                F2t = fold_first(T)
            else:
                if track_cond:
                    # the equilibrated QR input of this fold
                    BL = nm.matmul(T, F2t.L)
                    Bd = nm.mul(BL, df_linalg._bcast_row(
                        F2t.d, BL.hi.shape))
                    A = to64(Bd)
                    s = np.abs(A).max(axis=0)
                    conds.append(np.linalg.cond(A / s[None, :]))
                F2t = fold_next(T, F2t)
        return F2t, conds

    inv_dag = jj(functools.partial(df_linalg.inv_one_plus_ldr_dag, nm=nm))

    def solve_df(F2t):
        F1 = fold_first(nm.df(jnp.eye(n, dtype=jnp.float32)))
        G, _ = inv_dag(F1, F2t)
        return to64(G)

    def solve_f64_exact(F2t):
        """Re-solve the df factors exactly in f64 (fold-error isolation).

        The d-ladder is exponent-split (LDRdf: mantissa multiword +
        int32 power-of-two channel, ops/df_linalg.py:46-56) — the f64
        reconstruction must fold the exponent back in, else the ladder
        is only the [1,2) mantissa and the 'exact' solve is garbage.
        """
        d_full = to64(F2t.d) * np.exp2(np.asarray(F2t.e, np.float64))
        with jax.default_device(cpu0):
            Fx = linalg.LDR(jnp.asarray(to64(F2t.L)),
                            jnp.asarray(d_full),
                            jnp.asarray(to64(F2t.R)))
            G, _ = linalg.inv_one_plus_ldr_dag(
                linalg.identity_ldr(n, jnp.float64), Fx)
            return np.asarray(G)

    if args.granularities:
        grans = tuple(int(g) for g in args.granularities.split(","))
    else:
        grans = (args.n_stab, 2, 1)
    print(f"workload: n={n} nt={args.nt} beta={args.beta} "
          f"n_stab={args.n_stab} nm={args.nm}  (oracle: f64 stabilized "
          f"chain — itself only ~6.7e-10-accurate at beta=8!)")
    for n_fold in grans:
        t0 = time.time()
        F2t, conds = df_chain(n_fold, track_cond=not args.no_cond)
        e_df = np.abs(solve_df(F2t) - G64).max()
        e_x = np.abs(solve_f64_exact(F2t) - G64).max()
        cond_s = ("cond: skipped" if args.no_cond or not conds else
                  f"fold-input cond: med={np.median(conds):.2e} "
                  f"max={np.max(conds):.2e}")
        print(f"n_fold={n_fold:2d}: chain+df-solve err={e_df:.3e}  "
              f"fold-only (exact f64 solve) err={e_x:.3e}  "
              f"{cond_s}  [{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
