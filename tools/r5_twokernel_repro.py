"""Minimal repro for the df32-engine + tf32-tier TPU worker crash.

Round-5 known issue (NOTES.md): running the df32 sampling engine
(`ops/df_qr_kernel.df_qr_hybrid`, a Pallas CGS2 panel kernel on 2-word
operands) and the tf32 measurement tier (`ops/tf_qr_kernel.tf_qr_hybrid`,
the 3-word twin) in ONE program reproducibly kills the TPU worker with a
"kernel fault" at the headline shape, while either kernel alone — and
f32+tf32, df32+df32 — runs fine.  Suspicion: a Mosaic scratch/VMEM
interaction between the two multiword QR kernels.

This tool escalates through the smallest program shapes that pair the
two kernels, printing a checkpoint before each stage, so the first stage
that takes the worker down identifies the minimal crashing surface:

  s1  df_qr_hybrid alone              (control)
  s2  tf_qr_hybrid alone              (control)
  s3  both kernels, SEPARATE jits, one process
  s4  both kernels in ONE jitted program
  s5  batched (walker-axis) variant of s4 at the headline batch
  s6  s4 at the headline matrix size (256)

Run on TPU:  python tools/r5_twokernel_repro.py [--n 128] [--stop-after s4]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--stop-after", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from dqmc_tpu import compile_cache
    compile_cache.enable()
    from dqmc_tpu.ops import df32, tf32
    from dqmc_tpu.ops.df_qr_kernel import df_qr_hybrid
    from dqmc_tpu.ops.tf_qr_kernel import tf_qr_hybrid

    print(f"backend={jax.default_backend()} n={args.n} "
          f"batch={args.batch}", flush=True)
    rng = np.random.default_rng(0)

    def mk(n, batch=None):
        shape = (n, n) if batch is None else (batch, n, n)
        # graded columns like a fold input: colmax ~1, ladder ~1e3
        a = rng.standard_normal(shape)
        a *= np.logspace(0, -3, n)[None, :] if batch is None else \
            np.logspace(0, -3, n)[None, None, :]
        return a

    def run(tag, fn, *xs):
        if args.stop_after and tag > args.stop_after:
            return
        print(f"[{tag}] start", flush=True)
        t0 = time.time()
        out = fn(*xs)
        vals = [float(np.asarray(jnp.sum(c))) for c in out]
        print(f"[{tag}] OK sum={vals[0]:.3e} ({time.time()-t0:.0f}s)",
              flush=True)

    A64 = mk(args.n)
    Adf = df32.from_f64(jnp.asarray(A64))
    Atf = tf32.from_f64(jnp.asarray(A64))

    run("s1", jax.jit(lambda a: df_qr_hybrid(a)[0]), Adf)
    run("s2", jax.jit(lambda a: tf_qr_hybrid(a)[0]), Atf)

    f_df = jax.jit(lambda a: df_qr_hybrid(a)[0].hi)
    f_tf = jax.jit(lambda a: tf_qr_hybrid(a)[0].hi)
    run("s3", lambda a, b: (f_df(a) + 0 * f_tf(b)[:1, :1].sum(),), Adf, Atf)

    @jax.jit
    def both(a, b):
        qd, _ = df_qr_hybrid(a)
        qt, _ = tf_qr_hybrid(b)
        return (qd.hi.sum() + qt.hi.sum(),)

    run("s4", both, Adf, Atf)

    B64 = mk(args.n, args.batch)
    Bdf = df32.from_f64(jnp.asarray(B64))
    Btf = tf32.from_f64(jnp.asarray(B64))
    run("s5", both, Bdf, Btf)

    n2 = 256
    C64 = mk(n2)
    run("s6", both, df32.from_f64(jnp.asarray(C64)),
        tf32.from_f64(jnp.asarray(C64)))
    print("all stages survived — the crash needs the full program "
          "(engine sweep + tier scan), not the bare kernel pair",
          flush=True)


if __name__ == "__main__":
    main()
