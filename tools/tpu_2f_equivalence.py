"""On-TPU chain-equivalence check for the 2-flavor Pallas site kernel.

The CPU test suite pins the scan-vs-kernel equivalence in interpret mode
(tests/test_kernels.py); this tool asserts the same contract on the REAL
chip, where the Mosaic lowering (not the interpreter) executes: one slice
of the repulsive model updated by pallas_site_update_2f must produce the
identical field decisions, acceptance count, and sign as the sequential
rank-1 scan (local_update_core) fed the same random stream, with G
agreeing to f32 accumulation tolerance.

A slice (not a whole sweep) is compared: both paths make the exact same
accept/reject decisions as long as no |R|-u margin falls inside f32
rounding; across a full chain a single boundary flip would cascade.  Runs
three slices from different keys to cover the decision space.

Exits non-zero on mismatch (tpu_checklist step).
"""

import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from dqmc_tpu import compile_cache
    compile_cache.enable()
    from dqmc_tpu.engine.sweep import draw_slice_randoms, local_update_core
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import RepulsiveHubbard
    from dqmc_tpu.ops.kernels import pallas_site_update_2f

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    if dev.platform == "cpu":
        print("WARNING: running on CPU (interpret mode) — this tool is "
              "meant for the real chip", file=sys.stderr)

    lat = square_lattice(8, 8)
    ns = lat.n_sites
    m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.5, beta=4.0, nt=40,
                               dtype=jnp.float32)
    rng = np.random.default_rng(5)

    kernel = jax.jit(lambda k, G, f: pallas_site_update_2f(m, k, G, f))
    scan = jax.jit(lambda G, f, o, p, u: local_update_core(m, G, f, o, p, u))

    n_acc_total = 0
    for trial in range(3):
        G = jnp.asarray(rng.standard_normal((2, ns, ns)) * 0.25
                        + 0.5 * np.eye(ns), jnp.float32)
        fl = jnp.asarray(rng.integers(0, 4, (ns,)), jnp.int32)
        key = jax.random.PRNGKey(100 + trial)

        Gk, fk, ak, sk = kernel(key, G, fl)
        order, props, us = draw_slice_randoms(key, ns, jnp.float32)
        Gs, fs, as_, ss = scan(G, fl, order, props, us)

        fields_equal = bool((np.asarray(fk) == np.asarray(fs)).all())
        g_err = float(np.abs(np.asarray(Gk) - np.asarray(Gs)).max())
        acc_k, acc_s = float(ak), float(as_)
        sgn_equal = float(sk) == float(ss)
        n_acc_total += int(round(acc_k * ns))
        print(f"trial {trial}: fields_equal={fields_equal} "
              f"max|dG|={g_err:.2e} acc kernel/scan={acc_k:.4f}/{acc_s:.4f} "
              f"sign_equal={sgn_equal}", file=sys.stderr)
        assert fields_equal, "field decisions diverged on TPU"
        assert acc_k == acc_s, "acceptance counts diverged"
        assert sgn_equal, "Metropolis sign diverged"
        assert g_err < 5e-4, f"G deviation {g_err} above f32 envelope"
    assert n_acc_total > 30, "too few accepted moves to be meaningful"
    print('{"ok": true, "check": "2f kernel TPU chain equivalence"}')


if __name__ == "__main__":
    main()
