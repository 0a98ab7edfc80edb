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

G is a PHYSICAL equal-time Green's function (stable rebuild from a random
field configuration), not a random matrix: the delayed-update algebra
amplifies rounding by 1/r_flv per accepted move, and synthetic G matrices
place r_flv arbitrarily close to zero where no tolerance is meaningful
(observed 1.5 absolute deviation on-chip with identical decisions on
random inputs).  On physical states the acceptance factors are bounded
and the f32 envelope below is tight.

History: this check caught a real Mosaic-only miscompile class — the
flush dot_generals ran at DEFAULT precision, which truncates f32 operands
to bf16 on the MXU, flipping marginal Metropolis decisions (ndiff 1-7 per
slice at k_delay=32, 1-flavor kernel equally affected).  Interpret-mode
CPU tests can never see this; the fix pins Precision.HIGHEST on the
flushes (ops/kernels.py).

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
    from dqmc_tpu import hsfield
    from dqmc_tpu.engine.state import EngineConfig
    from dqmc_tpu.engine.sweep import (draw_slice_randoms, local_update_core,
                                       rebuild_stack_and_greens)
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
    nt = 40
    m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.5, beta=4.0, nt=nt,
                               dtype=jnp.float32)
    cfg = EngineConfig(nt=nt, n_stab=5)

    kernel = jax.jit(lambda k, G, f: pallas_site_update_2f(m, k, G, f))
    scan = jax.jit(lambda G, f, o, p, u: local_update_core(m, G, f, o, p, u))
    greens = jax.jit(
        lambda f: rebuild_stack_and_greens(m, cfg, f)[1])

    n_acc_total = 0
    for trial in range(3):
        key = jax.random.PRNGKey(100 + trial)
        fields = hsfield.init_fields(jax.random.fold_in(key, 7), nt, ns)
        G = greens(fields)           # physical G(0,0) for this config
        fl = fields[0]

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
        # the bitwise contract is the DECISIONS (above); G deviation is
        # f32 rounding amplified by delta/r_flv per accepted move (a few
        # e-4 typical, ~3e-3 when a move lands near r_flv ~ 0.1) and is
        # repaired by the next stabilization rebuild every n_stab slices
        assert g_err < 1e-2, f"G deviation {g_err} above f32 envelope"
    assert n_acc_total > 30, "too few accepted moves to be meaningful"

    # same contract for the 1-FLAVOR per-slice kernel (it shares the
    # delayed-update/flush machinery and was equally affected by the
    # DEFAULT-precision miscompile)
    from dqmc_tpu.models import AttractiveHubbard
    from dqmc_tpu.ops.kernels import pallas_site_update

    m1 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=4.0,
                                 nt=nt, dtype=jnp.float32)
    kernel1 = jax.jit(lambda k, G, f: pallas_site_update(m1, k, G, f))
    scan1 = jax.jit(
        lambda G, f, o, p, u: local_update_core(m1, G, f, o, p, u))
    greens1 = jax.jit(lambda f: rebuild_stack_and_greens(m1, cfg, f)[1])
    for trial in range(2):
        key = jax.random.PRNGKey(200 + trial)
        fields = hsfield.init_fields(jax.random.fold_in(key, 7), nt, ns)
        G = greens1(fields)
        fl = fields[0]
        Gk, fk, ak = kernel1(key, G, fl)[:3]
        order, props, us = draw_slice_randoms(key, ns, jnp.float32)
        Gs, fs, as_, _ = scan1(G, fl, order, props, us)
        fields_equal = bool((np.asarray(fk) == np.asarray(fs)).all())
        g_err = float(np.abs(np.asarray(Gk) - np.asarray(Gs)).max())
        print(f"1f trial {trial}: fields_equal={fields_equal} "
              f"max|dG|={g_err:.2e} acc={float(ak):.4f}/{float(as_):.4f}",
              file=sys.stderr)
        assert fields_equal, "1f field decisions diverged on TPU"
        assert float(ak) == float(as_), "1f acceptance diverged"
        assert g_err < 1e-2, f"1f G deviation {g_err}"

    # --- delayed-vs-submatrix TRAJECTORY bit-assert (round-3 verdict
    # item 7): the two site-update schemes implement the SAME Markov
    # chain (update.cpp:5-32 — one chain, one answer); over whole
    # sweeps on hardware their field trajectories must stay bit-equal
    # (acc/err digit agreement alone would miss compensating errors).
    from dqmc_tpu.engine import init_state, sweep_pair

    cfg_d = EngineConfig(nt=nt, n_stab=5, use_pallas=True)
    cfg_s = EngineConfig(nt=nt, n_stab=5, use_pallas=True,
                         submatrix_rank=32)
    sweep_d = jax.jit(lambda s: sweep_pair(m1, cfg_d, s))
    sweep_s = jax.jit(lambda s: sweep_pair(m1, cfg_s, s))
    st = init_state(m1, cfg_d, jax.random.PRNGKey(42))
    sd = ss = st
    n_pairs = 4
    for i in range(n_pairs):
        sd, ss = sweep_d(sd), sweep_s(ss)
        fd, fs = np.asarray(sd.fields), np.asarray(ss.fields)
        same = bool((fd == fs).all())
        g_err = float(np.abs(np.asarray(sd.G) - np.asarray(ss.G)).max())
        print(f"traj pair {i}: fields_bitequal={same} ndiff="
              f"{int((fd != fs).sum())} max|dG|={g_err:.2e} "
              f"acc={float(sd.acc_sum):.4f}/{float(ss.acc_sum):.4f}",
              file=sys.stderr)
        assert same, (f"delayed-vs-submatrix trajectories diverged at "
                      f"sweep pair {i}")
        assert float(sd.acc_sum) == float(ss.acc_sum), \
            "acceptance sums diverged"

    print('{"ok": true, "check": "1f+2f kernel TPU chain equivalence '
          '+ delayed-vs-submatrix trajectory bit-assert"}')


if __name__ == "__main__":
    main()
