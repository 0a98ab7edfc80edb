"""Diagnose the delayed-vs-submatrix trajectory divergence on hardware.

The round-4 on-chip trajectory bit-assert (tools/tpu_2f_equivalence.py,
verdict round-3 item 7) FAILED at sweep pair 0: the two site-update
schemes' field trajectories are NOT bit-equal on TPU.  Hypothesis: both
schemes consume the identical random stream and realize the same Markov
chain in exact arithmetic, but their f32 Green's-function update
arithmetic differs (rank-k flush GEMM vs bordered-Woodbury solve), so a
site whose Metropolis margin |min(1,|R|) - u| is below the f32
G-arithmetic envelope (~1e-4..1e-3) can decide differently — one flipped
decision then decoheres the chains exactly like two seeds.

This probe measures that margin.  For many (fields, key) draws it runs
ONE slice through both Pallas kernels from the IDENTICAL (G, fields)
input and, wherever their decisions differ, recomputes the per-site
Metropolis quantities in f64 with the reference rank-1 recurrence
(following the DELAYED arm's decisions up to the flip site — the two
arms are identical up to there) and reports the margin at the first
flip.

Verdict rule:
  - every flip margin << typical margins (say < 1e-3)  -> benign
    threshold decoherence; the bit-equality contract is unprovable for
    two different f32 arithmetics and the equivalence tool should assert
    per-slice flips-only-at-tiny-margin + acceptance-statistics instead.
  - any flip at a LARGE margin -> a real decision bug in one kernel.

Usage: python tools/r4_traj_diverge.py [--trials 40] [--k 16]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def margins_f64(model, G0, f0, order, props, us, follow):
    """Reference rank-1 Metropolis recurrence in f64, following the
    decision sequence ``follow`` (so the state at each visit matches the
    arm that produced those decisions); returns per-visit
    (site, margin, accept64)."""
    from dqmc_tpu import hsfield

    proposal = np.asarray(hsfield.PROPOSAL)
    G = np.asarray(G0, np.float64)
    f = np.asarray(f0).copy()
    out = []
    for j in range(len(order)):
        i = int(order[j])
        old = int(f[i])
        new = int(proposal[old, int(props[j])])
        gammaR, bosonR, delta = (np.asarray(x, np.float64) for x in
                                 model.update_factors(old, new))
        G_ii = G[:, i, i]
        r_flv = 1.0 + (1.0 - G_ii) * delta
        R = float(gammaR * bosonR * np.prod(r_flv) ** model.det_power)
        u = float(us[j])
        margin = abs(min(1.0, abs(R)) - u)
        acc64 = u < min(1.0, abs(R))
        out.append((i, margin, acc64))
        if bool(follow[j]):
            prefac = delta / r_flv
            e_i = np.zeros(G.shape[-1])
            e_i[i] = 1.0
            u_vec = G[:, :, i]
            v_vec = G[:, i, :] - e_i[None, :]
            G = G + prefac[:, None, None] * (
                u_vec[:, :, None] * v_vec[:, None, :])
            f[i] = new
    return out


def first_flip(model, G, fl, order, props, us, fd, fs):
    """First visit where the two arms' decisions differ, with its f64
    Metropolis margin computed from the (still common) state.

    ``fd`` / ``fs`` are the two arms' slice fields after the update.
    Each site is visited exactly once (order is a permutation) and the
    proposal table excludes the old state, so an arm accepted a visit
    iff that site's field changed.  Returns (visit, site, margin,
    acc_delayed, acc_sub) or None when the decision sets are equal.
    """
    f0 = np.asarray(fl)
    order = np.asarray(order)
    follow = [bool(fd[int(order[j])] != f0[int(order[j])])
              for j in range(len(order))]
    stats = margins_f64(model, G, fl, order, np.asarray(props),
                        np.asarray(us), follow)
    for j in range(len(order)):
        i = int(order[j])
        acc_d = bool(fd[i] != f0[i])
        acc_s = bool(fs[i] != f0[i])
        if acc_d != acc_s:
            return (j, i, stats[j][1], acc_d, acc_s)
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=40)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--L", type=int, default=8)
    p.add_argument("--nt", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dqmc_tpu import hsfield
    from dqmc_tpu.engine import EngineConfig
    from dqmc_tpu.engine.sweep import (draw_slice_randoms,
                                       rebuild_stack_and_greens)
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import AttractiveHubbard
    from dqmc_tpu.ops.kernels import (pallas_site_update,
                                      pallas_site_update_submatrix)

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    lat = square_lattice(args.L, args.L)
    ns, nt = lat.n_sites, args.nt
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=4.0,
                                    nt=nt, dtype=jnp.float32)
    cfg = EngineConfig(nt=nt, n_stab=5)

    kern_d = jax.jit(lambda k, G, f: pallas_site_update(model, k, G, f))
    kern_s = jax.jit(
        lambda k, G, f: pallas_site_update_submatrix(args.k)(model, k, G, f))
    greens = jax.jit(lambda f: rebuild_stack_and_greens(model, cfg, f)[1])

    n_flips = 0
    n_large = 0
    all_flip_margins = []
    max_dG = 0.0
    n_decisions = 0
    for trial in range(args.trials):
        key = jax.random.PRNGKey(5000 + trial)
        fields = hsfield.init_fields(jax.random.fold_in(key, 3), nt, ns)
        G = greens(fields)
        fl = fields[0]
        kd = jax.random.fold_in(key, 11)
        Gd, fd, ad = (np.asarray(x) for x in kern_d(kd, G, fl)[:3])
        Gs, fs, as_ = (np.asarray(x) for x in kern_s(kd, G, fl)[:3])
        n_decisions += ns
        # the decoherence seed: the two arms' f32 G-update arithmetic
        # differs at lsb level even when every decision matches
        max_dG = max(max_dG, float(np.abs(Gd - Gs).max()))
        if (fd == fs).all():
            continue
        order, props, us = draw_slice_randoms(kd, ns, jnp.float32)
        first = first_flip(model, G, fl, order, props, us, fd, fs)
        if first is None:
            print(f"trial {trial}: decision sets equal but fields differ "
                  f"(unexpected)", file=sys.stderr)
            continue
        j, i, margin, acc_d, acc_s = first
        n_flips += 1
        all_flip_margins.append(margin)
        if margin > 1e-3:
            n_large += 1
        print(f"trial {trial}: first flip at visit {j} site {i} "
              f"margin={margin:.3e} delayed_acc={acc_d} sub_acc={acc_s} "
              f"ndiff={int((fd != fs).sum())} acc_sums={ad:.4f}/{as_:.4f}",
              file=sys.stderr)

    print(f"\n{args.trials} trials ({n_decisions} decisions): "
          f"{n_flips} slices with a decision flip, "
          f"{n_large} flips at margin > 1e-3, "
          f"max per-slice |G_delayed - G_sub| = {max_dG:.3e}",
          file=sys.stderr)
    if all_flip_margins:
        print(f"flip margins: min={min(all_flip_margins):.3e} "
              f"max={max(all_flip_margins):.3e}", file=sys.stderr)
    import json
    print(json.dumps({
        "trials": args.trials, "decisions": n_decisions,
        "flip_slices": n_flips,
        "large_margin_flips": n_large,
        "max_dG_slice": max_dG,
        "max_flip_margin": (max(all_flip_margins) if all_flip_margins
                            else None)}))


if __name__ == "__main__":
    main()
