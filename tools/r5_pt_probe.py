"""Root-cause the PT steady error envelope (VERDICT r4 missing #2).

The one PT row that landed in round 4 (artifacts/r4c3/pt_doped.log) read
err_max_steady = 5.28e+3 after proper 200-pair thermalization — ~480x
the single-chain f32 envelope at the same lattice/beta (doped 12x12
beta=6: 10.97).  Candidate mechanisms this probe discriminates:

  A. exchange injection — the replica-exchange state replacement (f64
     stack rebuild cast to f32, or the accept/select) corrupts the
     working state; WITHOUT exchanges the envelope should match the
     single-chain number.
  B. beta-ladder / stacked-model vmap — the envelope is already huge
     with exchanges disabled (then the PT machinery is innocent and the
     sweep-under-model-vmap path or the ladder is the cause).
  C. tail sampling — the single-chain bench measures its envelope over
     a ~40-sweep timed window; the PT run maxes over its WHOLE 300-sweep
     measured phase.  An f32 envelope is heavy-tailed (near-singular
     [I+B] moments spike the naive-vs-stab diff), so the longer max can
     legitimately read orders higher.  Discriminated by per-segment
     envelopes: under C the segment max fluctuates wildly across
     segments with no correlation to exchanges and no replica pattern.

Three arms at the doped scale (12x12, nt=120, 6 replicas):
  1. ladder, exchanges ON  (the round-4 configuration)
  2. ladder, exchanges OFF
  3. equal betas (6.0 x6), exchanges ON (always-accept swaps of
     identical-beta configs — isolates the exchange machinery from the
     ladder)

Per segment (30 sweep pairs) and per replica: err_max (reset each
segment), plus max|G| for context.  Run on TPU.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_arm(name, betas, *, exchanges, L=12, nt=120, n_stab=5,
            n_therm=200, n_segs=10, seg_pairs=15, seed=11):
    import jax
    import jax.numpy as jnp
    from dqmc_tpu.engine import init_state, reset_error_stats, sweep_pair
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import AttractiveHubbard
    from dqmc_tpu.parallel.tempering import replica_exchange
    from dqmc_tpu.parallel.walkers import stack_models
    from dqmc_tpu.run import make_engine_config
    from dqmc_tpu.config import Parameters

    jax.config.update("jax_enable_x64", True)   # f64 exchange actions
    text = f"""
[Lattice]
L1 = {L}
L2 = {L}
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = {betas[0]}
nt = {nt}
n_stab = {n_stab}
"""
    params = Parameters.from_string(text)
    lat = square_lattice(L, L)
    models = stack_models([
        AttractiveHubbard.from_params(params, lat, beta=b,
                                      dtype=jnp.float32)
        for b in betas])
    cfg = make_engine_config(params, models)
    R = len(betas)
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    states = jax.vmap(lambda m, k: init_state(m, cfg, k))(
        models, jax.random.split(k0, R))
    step = jax.jit(jax.vmap(lambda m, s: sweep_pair(m, cfg, s)))
    reset = jax.jit(jax.vmap(reset_error_stats))

    t0 = time.time()
    for _ in range(n_therm):
        states = step(models, states)
    jax.block_until_ready(states.G)
    print(f"[{name}] thermalized {n_therm} pairs in {time.time()-t0:.0f}s "
          f"(therm transient err {np.asarray(states.err_max).max():.3e})",
          flush=True)
    states = reset(states)

    rows = []
    attempt = 0
    for seg in range(n_segs):
        ex_acc = None
        if exchanges and seg > 0:
            attempt += 1
            key, k_ex = jax.random.split(key)
            states, acc = replica_exchange(models, cfg, states,
                                           jnp.asarray(attempt), k_ex,
                                           f64_actions=True)
            ex_acc = [bool(a) for a in np.asarray(acc)]
        for _ in range(seg_pairs):
            states = step(models, states)
        err = np.asarray(states.err_max, np.float64)
        gmax = np.abs(np.asarray(states.G)).max(
            axis=tuple(range(1, states.G.ndim)))
        rows.append({"seg": seg, "exchange_acc": ex_acc,
                     "err_max": [float(e) for e in err],
                     "g_max": [float(g) for g in gmax]})
        print(f"[{name}] seg {seg}: err/replica=" +
              " ".join(f"{e:9.3e}" for e in err) +
              (f"  exch={ex_acc}" if ex_acc is not None else ""),
              flush=True)
        states = reset(states)
    env = max(max(r["err_max"]) for r in rows)
    print(f"[{name}] whole-phase envelope (max over segs/replicas): "
          f"{env:.3e}", flush=True)
    return {"arm": name, "betas": betas, "envelope": env, "rows": rows}


def _maybe_force_cpu():
    """This image's axon plugin overrides the JAX_PLATFORMS env var
    (see tests/conftest.py) — honor it programmatically so CPU smoke
    runs do not land on the TPU tunnel."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def main():
    _maybe_force_cpu()
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=12)
    p.add_argument("--nt", type=int, default=120)
    p.add_argument("--therm", type=int, default=200)
    p.add_argument("--segs", type=int, default=10)
    p.add_argument("--seg-pairs", type=int, default=15)
    p.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "r5c2", "pt_probe.json"))
    args = p.parse_args()

    ladder = [6.0, 5.8, 5.6, 5.4, 5.2, 5.0]
    equal = [6.0] * 6
    kw = dict(L=args.L, nt=args.nt, n_therm=args.therm, n_segs=args.segs,
              seg_pairs=args.seg_pairs)
    out = [
        run_arm("ladder+exchange", ladder, exchanges=True, **kw),
        run_arm("ladder, no exchange", ladder, exchanges=False, **kw),
        run_arm("equal-beta+exchange", equal, exchanges=True, **kw),
    ]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({o["arm"]: o["envelope"] for o in out}))


if __name__ == "__main__":
    main()
