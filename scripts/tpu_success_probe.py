"""On-chip success-rung autopsy: classify every unsolved instance.

Replicates the bench worker's mixedr configuration EXACTLY (b2048, chunk 40,
phase-2 chunk 8, P2MAX=40, P2SPEC=8, compaction rungs B/2..B/16, restart
rescue) so every program rides the prewarmed .jax_cache, then uses
solve_mixed_chunked(return_info=True) to attribute each failure:

  * p1 (f32 bulk phase): converged vs status (7 = line-search failure,
    8 = hit cap, 9 = stall-frozen)
  * p2 (lockstep f64 endgame, capped at +P2MAX): same
  * rescue (from-scratch compacted f64 re-solve): same, plus final KKT
    errors of anything still unsolved

Env: PROBE_BATCH (2048), PROBE_SEEDS ("1002,1004" — the round-4 bench's
success-rep seeds), PROBE_RESCUE_MAX (1000, the bench default; "" = lockstep
cap), PROBE_HOST_FINAL ("1" — the native-f64 host wave for the df64-floor
residue; "0" disables), BENCH_* knobs as in bench.py.

Run under scripts/tpu_wait_and_run.sh with a generous timeout; detach the
timeout wrapper if it fires mid-compile (CLAUDE.md relay-wedge discipline).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax

if os.environ.get("PROBE_CPU"):      # off-chip smoke path
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from ipddp2tpu import Options
from ipddp2tpu.mixed import solve_mixed_chunked
from ipddp2tpu.models import concar


def classify(snap, which):
    conv = snap["converged"]
    out = {"solved": int(conv.sum()), "total": int(conv.size)}
    fail = ~conv
    for code, name in ((7, "ls_failure"), (8, "iter_cap"), (9, "stall"),
                       (0, "running")):
        out[name] = int((fail & (snap["status"] == code)).sum())
    other = fail & ~np.isin(snap["status"], (0, 7, 8, 9))
    out["other"] = int(other.sum())
    print(f"[{which}] {out}", flush=True)
    return out


def main():
    batch = int(os.environ.get("PROBE_BATCH", "2048"))
    seeds = [int(s) for s in
             os.environ.get("PROBE_SEEDS", "1002,1004").split(",")]
    rescue_max = os.environ.get("PROBE_RESCUE_MAX", "1000")
    rescue_max = int(rescue_max) if rescue_max else None
    host_final = os.environ.get("PROBE_HOST_FINAL", "1") != "0"
    tol = float(os.environ.get("BENCH_TOL", "1e-7"))
    chunk = int(os.environ.get("BENCH_CHUNK", "40"))
    p2_max = int(os.environ.get("BENCH_P2MAX", "40"))
    p2_spec = int(os.environ.get("BENCH_P2SPEC", "8"))
    p2_chunk = int(os.environ.get("BENCH_P2CHUNK", "8"))
    p2_compact = tuple(s for s in (batch // 2, batch // 4, batch // 8,
                                   batch // 16) if s >= 64) or False

    options = Options(optimality_tolerance=tol, max_iterations=600,
                      ldlt_unroll=False)
    problem = concar.problem()

    report = {"batch": batch, "rescue_max": rescue_max, "runs": []}
    for seed in seeds:
        keys = jax.random.split(jax.random.PRNGKey(seed), batch)
        thetas, f_lims, tau_lims, x1s = jax.vmap(concar.random_instance)(keys)
        u0 = jnp.broadcast_to(concar.initial_controls(),
                              (batch, concar.T, concar.NU))
        t0 = time.time()
        sol, info = solve_mixed_chunked(
            problem, concar.bounds(f_lims, tau_lims), x1s, u0, theta=thetas,
            options=options, chunk=chunk,
            phase2_max_iterations=p2_max,
            phase2_ls_speculative=p2_spec or None,
            rescue_failed="restart",
            rescue_max_iterations=rescue_max,
            rescue_host_final=host_final,
            phase2_chunk=p2_chunk, phase2_compact=p2_compact,
            batched=True, return_info=True)
        np.asarray(sol.converged)
        wall = time.time() - t0
        run = {"seed": seed, "wall_s": round(wall, 1),
               "p1": classify(info["p1"], f"s{seed} p1"),
               "p2": classify(info["p2"], f"s{seed} p2")}
        for wave in ("rescue", "host_final"):
            r = info.get(wave)
            if r is None:
                continue
            run[wave] = classify(r, f"s{seed} {wave}")
            run[wave]["k"] = r["k"].tolist()
            run[wave]["indices"] = r["indices"].tolist()
            still = ~r["converged"]
            if still.any():
                run[wave]["unsolved"] = [
                    {"instance": int(r["indices"][i]),
                     "status": int(r["status"][i]), "k": int(r["k"][i]),
                     "primal_inf": float(r["primal_inf"][i]),
                     "dual_inf": float(r["dual_inf"][i]),
                     "cs_inf": float(r["cs_inf"][i]),
                     "mu": float(r["mu"][i])}
                    for i in np.where(still)[0]]
        conv = np.asarray(sol.converged)
        run["final_solved"] = int(conv.sum())
        run["ocps_per_s"] = round(float(conv.sum()) / wall, 2)
        print(f"[s{seed}] final {run['final_solved']}/{batch} "
              f"in {wall:.1f}s = {run['ocps_per_s']} OCPs/s", flush=True)
        report["runs"].append(run)

    out = os.environ.get("PROBE_OUT", "/tmp/success_probe.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    summ = lambda w: {kk: w[kk] for kk in
                      ("solved", "total", "ls_failure", "iter_cap",
                       "stall", "running", "other")}
    print("REPORT " + json.dumps(
        {"runs": [{k: v for k, v in r.items()
                   if k not in ("rescue", "host_final")}
                  | ({"rescue_summary": summ(r["rescue"])}
                     if "rescue" in r else {})
                  | ({"host_final_summary": summ(r["host_final"])}
                     if "host_final" in r else {})
                  for r in report["runs"]]}), flush=True)


if __name__ == "__main__":
    main()
