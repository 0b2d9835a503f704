"""Headline benchmark: batched concar instances solved to KKT tol per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ocps_per_s_per_chip", "vs_baseline": N}

Baseline: the reference solves one concar instance in a median 121.4 ms
single-threaded (BASELINE.md) => 8.24 OCPs/s.

The measurement runs a ladder of configurations (large batch first, mixed
f32->f64 continuation preferred, pure f64 fallback), each attempt isolated in
a subprocess with a timeout so a TPU-worker crash or compile hang only costs
that attempt. The first working rung is the headline configuration; it is
re-run for BENCH_REPS total measurements on fresh instance sets (relay noise
on this deployment is +-10% with occasional 3-4x outliers; the builder's own
round-2 notes say f64-phase noise reaches +-50%) and the MEDIAN rep is
reported. A second success-parity rung (mode suffix "r": f32-stalled
instances are re-solved from scratch in f64 as a compacted batch instead of
abandoned, ipddp2tpu/mixed.py rescue_failed="restart") is interleaved with
the headline reps and reported in detail.frontier — the reference solves
concar 100/100, so "matching-or-beating" must also hold at reference success
rates, not only on a solved-per-second metric that discounts abandonment.

Env knobs: BENCH_TOL (1e-7), BENCH_ATTEMPT_TIMEOUT seconds (1800),
BENCH_REPS (2), BENCH_LADDER like "2048:mixed,512:mixed,8:f64",
BENCH_SUCCESS ("2048:mixedr"; "" disables the success rung).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE_MEDIAN_WALL_S = 0.1214  # BASELINE.md concar IPDDP2 median


def worker(batch: int, mode: str, tol: float, seed: int = 0):
    import jax

    jax.config.update("jax_enable_x64", True)
    # TPU matmuls default to bf16 passes; the f32 phase of the mixed solver
    # needs true f32 accumulation to reach its 3e-4 tolerance
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from ipddp2tpu import Bounds, Options
    from ipddp2tpu.batch import batch_stats, solve_batch
    from ipddp2tpu.mixed import solve_mixed
    from ipddp2tpu.models import concar

    p1spec = int(os.environ.get("BENCH_P1SPEC", "0"))
    options = Options(optimality_tolerance=tol, max_iterations=600,
                      ldlt_unroll=False,
                      forward_kernel=os.environ.get("BENCH_FWDK", "auto"),
                      # hybrid line search in the f32 bulk phase: one
                      # batched K-candidate evaluation + sequential
                      # continuation below 2^-K (same largest-acceptable-
                      # gamma semantics; kills the max-over-batch
                      # backtracking chains)
                      **({"ls_speculative": p1spec,
                          "ls_spec_continue": True} if p1spec else {}))
    problem = concar.problem()
    # short per-call device programs: the TPU runtime here kills long
    # executions, so the solve is chunked and resumed from state on the host
    chunk = int(os.environ.get("BENCH_CHUNK", "40"))

    def make(seed, dtype=None):
        keys = jax.random.split(jax.random.PRNGKey(seed), batch)
        thetas, f_lims, tau_lims, x1s = jax.vmap(
            concar.random_instance)(keys)
        u0 = jnp.broadcast_to(concar.initial_controls(),
                              (batch, concar.T, concar.NU))
        args = (concar.bounds(f_lims, tau_lims), x1s, u0, thetas)
        if dtype is not None:
            cast = lambda a: (a.astype(dtype) if jnp.issubdtype(
                a.dtype, jnp.floating) else a)
            args = jax.tree.map(cast, args)
        return args

    from ipddp2tpu.chunked import solve_chunked
    from ipddp2tpu.mixed import solve_mixed_chunked

    rescue_mode = False
    if mode.endswith("r"):              # success-parity rung
        mode = mode[:-1]
        rescue_mode = "restart"

    if mode == "mixed":
        # Phase budgets (measured, docs/PERF.md): normal endgames take 6-25
        # f64 iterations; an f32-FAILED instance otherwise triggers a
        # hundreds-of-iterations f64 rescue that costs more wall than the
        # rest of the batch (one observed rescue: 509 f64 iters = 271 s).
        # Throughput-optimal: bound the rescue, let hopeless instances fail.
        p1_max = int(os.environ.get("BENCH_P1MAX", "0")) or None
        p2_max = int(os.environ.get("BENCH_P2MAX", "40"))

        rescue = (rescue_mode
                  or bool(int(os.environ.get("BENCH_RESCUE", "0"))))
        p2_spec = int(os.environ.get("BENCH_P2SPEC", "8"))
        # freeze f32-stalled instances (no mu / KKT progress) instead of
        # letting them stretch the lockstep batch to the iteration cap
        stall = int(os.environ.get("BENCH_STALL", "0")) or None
        # endgame batch compaction: the f64 phase is compute-bound, so
        # converged lockstep lanes pay full price; gather the still-running
        # tail into smaller batches at phase-2 chunk boundaries.
        # BENCH_P2COMPACT: "0" off, "1" = {B/2, B/4, B/8, B/16} rungs,
        # or an explicit comma list like "512,128".
        p2c_env = os.environ.get("BENCH_P2COMPACT", "1")
        if p2c_env == "0":
            p2_compact = False
        elif p2c_env == "1":
            p2_compact = tuple(s for s in (batch // 2, batch // 4,
                                           batch // 8, batch // 16)
                               if s >= 64) or False
        else:
            p2_compact = tuple(int(s) for s in p2c_env.split(","))
        p2_chunk = int(os.environ.get("BENCH_P2CHUNK", "8"))

        def run(b, x, u, th):
            return solve_mixed_chunked(problem, b, x, u, theta=th,
                                       options=options, chunk=chunk,
                                       phase1_max_iterations=p1_max,
                                       phase2_max_iterations=p2_max,
                                       phase2_ls_speculative=p2_spec or None,
                                       phase1_stall_window=stall,
                                       rescue_failed=rescue,
                                       phase2_chunk=p2_chunk,
                                       phase2_compact=p2_compact,
                                       batched=True)
    else:
        def run(b, x, u, th):
            return solve_chunked(problem, b, x, u, theta=th,
                                 options=options, chunk=chunk, batched=True)

    # warm-up/compile on a different instance set (execution layers may
    # memoize identical runs; async backends only block on host reads)
    warm = make(1)
    sol = run(*warm)
    np.asarray(sol.converged)

    args = make(1000 + seed)
    t0 = time.time()
    sol = run(*args)
    np.asarray(sol.converged)
    wall = time.time() - t0

    stats = batch_stats(sol)
    solved = int(stats.num_converged)
    print(json.dumps({
        "value": solved / wall,
        "detail": {
            "batch": batch, "mode": mode, "solved": solved,
            "seed": seed, "rescue": rescue_mode or None,
            "wall_s": round(wall, 3), "tol": tol,
            "p2_compact": (list(p2_compact) if mode == "mixed"
                           and p2_compact else None),
            "median_iterations": float(stats.median_iterations),
            "max_iterations": int(stats.max_iterations),
            "device": str(jax.devices()[0]),
        },
    }))


def _wait_for_device(budget_s: float):
    """The TPU worker behind the relay wedges for tens of minutes after a
    crash; poll with short probe subprocesses before burning attempt budget."""
    probe = ("import jax, jax.numpy as jnp, numpy as np; "
             "np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8))); "
             "print('ok')")
    deadline = time.time() + budget_s
    while time.time() < deadline:
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, text=True, timeout=90)
            if "ok" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(30)
    return False


def _attempt(batch_s: str, mode: str, tol: float, seed: int,
             timeout: float, attempts: list):
    """One isolated worker run; returns the parsed result or None."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             batch_s, mode, str(tol), str(seed)],
            capture_output=True, text=True, timeout=timeout, cwd=HERE)
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")]
        if out.returncode == 0 and line:
            res = json.loads(line[-1])
            attempts.append(res["detail"])
            return res
        attempts.append({"batch": int(batch_s), "mode": mode, "seed": seed,
                         "error": (out.stderr or "")[-200:]})
    except subprocess.TimeoutExpired:
        attempts.append({"batch": int(batch_s), "mode": mode, "seed": seed,
                         "error": f"timeout {timeout}s"})
    return None


def _median_rep(reps):
    """The rep with the median value (keeps value/detail paired)."""
    byv = sorted(reps, key=lambda r: r["value"])
    return byv[len(byv) // 2] if len(byv) % 2 else byv[len(byv) // 2 - 1]


def main():
    tol = float(os.environ.get("BENCH_TOL", "1e-7"))
    timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1800"))
    n_reps = max(1, int(os.environ.get("BENCH_REPS", "2")))
    _wait_for_device(float(os.environ.get("BENCH_DEVICE_WAIT", "2400")))
    ladder = os.environ.get(
        "BENCH_LADDER", "2048:mixed,1024:mixed,512:mixed,8:f64")
    success_rung = os.environ.get("BENCH_SUCCESS", "2048:mixedr")

    attempts = []
    # find the working headline rung (rep 0 doubles as its first sample)
    head = None
    for item in ladder.split(","):
        batch_s, mode = item.split(":")
        res = _attempt(batch_s, mode, tol, 0, timeout, attempts)
        if res is not None and res["value"] > 0:
            head = (batch_s, mode)
            head_reps = [res]
            break
    succ_reps = []
    if head is not None and int(head[0]) >= 16:
        # interleave the remaining headline reps with the success rung
        # (H0 S0 H1 S1 ... — noise averages across both configs)
        for rep in range(1, n_reps + 1):
            if success_rung:
                sb, sm = success_rung.split(":")
                r = _attempt(sb, sm, tol, rep - 1, timeout, attempts)
                if r is not None:
                    succ_reps.append(r)
            if rep < n_reps:
                r = _attempt(head[0], head[1], tol, rep, timeout, attempts)
                if r is not None:
                    head_reps.append(r)

    baseline = 1.0 / REFERENCE_MEDIAN_WALL_S
    best = _median_rep(head_reps) if head else None
    value = best["value"] if best else 0.0
    succ = _median_rep(succ_reps) if succ_reps else None
    frontier = {
        "throughput_max": best["detail"] if best else None,
        "success_max": succ["detail"] if succ else None,
        "success_max_ocps_per_s": (round(succ["value"], 3) if succ
                                   else None),
    }
    print(json.dumps({
        "metric": "concar OCPs solved to KKT tol per second per chip",
        "value": round(value, 3),
        "unit": "ocps_per_s_per_chip",
        "vs_baseline": round(value / baseline, 3),
        "detail": {"best": best["detail"] if best else None,
                   "reps": [round(r["value"], 3) for r in head_reps],
                   "frontier": frontier,
                   "attempts": attempts,
                   "baseline_ocps_per_s": round(baseline, 3)},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], float(sys.argv[4]),
               int(sys.argv[5]) if len(sys.argv) > 5 else 0)
    else:
        main()
