"""Headline benchmark: batched concar instances solved to KKT tol per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ocps_per_s_per_chip", "vs_baseline": N}

Baseline: the reference solves one concar instance in a median 121.4 ms
single-threaded (BASELINE.md) => 8.24 OCPs/s.

Two rungs are certified in every run:
  * headline (throughput-max): b2048 mixed f32->f64 continuation, hybrid
    line search; f32-stalled instances are abandoned (status reported).
  * success-parity: same but rescue_failed="restart" (f32-stalled instances
    re-solved from scratch in f64 as a compacted batch) — the reference
    solves concar 100/100, so "matching-or-beating" must also hold at
    reference-level success, not only on a throughput metric that discounts
    abandonment. Reported in detail.frontier.

Budget discipline (round-4, after BENCH_r03 timed out): the whole run lives
under BENCH_TOTAL_BUDGET seconds (default 1020).  SIGTERM/SIGINT/SIGALRM all
emit the best-so-far JSON line before exiting, so an outer `timeout` still
captures a certified partial result instead of nothing.  Reps are adaptive:
after the first successful attempt its wall time is used to decide how many
more attempts fit.  Each attempt is isolated in a subprocess so a TPU-worker
crash or compile hang only costs that attempt.

Env knobs: BENCH_TOL (1e-7), BENCH_TOTAL_BUDGET seconds (1020),
BENCH_ATTEMPT_TIMEOUT seconds (600), BENCH_REPS (2, per rung, budget
permitting), BENCH_LADDER like "2048:mixed,512:mixed,8:f64",
BENCH_SUCCESS ("2048:mixedr"; "" disables the success rung),
BENCH_DEVICE_WAIT seconds (300).
"""

import json
import os
import signal
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

    from ipddp2tpu import Options
    from ipddp2tpu.batch import batch_stats
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
    # memoize identical runs; async backends only block on host reads).
    # BENCH_WARM=0 skips it when the caller knows every program is already
    # in the persistent cache AND cache-load latency is acceptable in-wall.
    if os.environ.get("BENCH_WARM", "1") != "0":
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


class _Budget:
    """Wall-clock budget with signal-driven partial emission.

    All of SIGTERM (outer `timeout`), SIGINT, and SIGALRM (our own hard
    stop) kill the in-flight attempt subprocess, emit the best-so-far JSON
    line, and exit 0 — a result always reaches stdout.
    """

    def __init__(self, total_s: float, emit):
        self.t0 = time.time()
        self.total = total_s
        self.emit = emit
        self.child = None
        for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
            signal.signal(sig, self._on_signal)
        signal.alarm(max(1, int(total_s)))

    def remaining(self) -> float:
        return self.total - (time.time() - self.t0)

    def _on_signal(self, signum, frame):
        signal.alarm(0)
        if self.child is not None and self.child.poll() is None:
            try:
                self.child.kill()
            except OSError:
                pass
        self.emit()
        os._exit(0)


def _attempt(budget: "_Budget", batch_s: str, mode: str, tol: float,
             seed: int, timeout: float, attempts: list):
    """One isolated worker run; returns the parsed result or None."""
    timeout = min(timeout, max(10.0, budget.remaining() - 15.0))
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         batch_s, mode, str(tol), str(seed)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=HERE)
    budget.child = proc
    try:
        out, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        attempts.append({"batch": int(batch_s), "mode": mode, "seed": seed,
                         "error": f"timeout {round(timeout)}s"})
        budget.child = None
        return None
    budget.child = None
    line = [l for l in out.strip().splitlines() if l.startswith("{")]
    if proc.returncode == 0 and line:
        res = json.loads(line[-1])
        res["detail"]["attempt_wall_s"] = round(time.time() - t0, 1)
        attempts.append(res["detail"])
        return res
    attempts.append({"batch": int(batch_s), "mode": mode, "seed": seed,
                     "error": (err or "")[-200:]})
    return None


def _median_rep(reps):
    """The rep with the median value (keeps value/detail paired)."""
    byv = sorted(reps, key=lambda r: r["value"])
    return byv[len(byv) // 2] if len(byv) % 2 else byv[len(byv) // 2 - 1]


def _probe_device(budget: "_Budget", wait_s: float) -> bool:
    """The TPU worker behind the relay wedges for tens of minutes after a
    crash; poll with short probe subprocesses before burning attempt budget.
    Bounded by both wait_s and the remaining total budget (less a floor that
    keeps room for at least one attempt)."""
    probe = ("import jax, jax.numpy as jnp, numpy as np; "
             "np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8))); "
             "print('ok')")
    deadline = time.time() + wait_s
    while time.time() < deadline and budget.remaining() > 240:
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, text=True, timeout=90)
            if "ok" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(15)
    return False


def main():
    tol = float(os.environ.get("BENCH_TOL", "1e-7"))
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "600"))
    n_reps = max(1, int(os.environ.get("BENCH_REPS", "2")))
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "1020"))
    ladder = os.environ.get(
        "BENCH_LADDER", "2048:mixed,1024:mixed,512:mixed,8:f64")
    success_rung = os.environ.get("BENCH_SUCCESS", "2048:mixedr")

    attempts = []
    head_reps = []
    succ_reps = []
    emitted = []

    def emit():
        if emitted:          # idempotent: signal during final print
            return
        emitted.append(True)
        baseline = 1.0 / REFERENCE_MEDIAN_WALL_S
        best = _median_rep(head_reps) if head_reps else None
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
                       "succ_reps": [round(r["value"], 3)
                                     for r in succ_reps],
                       "frontier": frontier,
                       "attempts": attempts,
                       "budget_s": total_budget,
                       "baseline_ocps_per_s": round(baseline, 3)},
        }), flush=True)

    budget = _Budget(total_budget, emit)

    device_ok = _probe_device(
        budget, float(os.environ.get("BENCH_DEVICE_WAIT", "300")))
    if not device_ok:
        attempts.append({"error": "device probe never succeeded; "
                                  "attempting anyway with short timeout"})

    # find the working headline rung (rep 0 doubles as its first sample)
    head = None
    for item in ladder.split(","):
        if budget.remaining() < 120:
            break
        batch_s, mode = item.split(":")
        tmo = attempt_timeout if device_ok else min(attempt_timeout, 300)
        res = _attempt(budget, batch_s, mode, tol, 0, tmo, attempts)
        if res is not None and res["value"] > 0:
            head = (batch_s, mode)
            head_reps.append(res)
            break
        if not device_ok:
            break            # wedged chip: don't burn the ladder

    if head is not None:
        # Warm-cache attempt cost estimate from the measured SOLVE wall
        # (attempt = warm solve + timed solve + interpreter/cache-load
        # startup; the first attempt's wall also includes one-time compiles
        # and would over-gate everything after it). The restart-rescue
        # success rung re-solves f32 failures from scratch in f64: ~1.7x.
        solve_wall = head_reps[0]["detail"]["wall_s"]
        est_head = 2.3 * solve_wall + 90
        est_succ = 3.6 * solve_wall + 90
        # priority order: S0 (the success-parity co-headline) first, then
        # alternate extra headline/success reps while budget lasts
        plan = []
        if success_rung:
            plan.append(("succ", 0, est_succ))
        for rep in range(1, n_reps):
            plan.append(("head", rep, est_head))
            if success_rung:
                plan.append(("succ", rep, est_succ))
        for kind, rep, est in plan:
            if budget.remaining() < est:
                continue
            if kind == "succ":
                sb, sm = success_rung.split(":")
                r = _attempt(budget, sb, sm, tol, rep,
                             attempt_timeout, attempts)
                if r is not None:
                    succ_reps.append(r)
            else:
                r = _attempt(budget, head[0], head[1], tol, rep,
                             attempt_timeout, attempts)
                if r is not None:
                    head_reps.append(r)

    signal.alarm(0)
    emit()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], float(sys.argv[4]),
               int(sys.argv[5]) if len(sys.argv) > 5 else 0)
    else:
        main()
