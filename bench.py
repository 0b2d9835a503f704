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

Budget discipline (round 4, after BENCH_r03 timed out): the whole run lives
under BENCH_TOTAL_BUDGET seconds (default 1500). SIGTERM/SIGINT/SIGALRM all
emit the best-so-far JSON line before exiting, so an outer `timeout`
shorter than the budget still captures a certified partial result instead
of nothing.

Process layout (round 4, after per-attempt subprocess isolation proved to
cost ~400 s of interpreter + compile-cache-load PER ATTEMPT): ONE worker
subprocess executes the whole measurement plan — an unreported warm solve,
one headline rep, ONE success rep (certification priority: both rungs
land even when the relay draws its slow tail), then the remaining
headline reps and extra success reps (a worker-side soft deadline skips
trailing reps that would overrun the driver's capture window so the run
exits cleanly, BENCH_SOFT_DEADLINE below) — streaming one JSON line per
completed solve. The parent collects lines as
they arrive, so a TPU-worker crash or kill mid-plan only loses the rep in
flight. A ladder of fallback configurations engages only if the primary
rung produced nothing.

Env knobs: BENCH_TOL (1e-7), BENCH_TOTAL_BUDGET seconds (1500),
BENCH_FIRST_TIMEOUT seconds (800, deadline for the worker's first line),
BENCH_REPS (3, per rung), BENCH_LADDER like "2048:mixed,512:mixed,8:f64"
(first entry is the primary rung; suffix "r" on a mode = restart-rescue),
BENCH_SUCCESS ("mixedr"; "" disables the success rung),
BENCH_RESCUE_MAX (1000 — restart-rescue iteration cap, the reference's
max_iter; "0" falls back to the lockstep cap), BENCH_HOST_FINAL ("1" — success rung's native-f64
host-CPU re-solve of the df64-floor residue; "0" disables),
BENCH_DEVICE_WAIT seconds (900 — a wedged relay takes 20-40 min to
recover; polling is cheaper than doomed attempts),
BENCH_SOFT_DEADLINE seconds (1000 — worker-side soft deadline measured
from worker start: a rep whose estimated wall would overrun it is skipped
so the run exits naturally with rc 0 inside the driver's capture window;
the only empirically captured window is round 4's ~1080 s).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE_MEDIAN_WALL_S = 0.1214  # BASELINE.md concar IPDDP2 median


def worker(batch: int, plan: str, tol: float, seed0: int = 0,
           soft: float = 0.0, hard: float = 0.0):
    """Execute `plan` (comma list of modes; "warm" = unreported headline-
    config solve) on fresh instance sets, one JSON line per solve.
    `soft` > 0 = soft deadline in seconds from worker start (see below)."""
    import jax

    if os.environ.get("BENCH_CPU"):      # off-chip smoke path for CI/tests
        jax.config.update("jax_platforms", "cpu")
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

    def make(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), batch)
        thetas, f_lims, tau_lims, x1s = jax.vmap(
            concar.random_instance)(keys)
        u0 = jnp.broadcast_to(concar.initial_controls(),
                              (batch, concar.T, concar.NU))
        return (concar.bounds(f_lims, tau_lims), x1s, u0, thetas)

    from ipddp2tpu.chunked import solve_chunked
    from ipddp2tpu.mixed import solve_mixed_chunked

    # Phase budgets (measured, docs/PERF.md): normal endgames take 6-25
    # f64 iterations; an f32-FAILED instance otherwise triggers a
    # hundreds-of-iterations f64 rescue that costs more wall than the
    # rest of the batch. Headline: bound the rescue, let hopeless
    # instances fail. Success rung: re-solve them from scratch in f64 as
    # a compacted batch (rescue_failed="restart").
    p1_max = int(os.environ.get("BENCH_P1MAX", "0")) or None
    p2_max = int(os.environ.get("BENCH_P2MAX", "40"))
    p2_spec = int(os.environ.get("BENCH_P2SPEC", "8"))
    # restart-rescue iteration cap: the reference's own max_iter
    # (src/options.jl:5). Measured round 5: capping at 600 instead only
    # displaces the 0-2 slow-but-solvable instances (k 600-730) onto the
    # host wave, where their long lockstep tail costs ~3x more wall than
    # the compacted chip rescue pays for the same iterations — so the
    # chip rescue keeps the full budget and the host wave receives only
    # the df64-precision-floor class (native-f64 k ~110-160)
    rescue_max = int(os.environ.get("BENCH_RESCUE_MAX", "1000")) or None
    # per-chunk adaptive hybrid-LS K in the f32 phase, e.g. "2,4,8"
    # ("" = static autotuned K)
    adapt_env = os.environ.get("BENCH_ADAPT_K", "")
    adapt_k = (tuple(int(k) for k in adapt_env.split(","))
               if adapt_env else None)
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

    def run(mode, args):
        if mode == "f64":
            return solve_chunked(problem, *args, options=options,
                                 chunk=chunk, batched=True)
        rescue = "restart" if mode == "mixedr" else bool(
            int(os.environ.get("BENCH_RESCUE", "0")))
        # success rung: still-unconverged residue (the df64 precision
        # floor's ~0.5%) re-solved on the host CPU in native f64, inside
        # the measured wall (BENCH_HOST_FINAL=0 disables)
        host_final = (mode == "mixedr"
                      and os.environ.get("BENCH_HOST_FINAL", "1") != "0")
        b, x, u, th = args
        return solve_mixed_chunked(problem, b, x, u, theta=th,
                                   options=options, chunk=chunk,
                                   phase1_max_iterations=p1_max,
                                   phase2_max_iterations=p2_max,
                                   phase2_ls_speculative=p2_spec or None,
                                   phase1_stall_window=stall,
                                   rescue_failed=rescue,
                                   rescue_max_iterations=rescue_max,
                                   rescue_host_final=host_final,
                                   phase2_chunk=p2_chunk,
                                   phase2_compact=p2_compact,
                                   phase1_adapt_ls=adapt_k,
                                   batched=True)

    modes = plan.split(",")
    # Soft deadline (seconds from worker start): the driver wraps
    # `python bench.py` in a timeout of UNKNOWN length; the only duration a
    # driver capture has ever demonstrated is round 4's ~1080 s natural
    # exit (round 3's longer run scored rc 124). Rather than racing the
    # alarm — whose child-kill can land mid-dispatch and wedge the relay —
    # the worker SKIPS any rep whose estimated duration would overrun the
    # soft deadline and exits cleanly, so the parent emits and returns
    # rc 0 with whatever certified within the envelope. Estimates are the
    # last observed same-mode wall (plus inter-rep overhead), seeded
    # conservatively.
    t_start = time.time()
    est = {"mixed": 130.0, "mixedr": 320.0, "f64": 350.0}
    done = {}
    for i, mode in enumerate(modes):
        warm = mode == "warm"
        if warm:
            # the warm solve compiles/loads every program of the plan's
            # first reported mode; it is streamed (liveness signal for the
            # parent) but excluded from the reported stats
            run_mode = modes[i + 1] if i + 1 < len(modes) else "mixed"
        else:
            run_mode = mode
            # Deadline tiers. The FIRST success-rung rep ("…r" modes) is
            # UNCONDITIONALLY exempt — certification of the 100%-success
            # rung outranks scheduling (a degraded-relay run once burned
            # ~600 s of budget in the device probe, shrank the deadlines,
            # and silently dropped the only mixedr rep). The first two
            # reps of other modes get the HARD deadline (one retry for a
            # degraded-relay draw — observed 245 s for a cached 70 s
            # program); all further reps obey the SOFT deadline.
            n_done = done.get(run_mode, 0)
            if run_mode.endswith("r") and n_done == 0:
                limit = float("inf")
            elif n_done >= 2:
                limit = soft
            else:
                limit = hard or soft
            if (soft and (time.time() - t_start
                          + est.get(run_mode, 300.0)) > limit):
                print(json.dumps({
                    "skipped": True, "warm": False,
                    "detail": {"batch": batch, "mode": run_mode,
                               "rep": i, "skipped": True,
                               "elapsed_s": round(time.time() - t_start, 1),
                               "est_s": est.get(run_mode, 300.0),
                               "limit_s": round(limit, 1)},
                }), flush=True)
                continue
        seed = seed0 + 1000 + i
        args = make(seed)
        t0 = time.time()
        sol = run(run_mode, args)
        np.asarray(sol.converged)   # only host reads block on this backend
        wall = time.time() - t0
        if not warm:
            est[run_mode] = wall + 30.0       # + inter-rep overhead margin
            done[run_mode] = done.get(run_mode, 0) + 1
        stats = batch_stats(sol)
        solved = int(stats.num_converged)
        print(json.dumps({
            "value": solved / wall,
            "warm": warm,
            "detail": {
                "batch": batch, "mode": run_mode, "solved": solved,
                "seed": seed, "rep": i, "warm": warm,
                "wall_s": round(wall, 3), "tol": tol,
                "median_iterations": float(stats.median_iterations),
                "max_iterations": int(stats.max_iterations),
                "device": str(jax.devices()[0]),
            },
        }), flush=True)


class _Budget:
    """Wall-clock budget with signal-driven partial emission.

    All of SIGTERM (outer `timeout`), SIGINT, and SIGALRM (our own hard
    stop) kill the in-flight worker subprocess, emit the best-so-far JSON
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


def _run_plan(budget: "_Budget", batch_s: str, plan: list, tol: float,
              seed0: int, first_timeout: float, on_line, attempts: list):
    """One worker subprocess executing `plan`; parsed JSON lines stream to
    `on_line` as each solve completes. Returns the number of lines seen."""
    err_f = tempfile.NamedTemporaryFile(mode="w+", suffix=".benchlog",
                                        delete=False)
    soft = max(120.0, min(
        float(os.environ.get("BENCH_SOFT_DEADLINE", "1000")),
        budget.remaining() - 60.0))
    hard = max(soft, min(soft + 400.0, budget.remaining() - 150.0))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         batch_s, ",".join(plan), str(tol), str(seed0), str(soft),
         str(hard)],
        stdout=subprocess.PIPE, stderr=err_f, text=True, cwd=HERE)
    budget.child = proc
    n_lines = [0]

    def reader():
        for ln in proc.stdout:
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            try:
                d = json.loads(ln)
            except ValueError:
                continue
            n_lines[0] += 1
            on_line(d)

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    first_deadline = time.time() + min(first_timeout,
                                       max(10.0, budget.remaining() - 60))
    while proc.poll() is None:
        if budget.remaining() < 45:
            proc.kill()
            break
        if n_lines[0] == 0 and time.time() > first_deadline:
            proc.kill()
            attempts.append({"batch": int(batch_s), "plan": plan,
                             "error": "no first line before deadline"})
            break
        time.sleep(2)
    proc.wait()
    th.join(timeout=10)
    budget.child = None
    if proc.returncode not in (0, -9) and n_lines[0] == 0:
        err_f.seek(0)
        attempts.append({"batch": int(batch_s), "plan": plan,
                         "error": err_f.read()[-200:]})
    err_f.close()
    os.unlink(err_f.name)
    return n_lines[0]


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
    # a wedged relay takes 20-40 min to recover and attempts without a
    # device are pure waste: poll as long as one full plan (~700 s) still
    # fits in the remaining budget
    while time.time() < deadline and budget.remaining() > 700:
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
    first_timeout = float(os.environ.get("BENCH_FIRST_TIMEOUT", "800"))
    # 3 reps per rung (round 5): the round-4 artifact's 2-rep medians left a
    # 40% success-rung spread; one warm solve + 3 headline + 3 success reps
    # measured ~860 s against the 1500 s budget
    n_reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "1500"))
    ladder = os.environ.get("BENCH_LADDER",
                            "2048:mixed,1024:mixed,512:mixed,8:f64")
    success_mode = os.environ.get("BENCH_SUCCESS", "mixedr")

    attempts = []
    head_reps = []
    succ_reps = []
    emitted = []

    def emit():
        if emitted:          # idempotent: signal during final print
            return
        emitted.append(True)
        # drop the first success rep when >=2 arrived: it carries the
        # rescue path's incremental compile-load (the headline's analog is
        # the unreported warm solve)
        succ = succ_reps[1:] if len(succ_reps) >= 2 else succ_reps
        baseline = 1.0 / REFERENCE_MEDIAN_WALL_S
        best = _median_rep(head_reps) if head_reps else None
        value = best["value"] if best else 0.0
        sbest = _median_rep(succ) if succ else None
        frontier = {
            "throughput_max": best["detail"] if best else None,
            "success_max": sbest["detail"] if sbest else None,
            "success_max_ocps_per_s": (round(sbest["value"], 3) if sbest
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
        budget, float(os.environ.get("BENCH_DEVICE_WAIT", "900")))
    if not device_ok:
        attempts.append({"error": "device probe never succeeded; "
                                  "attempting anyway"})

    def on_line(d):
        attempts.append(d["detail"])
        if d.get("warm") or d.get("skipped"):
            return
        mode = d["detail"]["mode"]
        (succ_reps if mode.endswith("r") else head_reps).append(d)

    for item in ladder.split(","):
        if budget.remaining() < 180:
            break
        batch_s, mode = item.split(":")
        # Certification-priority order: one headline rep, then ONE success
        # rep (the rung the reference still held until round 5 — it must
        # land even when the warm rep or success wall draws the relay's
        # slow tail), then the remaining headline reps, then extra success
        # reps. The worker's soft deadline trims from the BACK, so a bad
        # draw degrades to 1 headline + 1 success rep instead of losing a
        # rung; a typical run completes 3 + 2.
        plan = ["warm", mode]
        if success_mode and mode.startswith("mixed"):
            plan += [success_mode]
            plan += [mode] * (n_reps - 1)
            plan += [success_mode] * (n_reps - 1)
        else:
            plan += [mode] * (n_reps - 1)
        # even when the probe failed, give the attempt the full first-line
        # window (the worker's own claim can succeed where a probe
        # subprocess raced the recovery) — the budget still bounds it
        ft = first_timeout
        _run_plan(budget, batch_s, plan, tol, 0, ft, on_line, attempts)
        if head_reps:
            break            # primary (or fallback) rung delivered

    signal.alarm(0)
    emit()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3], float(sys.argv[4]),
               int(sys.argv[5]) if len(sys.argv) > 5 else 0,
               float(sys.argv[6]) if len(sys.argv) > 6 else 0.0,
               float(sys.argv[7]) if len(sys.argv) > 7 else 0.0)
    else:
        main()
