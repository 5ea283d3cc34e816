"""Stall-supervised training walks for the flaky-tunnel TPU runtime.

Round-5 operational finding: the axon tunnel silently drops a process's
RPC stream roughly hourly — the training process blocks forever on a
device call (futex wait, 0% CPU) while the chip stays reachable from
fresh processes. No amount of in-process care fixes a lost stream, so
recovery must be an external supervisor (the framework's failure-
recovery story for this runtime, complementing the in-loop NaN reset):

* runs one training LEG per child invocation of the existing walk
  drivers (ffdnet_r3_polish.py / extend_admm_r3.py), each into its own
  log + savepath tag;
* watches the child's log mtime; no output for ``--stall`` seconds =
  wedged -> SIGKILL and retry the same leg, warm-started from the best
  checkpoint any attempt has produced (parsed from the eval lines; a
  fresh attempt's first eval overwrites its own save-dir best, so
  attempts get unique tags and adoption is score-gated);
* lets the drivers' own floor-guarded per-leg consolidation ship
  models/<out>; if the deadline/stall cuts a walk whose best eval beat
  everything shipped, the supervisor consolidates that checkpoint
  itself at exit.

Usage:
  python scripts/supervise_walk.py --driver polish --out ffdnet_clean \
      --init /root/reference/networks/ffdnet/models/net_gray.pth \
      --legs "neumann:2e-5:1,solver:1e-5:1" --trainpath data/sci_train_clean \
      --floor 0 --deadline-in 7200
"""

import argparse
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVAL_RE = re.compile(r"EMA eval: ([\d.]+) dB \(raw ([\d.]+)\)")
BEST_RE = re.compile(r"(?:best eval(?: \(at \d+ iters\))?|final):"
                     r" ([\d.]+) dB")
CONSOL_RE = re.compile(r"(?:consolidated|saved) models/(\S+)"
                       r"(?: at ([\d.]+) dB)?")


def parse_attempt(log_path):
    """(max_eval_seen, consolidated_score_or_None) from one attempt log."""
    best, consol, saw_saved = float("-inf"), None, False
    try:
        with open(log_path, errors="replace") as f:
            for line in f:
                m = EVAL_RE.search(line)
                if m:
                    best = max(best, float(m.group(1)), float(m.group(2)))
                m = BEST_RE.search(line)
                if m:
                    best = max(best, float(m.group(1)))
                m = CONSOL_RE.search(line)
                if m:
                    saw_saved = True
                    if m.group(2):
                        consol = max(consol or float("-inf"),
                                     float(m.group(2)))
    except OSError:
        pass
    if consol is None and saw_saved and best > float("-inf"):
        consol = best  # extend_admm prints 'saved models/X' without score
    return best, consol


def run_supervised(cmd, log_path, stall, deadline):
    """Run cmd; kill -9 on log stall or deadline. Returns ('ok'|'stall'|
    'deadline', returncode_or_None)."""
    with open(log_path, "w") as logf:
        proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                                cwd=REPO)
    while True:
        try:
            proc.wait(timeout=20)
            return "ok", proc.returncode
        except subprocess.TimeoutExpired:
            pass
        now = time.time()
        try:
            age = now - os.stat(log_path).st_mtime
        except OSError:
            age = 0
        if age > stall:
            print(f"[supervisor] log idle {age:.0f}s -> SIGKILL",
                  flush=True)
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return "stall", None
        if now > deadline:
            print("[supervisor] deadline -> SIGKILL", flush=True)
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return "deadline", None


def consolidate(ckpt, out, score):
    import orbax.checkpoint as ocp

    sys.path.insert(0, REPO)
    from deqsci_tpu.io.checkpoint import CheckpointManager
    snap = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
    out_dir = os.path.join(REPO, "models", out)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    CheckpointManager(os.path.join(REPO, "models")).save(
        out, {"params": snap["params"],
              "epoch": int(snap.get("epoch", 0))})
    print(f"[supervisor] consolidated models/{out} at {score:.2f} dB "
          f"(from {ckpt})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", choices=["polish", "admm"],
                    default="polish")
    ap.add_argument("--out", required=True)
    ap.add_argument("--init", required=True)
    ap.add_argument("--legs", required=True,
                    help="driver leg specs, one child invocation each")
    ap.add_argument("--trainpath", required=True)
    ap.add_argument("--floor", type=float, default=0.0)
    ap.add_argument("--stall", type=int, default=780)
    ap.add_argument("--deadline-in", type=int, default=7200,
                    help="seconds from now")
    ap.add_argument("--max-attempts", type=int, default=3,
                    help="per leg, counting stall retries")
    ap.add_argument("--lr", default="1.5e-5", help="admm driver only")
    ap.add_argument("--maxiter_mix", default="", help="admm driver only")
    ap.add_argument("--seed_base", type=int, default=500)
    args = ap.parse_args()

    deadline = time.time() + args.deadline_in
    legs = args.legs.split(",")
    init = args.init if os.path.isabs(args.init) \
        else os.path.join(REPO, args.init)
    best_known, best_ckpt = args.floor, None
    best_shipped = args.floor
    attempt = 0

    li = 0
    while li < len(legs) and time.time() < deadline - 300:
        leg = legs[li]
        tag = f"sv{args.seed_base}a{attempt}"
        log = f"/tmp/sv_{args.out}_{li}_{attempt}.log"
        if args.driver == "polish":
            save_dir = os.path.join(REPO, f"save/ffd_r3_{tag}0_"
                                          f"{leg.split(':')[0]}")
            cmd = [sys.executable, "-u", "scripts/ffdnet_r3_polish.py",
                   "--init", init, "--legs", leg,
                   "--trainpath", args.trainpath, "--ema_decay", "0.998",
                   "--seed_base", str(args.seed_base + attempt),
                   "--tag", tag, "--floor", str(best_shipped),
                   "--out", args.out]
        else:
            maxiter = leg.split(":")[0]
            save_dir = os.path.join(REPO, f"save/{args.out}{tag}_leg0_"
                                          f"it{maxiter}")
            cmd = [sys.executable, "-u", "scripts/extend_admm_r3.py",
                   "--init", init, "--legs", leg,
                   "--trainpath", args.trainpath,
                   "--denoiser", "ffdnet", "--sigma_dual", "1.0",
                   "--backward", "neumann", "--lr", args.lr,
                   "--ema_decay", "0.998",
                   "--seed_base", str(args.seed_base + attempt),
                   "--tag", tag, "--floor", str(best_shipped),
                   "--out", args.out]
            if args.maxiter_mix:
                cmd += ["--maxiter_mix", args.maxiter_mix]
        print(f"[supervisor] leg {li} attempt {attempt}: {' '.join(cmd)}",
              flush=True)
        outcome, rc = run_supervised(cmd, log, args.stall, deadline)
        a_best, a_consol = parse_attempt(log)
        print(f"[supervisor] leg {li} attempt {attempt}: outcome={outcome} "
              f"rc={rc} attempt_best={a_best:.2f} consol={a_consol}",
              flush=True)
        if a_consol is not None:
            best_shipped = max(best_shipped, a_consol)
            best_known = max(best_known, a_consol)
            best_ckpt = None  # shipped state is authoritative
            init = os.path.join(REPO, "models", args.out)
        if a_best > best_known:
            cand = os.path.join(save_dir, "model", "best")
            if os.path.isdir(cand):
                best_known, best_ckpt = a_best, cand
                init = cand
        attempt += 1
        if outcome == "ok":
            li += 1
        elif outcome == "deadline":
            break
        elif attempt > args.max_attempts * (li + 1):
            print(f"[supervisor] leg {li}: too many attempts, advancing",
                  flush=True)
            li += 1

    if best_ckpt is not None and best_known > best_shipped:
        consolidate(best_ckpt, args.out, best_known)
        best_shipped = best_known
    print(json.dumps({"out": args.out, "best": best_shipped,
                      "shipped": os.path.isdir(
                          os.path.join(REPO, "models", args.out))}),
          flush=True)


if __name__ == "__main__":
    main()
