"""Round-5 quality campaign agenda (VERDICT r4 item 1).

Fixes the round-4 sprint's self-inflicted failures:
  * every training stage checks its PRECONDITIONS first and SKIPS FORWARD
    (with a logged reason) instead of burning its slot crashing — round 4's
    lat stage spent its window on a FileNotFoundError;
  * no `timeout` kills: stages are resumable (resume-by-default + durable
    checkpoint mirror under benchmarks/results/ckpts/), budgets are generous
    and enforced BETWEEN stages, and every checkpoint is mirrored into the
    git-tracked results tree so a VM reset costs a restore, not the round;
  * the committed campaign_report.json is only overwritten by an eval that
    EXITED 0 (the r4 sprint's watcher clobbered a fuller report with a
    keypoint-only one — ADVICE r4);
  * artifacts (mirrored checkpoints, reports, logs) are git-committed after
    every stage so even an uncommitted-work-eating reset loses minutes.

Run:  python benchmarks/run_r5_campaign.py [--stages kp,ae,...] &
Logs: runs/r5_campaign/<stage>.out, agenda log at benchmarks/results/.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "runs", "r5_campaign")
RESULTS = os.path.join(HERE, "results")
DURABLE = os.path.join(RESULTS, "ckpts")
REPORT_SRC = os.path.join(REPO, "runs", "convergence", "report.json")
LOG = os.path.join(RESULTS, "campaign_agenda_r5.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    os.makedirs(RESULTS, exist_ok=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def have_ckpt(stage: str) -> bool:
    pats = [os.path.join(REPO, "runs", "convergence", "exps", stage, "**",
                         "pointnet_ckpt_*.pkl"),
            os.path.join(DURABLE, stage, "pointnet_ckpt_*.pkl")]
    return any(glob.glob(p, recursive=True) for p in pats)


def ckpt_iter(stage: str) -> int:
    paths = glob.glob(os.path.join(REPO, "runs", "convergence", "exps", stage,
                                   "**", "pointnet_ckpt_*.pkl"),
                      recursive=True)
    paths += glob.glob(os.path.join(DURABLE, stage, "pointnet_ckpt_*.pkl"))
    if not paths:
        return -1
    return max(int(p.rsplit("_", 1)[1].split(".")[0]) for p in paths)


def run(name: str, argv: list, budget_s: int) -> int:
    """Run one stage to completion (no mid-stage kill — stages checkpoint
    and resume; the budget only gates whether LATER stages still start)."""
    os.makedirs(OUT, exist_ok=True)
    log(f"{name}: start (budget {budget_s}s)")
    t0 = time.time()
    with open(os.path.join(OUT, f"{name}.out"), "w") as f:
        rc = subprocess.call(argv, stdout=f, stderr=subprocess.STDOUT,
                             cwd=REPO)
    log(f"{name}: rc={rc} in {time.time()-t0:.0f}s")
    return rc


def commit(msg: str):
    """Persist durable artifacts.  Checkpoint mirrors are a few-to-tens of
    MB and pruned to the newest iteration per stage, so the tracked tree
    stays small."""
    try:
        subprocess.call(["git", "add", "benchmarks/results"], cwd=REPO)
        rc = subprocess.call(["git", "commit", "-q", "-m", msg,
                              "--", "benchmarks/results"], cwd=REPO)
        log(f"git commit ({msg!r}) rc={rc}")
    except Exception as e:                                    # noqa: BLE001
        log(f"git commit failed: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages",
                    default="data,kp,ae,aediag,lat,sap,sapdiag,eval")
    ap.add_argument("--kp-steps", type=int, default=20000)
    ap.add_argument("--ae-steps", type=int, default=30000)
    ap.add_argument("--lat-steps", type=int, default=25000)
    ap.add_argument("--sap-steps", type=int, default=10000)
    ap.add_argument("--eval-samples", type=int, default=400)
    args = ap.parse_args()
    stages = args.stages.split(",")
    py = sys.executable
    camp = os.path.join(HERE, "convergence_campaign.py")

    t_start = time.time()

    def elapsed():
        return time.time() - t_start

    if "data" in stages:
        data_dir = os.path.join(REPO, "runs", "convergence", "data")
        sap_dir = os.path.join(REPO, "runs", "convergence", "sap_data")
        if os.path.exists(os.path.join(data_dir, "metadata.yaml")) and \
                os.path.exists(os.path.join(sap_dir, "metadata.yaml")):
            log("data: already present, skipping")
        else:
            run("data", [py, camp, "data"], 900)

    trains = [("kp", args.kp_steps, None),
              ("ae", args.ae_steps, None),
              ("aediag", None, "ae"),
              ("lat", args.lat_steps, "ae"),
              ("sap", args.sap_steps, None),
              ("sapdiag", None, "sap")]
    for name, steps, needs in trains:
        if name not in stages:
            continue
        if needs and not have_ckpt(needs):
            log(f"{name}: SKIPPED — precondition missing ({needs} ckpt)")
            continue
        argv = [py, camp, name]
        if steps:
            argv += ["--steps", str(steps)]
        rc = run(name, argv, 3600)
        if steps is not None:
            log(f"{name}: newest ckpt iter = {ckpt_iter(name)}")
        commit(f"campaign r5: {name} stage artifacts")

    if "eval" in stages:
        if not have_ckpt("kp"):
            log("eval: SKIPPED — no kp checkpoint at all")
            return
        rc = run("eval", [py, "-c",
                          "import sys; sys.path.insert(0, %r);\n"
                          "from benchmarks.chip_lock import acquire_chip_lock;"
                          "acquire_chip_lock();\n"
                          "import benchmarks.convergence_campaign as c;\n"
                          "c.stage_eval(n_samples=%d, fastdpm_lengths=(50, 100))"
                          % (REPO, args.eval_samples)], 7200)
        if rc == 0 and os.path.exists(REPORT_SRC):
            shutil.copyfile(REPORT_SRC,
                            os.path.join(RESULTS, "campaign_report.json"))
            log("eval: report copied to benchmarks/results/campaign_report.json")
        else:
            log(f"eval: rc={rc} — committed campaign_report.json NOT "
                "overwritten (partial report stays in runs/)")
        commit("campaign r5: eval report")
    log(f"agenda done in {elapsed():.0f}s")


if __name__ == "__main__":
    main()
