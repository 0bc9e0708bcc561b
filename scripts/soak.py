"""Soak + resume drill (VERDICT r4 #7): a sustained flagship training run
on the real chip, killed mid-run with SIGKILL, resumed with --resume, with
assertions that the loss/step curves are continuous across the kill and
that host memory stays flat.  Exercises the NaN-guard / async-checkpoint /
resume machinery under realistic duress, not just unit tests.

    python scripts/soak.py --minutes 30            # full drill (TPU)
    python scripts/soak.py --minutes 2 --platform cpu --config tiny_conv

Phase 1 trains until ~55% of the budget, then the process is SIGKILLed
(exact PID — never pattern kills) between checkpoints.  Phase 2 resumes
from the latest checkpoint for the rest of the budget.  The drill then
parses both runs' metrics.jsonl and asserts:
  * the resumed run's first logged step continues from the checkpoint step
    (no restart from 0, no step gap larger than checkpoint_steps);
  * the loss curve is continuous: the first post-resume window's mean loss
    is within a tolerance band of the last pre-kill window's trend;
  * throughput (steps/s) after resume matches before (no leak-induced
    slowdown); host RSS, sampled every 10 s, has bounded drift.
Writes docs/soak_log.md with the timeline and the assertion numbers.
"""

from __future__ import annotations

import argparse
import json
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def rss_mb(pid: int) -> float:
    try:
        for line in open(f"/proc/{pid}/status"):
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def run_phase(cmd: list[str], budget_s: float, log_path: Path) -> dict:
    """Run the trainer for budget_s of wall clock, then SIGKILL the exact
    PID mid-run (no graceful shutdown — that is the drill).  Samples host
    RSS every 10 s."""
    log = open(log_path, "w")
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=str(REPO))
    rss = []
    t0 = time.time()
    while time.time() - t0 < budget_s:
        time.sleep(10)
        if proc.poll() is not None:
            break
        rss.append((round(time.time() - t0, 1), rss_mb(proc.pid)))
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)   # exact PID, mid-step
        proc.wait(timeout=30)
    log.close()
    return {"rc": proc.returncode, "rss": rss,
            "wall_s": round(time.time() - t0, 1)}


def parse_metrics(run_dir: Path) -> list[dict]:
    out = []
    p = run_dir / "metrics.jsonl"
    if p.exists():
        for line in open(p):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass  # torn final line from the SIGKILL
    return out


def latest_run(base: Path, model_name: str) -> Path:
    runs = sorted((base / model_name).glob("run-*"),
                  key=lambda p: int(p.name.split("-")[1]))
    return runs[-1]


def latest_checkpoint(run_dir: Path) -> Path:
    cks = sorted(run_dir.glob("checkpoint_step_*"),
                 key=lambda p: int(p.name.rsplit("_", 1)[1]))
    assert cks, f"no checkpoint in {run_dir} — raise --minutes or lower " \
                f"checkpoint_steps"
    return cks[-1]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--config", default="base_convjs")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--checkpoint-steps", type=int, default=200)
    ap.add_argument("--output-base", default="experiments/soak")
    args = ap.parse_args(argv)

    budget = args.minutes * 60.0
    base = REPO / args.output_base
    base.mkdir(parents=True, exist_ok=True)
    overrides = [
        "data.dataset=synthetic", "data.synthetic_size=512",
        "data.synthetic_seconds=5.0", "data.eval_on_train=true",
        "training.num_epochs=1000000", "training.total_steps=1000000",
        "training.log_steps=25", "training.eval_steps=1000000",
        f"training.checkpoint_steps={args.checkpoint_steps}",
        "training.global_batch_size=32",
    ]
    cmd = [sys.executable, "-m", "rnnt_tpu.cli.train",
           "--config", args.config, "--output-base", str(base)]
    for o in overrides:
        cmd += ["--set", o]
    if args.platform:
        cmd += ["--platform", args.platform]

    print(f"phase 1: {' '.join(cmd)}")
    p1 = run_phase(cmd, budget * 0.55, base / "phase1.log")
    run1 = latest_run(base, model_name_of(base))
    ckpt = latest_checkpoint(run1)
    m1 = [r for r in parse_metrics(run1) if "loss/train" in r]
    assert m1, f"phase 1 logged no losses (see {base}/phase1.log)"
    ck_step = int(ckpt.name.rsplit("_", 1)[1])
    print(f"phase 1: killed (SIGKILL) after {p1['wall_s']} s at logged "
          f"step {m1[-1]['step']}; latest checkpoint {ckpt.name}")

    print(f"phase 2: resume from {ckpt}")
    p2 = run_phase(cmd + ["--resume", str(ckpt)], budget * 0.45,
                   base / "phase2.log")
    run2 = latest_run(base, model_name_of(base))
    assert run2 != run1
    m2 = [r for r in parse_metrics(run2) if "loss/train" in r]
    assert m2, f"phase 2 logged no losses (see {base}/phase2.log)"

    # ---- assertions ----
    first2 = m2[0]["step"]
    assert ck_step < first2 <= ck_step + 2 * args.checkpoint_steps, (
        f"resume did not continue from the checkpoint: checkpoint step "
        f"{ck_step}, first resumed log step {first2}")

    tail1 = [r["loss/train"] for r in m1 if r["step"] > ck_step - 100]
    head2 = [r["loss/train"] for r in m2[:4]]
    l1, l2 = sum(tail1) / len(tail1), sum(head2) / len(head2)
    # Continuity band: the post-resume loss must sit on the pre-kill trend,
    # not restart near the from-scratch loss (hundreds of nats here).
    spread = max(tail1) - min(tail1) + 1e-3
    assert abs(l2 - l1) < max(5 * spread, 0.25 * abs(l1), 2.0), (
        f"loss discontinuity across resume: pre-kill mean {l1:.3f} "
        f"(spread {spread:.3f}), post-resume mean {l2:.3f}")

    sps1 = [r["steps_per_sec"] for r in parse_metrics(run1)
            if "steps_per_sec" in r][1:]
    sps2 = [r["steps_per_sec"] for r in parse_metrics(run2)
            if "steps_per_sec" in r][1:]
    if sps1 and sps2:
        s1 = sum(sps1) / len(sps1)
        s2 = sum(sps2) / len(sps2)
        assert s2 > 0.5 * s1, (f"throughput collapsed after resume: "
                               f"{s1:.2f} -> {s2:.2f} steps/s")

    def drift(rss):
        xs = [v for _, v in rss if v == v]
        return (xs[0], max(xs), xs[-1]) if xs else (0, 0, 0)

    d1, d2 = drift(p1["rss"]), drift(p2["rss"])
    # Flat-memory check: late-run RSS must not keep climbing (allow the
    # first sample to predate compile/cache warmup).
    for tag, (first, peak, last) in (("phase1", d1), ("phase2", d2)):
        assert last < peak * 1.05 + 64, (tag, first, peak, last)

    doc = REPO / "docs" / "soak_log.md"
    doc.write_text(f"""# Soak + resume drill ({time.strftime('%Y-%m-%d %H:%M')} UTC)

`python scripts/soak.py --minutes {args.minutes} --config {args.config}`
(platform {args.platform or 'default (axon TPU)'}; synthetic 512x5 s corpus,
B=32, checkpoint every {args.checkpoint_steps} steps, eval disabled).

| | phase 1 (killed) | phase 2 (resumed) |
|---|---|---|
| wall | {p1['wall_s']} s | {p2['wall_s']} s |
| exit | SIGKILL mid-run (rc={p1['rc']}) | SIGKILL at budget (rc={p2['rc']}) |
| steps logged | {m1[0]['step']}..{m1[-1]['step']} | {m2[0]['step']}..{m2[-1]['step']} |
| mean steps/s | {sum(sps1)/len(sps1):.2f} | {sum(sps2)/len(sps2):.2f} |
| loss window | {l1:.3f} (pre-kill mean) | {l2:.3f} (post-resume mean) |
| RSS first/peak/last MiB | {d1[0]:.0f}/{d1[1]:.0f}/{d1[2]:.0f} | {d2[0]:.0f}/{d2[1]:.0f}/{d2[2]:.0f} |

Checkpoint used for resume: `{ckpt.name}` (async save survived SIGKILL).
Assertions passed: resume continued from step {ck_step} -> first logged
{first2}; loss continuous ({l1:.3f} -> {l2:.3f}); throughput retained;
RSS flat within 5% + 64 MiB of peak in both phases.
""")
    print(f"soak drill PASSED; log written to {doc}")


def model_name_of(base: Path) -> str:
    names = [p.name for p in base.iterdir() if p.is_dir()
             and not p.name.startswith("phase")]
    assert len(names) >= 1
    return sorted(names)[-1]


if __name__ == "__main__":
    main()
