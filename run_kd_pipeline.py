#!/usr/bin/env python
"""KD pipeline orchestrator (reference run_kd_pipeline.py:90-141 semantics).

Prerequisite checks (teacher checkpoint, captions CSV, Images dir, importable
packages), then runs KD training and the student-vs-teacher evaluation as
subprocesses, printing the artifact list and exit code.
"""

from __future__ import annotations

import argparse
import importlib
import os
import subprocess
import sys


def check_prerequisites(teacher_ckpt: str, data_root: str,
                        captions_file: str) -> bool:
    ok = True
    checks = [
        (teacher_ckpt, "teacher checkpoint"),
        (captions_file, "captions CSV"),
        (os.path.join(data_root, "Images"), "Images directory"),
    ]
    for path, what in checks:
        if os.path.exists(path):
            print(f"  [ok] {what}: {path}")
        else:
            print(f"  [MISSING] {what}: {path}")
            ok = False
    for pkg in ("jax", "numpy", "pandas", "PIL"):
        try:
            importlib.import_module(pkg)
            print(f"  [ok] package {pkg}")
        except ImportError:
            print(f"  [MISSING] package {pkg}")
            ok = False
    return ok


def run_command(argv, description: str) -> bool:
    print(f"\n{'=' * 60}\n{description}\n{'=' * 60}")
    result = subprocess.run([sys.executable, "-m", *argv],
                            cwd=os.path.dirname(os.path.abspath(__file__)))
    if result.returncode != 0:
        print(f"FAILED (exit {result.returncode}): {description}")
        return False
    return True


def main():
    ap = argparse.ArgumentParser(description="Run the full KD pipeline")
    ap.add_argument("--data-root", default="data/flickr8k")
    ap.add_argument("--captions-file", default=None)
    ap.add_argument("--teacher-checkpoint",
                    default="saved_models/best_teacher_model.npz")
    ap.add_argument("--output-dir", default="saved_models")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--student", default="full",
                    choices=["full", "compact", "enhanced"],
                    help="student variant, passed through to the trainer")
    ap.add_argument("--max-samples", type=int, default=100)
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()
    captions = args.captions_file or os.path.join(args.data_root,
                                                  "captions_clean.csv")

    print("Checking prerequisites...")
    if not check_prerequisites(args.teacher_checkpoint, args.data_root,
                               captions):
        print("\nPrerequisites not met — aborting.")
        sys.exit(1)

    kd_args = ["imagecaptioner_tpu.train.train_student_kd",
               "--data-root", args.data_root,
               "--captions-file", captions,
               "--teacher-checkpoint", args.teacher_checkpoint,
               "--output-dir", args.output_dir,
               "--student", args.student]
    if args.epochs is not None:
        kd_args += ["--epochs", str(args.epochs)]
    if not run_command(kd_args, "Step 1/2: Knowledge-distillation training"):
        sys.exit(1)

    if not args.skip_eval:
        eval_args = ["imagecaptioner_tpu.eval.evaluate_student",
                     "--student-checkpoint",
                     os.path.join(args.output_dir, "best_student_model.npz"),
                     "--teacher-checkpoint", args.teacher_checkpoint,
                     "--vocab", os.path.join(args.output_dir, "vocab.json"),
                     "--data-root", args.data_root,
                     "--captions-file", captions,
                     "--max-samples", str(args.max_samples)]
        if not run_command(eval_args, "Step 2/2: Student-vs-teacher evaluation"):
            sys.exit(1)

    print(f"\n{'=' * 60}\nPipeline complete. Artifacts:")
    for name in ("best_student_model.npz", "final_student_model.npz",
                 "student_training_history.json", "vocab.json"):
        p = os.path.join(args.output_dir, name)
        print(f"  {'[ok]' if os.path.exists(p) else '[missing]'} {p}")
    if not args.skip_eval:
        print("  [ok] student_vs_teacher_report.json"
              if os.path.exists("student_vs_teacher_report.json")
              else "  [missing] student_vs_teacher_report.json")


if __name__ == "__main__":
    main()
