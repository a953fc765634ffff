"""Evaluation (L4): metrics, teacher/student evaluators, latency harness."""
