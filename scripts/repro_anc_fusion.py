#!/usr/bin/env python
"""Minimal repro of the N>=16 ancestry-attention fusion cliff (VERDICT r4 #6).

The packed beam-decode loop runs at 1.36x its HBM byte bound at N=8 but
2.4-3.3x at N=16/32 (benchmarks/beam_byte_ledger.json): one XLA "output
fusion" after the ancestry context einsum grows superlinearly with the pack
width.  This script isolates the smallest program that shows the cliff —
ONE decoder layer's KV-cached ancestry self-attention inside a 20-step
while loop at production dims (E=512, H=8, K=5, S=21) — and profiles it
per-HLO at N = 8 / 16 / 32 for three formulations:

  * joint    — the production path (transformer._attend_anc)
  * sel      — select-before-softmax (_attend_anc_sel, r4 attempt)
  * barrier  — joint + optimization_barrier between softmax and the ctx
               einsum (IC_ANC_BARRIER=1), forcing a fusion boundary where
               the pathological output fusion forms

Each arm spawns a fresh subprocess (the impl switches are read at trace
time and jit caches key on them).  Writes benchmarks/anc_fusion_repro.json
with per-N worst-fusion rows and, for the cliff arm, the HLO text of the
pathological fusion.

Usage: python scripts/repro_anc_fusion.py [--ns 8 16 32] [--steps 20]
       (inner, used by the subprocess spawn: --inner-arm joint --ns 16)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")

E, H, K, S = 512, 8, 5, 21


def run_inner(arm: str, ns, steps: int, runs: int) -> dict:
    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import profiling
    from imagecaptioner_tpu.core.runtime import enable_compile_cache
    from imagecaptioner_tpu.models import transformer as TD

    enable_compile_cache()
    hd = E // H
    attend = TD._attend_anc_sel if arm == "sel" else TD._attend_anc

    def make_loop(N):
        R = N * K

        def loop(args):
            """steps x (R,E) tokens through a cached 1-layer self-attn.
            ``args`` = (x_seq, w_qkv, anc) — profile_device passes one
            pytree argument."""
            x_seq, w_qkv, anc = args
            kv0 = {"k": jnp.zeros((R, H, S, hd), jnp.bfloat16),
                   "v": jnp.zeros((R, H, S, hd), jnp.bfloat16)}

            def body(carry):
                t, kv, acc = carry
                x = jax.lax.dynamic_index_in_dim(x_seq, t, keepdims=False)
                qkv = (x @ w_qkv).reshape(R, 3, H, hd)
                q = qkv[:, 0].reshape(R, 1, E)
                k_t = qkv[:, 1][:, :, None, :]          # (R,H,1,hd)
                v_t = qkv[:, 2][:, :, None, :]
                kv = {
                    "k": jax.lax.dynamic_update_slice(
                        kv["k"], k_t.astype(jnp.bfloat16), (0, 0, t, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        kv["v"], v_t.astype(jnp.bfloat16), (0, 0, t, 0)),
                }
                # same mask/one-hot construction as decoder_step_cached
                causal = jnp.arange(S)[None, None, None, :] > t
                anc_hot = jax.nn.one_hot(anc, K, dtype=jnp.bfloat16)
                ctx = attend(q.astype(jnp.bfloat16), kv["k"], kv["v"],
                             anc_hot, H, causal)
                return t + 1, kv, acc + ctx.sum()

            _, _, acc = jax.lax.while_loop(
                lambda c: c[0] < steps, body,
                (jnp.int32(0), kv0, jnp.float32(0.0)))
            return acc

        return jax.jit(loop), R

    out = {}
    for N in ns:
        loop, R = make_loop(N)
        key0 = jax.random.PRNGKey(0)
        anc = jax.random.randint(jax.random.PRNGKey(2), (N, K, S), 0, K)

        def mk(i, R=R):
            ks = jax.random.split(jax.random.PRNGKey(100 + i), 2)
            return (jax.random.normal(ks[0], (steps, R, E), jnp.bfloat16),
                    jax.random.normal(ks[1], (E, 3 * E), jnp.bfloat16),
                    anc)

        prof = profiling.profile_device(loop, mk, runs=runs)
        tot = (prof["program_us_per_run"]
               or sum(r["dur_us_per_run"] for r in prof["rows"]))
        worst = max(prof["by_name"], key=lambda r: r["dur_us_per_run"])
        rec = {"N": N, "loop_us": tot, "us_per_step": tot / steps,
               "worst_hlo": {k: worst[k] for k in
                             ("name", "category", "dur_us_per_run")},
               "by_category": prof["by_category"][:6]}
        print(f"[{arm}] N={N}: {tot:.0f} us/loop "
              f"({tot/steps:.1f} us/step), worst HLO "
              f"{worst['name']} {worst['dur_us_per_run']:.0f} us "
              f"[{worst['category']}]", flush=True)
        out[f"N{N}"] = rec
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", nargs="+", type=int, default=[8, 16, 32])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--arms", nargs="+",
                    default=["joint", "sel", "barrier"])
    ap.add_argument("--inner-arm", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--out", default=os.path.join(
        BENCH, "anc_fusion_repro.json"))
    args = ap.parse_args()

    if args.inner_arm:
        rec = run_inner(args.inner_arm, args.ns, args.steps, args.runs)
        print("INNER_JSON " + json.dumps(rec))
        return

    results = {"dims": {"E": E, "H": H, "K": K, "S": S,
                        "steps": args.steps},
               "arms": {}}
    for arm in args.arms:
        env = dict(os.environ)
        if arm == "barrier":
            env["IC_ANC_BARRIER"] = "1"
        cmd = [sys.executable, os.path.abspath(__file__), "--inner-arm",
               "joint" if arm == "barrier" else arm,
               "--ns", *map(str, args.ns), "--steps", str(args.steps),
               "--runs", str(args.runs)]
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=3600)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            raise SystemExit(f"arm {arm} failed")
        line = [l for l in r.stdout.splitlines()
                if l.startswith("INNER_JSON ")][-1]
        results["arms"][arm] = json.loads(line[len("INNER_JSON "):])

    # cliff factor per arm: us/step at N relative to N=8, normalized by N
    for arm, recs in results["arms"].items():
        base = recs.get("N8", {}).get("us_per_step")
        if base:
            for k, rec in recs.items():
                n = rec["N"]
                rec["per_image_vs_N8"] = (rec["us_per_step"] / n) / (base / 8)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
