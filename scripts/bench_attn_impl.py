#!/usr/bin/env python
"""Fused-Pallas vs XLA attention core, per-HLO device time (real chip).

Grounds the dispatch threshold in ops/pallas_attention.py
(``FUSED_MIN_SCORE_BYTES`` / ``fused_attention_pays_off``): the kernel's
one-program-per-(batch, head) grid runs tiny (L, D) matmuls, so while the
f32 score tensor fits on-chip the XLA batched GEMM wins ~3-4x; XLA falls
off a cliff past ~100 MB of scores and the kernel wins 2-3x from there.

Device times come from the XLA profiler (core/profiling.py) — immune to
the relay's load-dependent dispatch floor.

Writes benchmarks/attn_impl_sweep.json.
Usage: python scripts/bench_attn_impl.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    # (B, H, L, D) — teacher ViT, decoder-ish, and the crossover region
    (16, 6, 197, 64),
    (16, 8, 256, 64),
    (16, 8, 384, 64),
    (16, 8, 448, 64),
    (16, 8, 512, 64),
    (32, 8, 384, 64),
    (8, 8, 1024, 64),
    (4, 8, 2048, 64),
    (2, 8, 4096, 64),
]


def main():
    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import profiling
    from imagecaptioner_tpu.ops import pallas_attention as PA

    out = {}
    for (B, H, L, D) in SHAPES:
        dt = jnp.bfloat16
        scale = 1.0 / D ** 0.5

        def mk(i):
            ks = jax.random.split(jax.random.PRNGKey(i), 3)
            return tuple(jax.random.normal(k, (B, H, L, D), dt) for k in ks)

        fused = jax.jit(
            lambda qkv: PA.fused_attention_core(*qkv, False, scale))
        xla = jax.jit(
            lambda qkv: PA.attention_core_xla(*qkv, causal=False,
                                              scale=scale))
        res = {}
        for name, fn in (("pallas_us", fused), ("xla_us", xla)):
            prof = profiling.profile_device(fn, mk, runs=3)
            res[name] = sum(r["dur_us"] for r in prof["rows"]) / 3
        score_mb = B * H * L * L * 4 / 2**20
        res.update({
            "score_tensor_mb": round(score_mb, 1),
            "pallas_over_xla": round(res["pallas_us"] / res["xla_us"], 3),
            "gate_picks": "pallas"
            if PA.fused_attention_pays_off(B, H, L, L) else "xla",
        })
        key = f"B{B}_H{H}_L{L}_D{D}"
        out[key] = res
        print(f"{key}: pallas {res['pallas_us']:8.1f} us  "
              f"xla {res['xla_us']:8.1f} us  ratio {res['pallas_over_xla']}"
              f"  scores {score_mb:7.1f} MB  gate -> {res['gate_picks']}")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "attn_impl_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
