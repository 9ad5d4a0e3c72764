#!/usr/bin/env python
"""Pedagogical baseline: the Fenton 4v model WITHOUT the framework.

Mirror of the reference's fenton_simple.py teaching progression — a
standalone solver that makes each optimization visible by its absence:
the conv-kernel Laplacian (instead of the direct stencil), one device
dispatch per dt step (instead of fused multi-substep scans), and a
hardcoded S2 at 210 ms.  Run with --jit to see what a single jit wrapper
buys (the fenton_jit.py stage of the progression); the full framework
(examples/fenton_spiral.py) adds scan fusion on top.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fib_tf_tpu.ops import stencil
from fib_tf_tpu.models.fenton import Fenton4v
from fib_tf_tpu.config import SimConfig

DT = 0.1
DIFF = 1.5
S2_TIME_MS = 210


def make_solve(model):
    def solve(u, v, w, s):
        """One explicit-Euler step with the conv-kernel Laplacian."""
        u0 = stencil.enforce_boundary(u)
        du, dv, dw, ds = model.differentiate(u, v, w, s)
        u1 = u0 + DT * du + DIFF * DT * stencil.laplace_conv(u0)
        return u1, v + DT * dv, w + DT * dw, s + DT * ds
    return solve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jit", action="store_true",
                    help="wrap the step in jax.jit (the fenton_jit stage)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--duration", type=float, default=None,
                    help="ms; overrides --samples")
    ap.add_argument("--timeline", action="store_true",
                    help="write a jax.profiler trace of 100 steps to "
                         "timeline_simple_trace/ (or timeline_jit_trace/ "
                         "with --jit) — the reference's per-stage Chrome "
                         "traces, fenton_simple.py:207-215")
    args = ap.parse_args()
    height = width = args.size
    if args.duration is not None:
        args.samples = int(args.duration / DT)

    model = Fenton4v(SimConfig(width=width, height=height, dt=DT))
    solve = make_solve(model)

    u = jnp.zeros((height, width), jnp.float32).at[:, 1].set(1.0)
    v = jnp.ones((height, width), jnp.float32)
    w = jnp.ones((height, width), jnp.float32)
    s = jnp.zeros((height, width), jnp.float32)

    s2_mask = np.zeros((height, width), np.float32)
    s2_mask[: height // 2, : width // 2] = 1.0
    s2_mask = jnp.asarray(s2_mask)
    s2_step = int(S2_TIME_MS / DT)

    step = jax.jit(solve) if args.jit else solve

    if args.timeline:
        # profile 100 warm steps per stage, mirroring the reference's
        # timeline_simple vs timeline_jit figures: the simple trace shows
        # one dispatch per op, the jit trace one fused program per step
        for _ in range(3):  # warm up (compile) outside the trace
            u, v, w, s = step(u, v, w, s)
        logdir = "timeline_jit_trace" if args.jit else "timeline_simple_trace"
        with jax.profiler.trace(logdir):
            for _ in range(100):
                u, v, w, s = step(u, v, w, s)
            jax.block_until_ready(u)
        print("profiler trace written to %s/" % logdir)
        return

    then = time.time()
    for i in range(args.samples):
        u, v, w, s = step(u, v, w, s)
        if i == s2_step:
            u = jnp.maximum(u, s2_mask)
    print("checksum:", float(jnp.sum(u)))
    print("elapsed: %f sec" % (time.time() - then))


if __name__ == "__main__":
    main()
