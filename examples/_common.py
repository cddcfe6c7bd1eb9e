"""Shared example scaffolding: config flags + pretty result printing."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zkmips_tpu.sdk import ProverClient, ZKMStdin  # noqa: E402
from zkmips_tpu.stark.machine import StarkConfig  # noqa: E402


def client_from_args(desc: str) -> tuple[ProverClient, argparse.Namespace]:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument("--sound", action="store_true", help="production FRI config (slower)")
    ap.add_argument("--device", action="store_true", help="prove on the attached accelerator")
    args = ap.parse_args()
    config = StarkConfig.core() if args.sound else StarkConfig.test()
    return ProverClient(config=config, device=args.device), args


def timed(label: str, fn, *a, **kw):
    t0 = time.time()
    out = fn(*a, **kw)
    print(f"  {label}: {time.time() - t0:.2f}s")
    return out
